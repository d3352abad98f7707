#!/usr/bin/env python3
"""Merge N graft.Bench JSON outputs into the committed clean-box record.

Usage: python3 tools/bench_merge.py OUT.json RUN1.json RUN2.json [...]
         [--note "..."]

Per-query seconds: min across runs, over the UNION of query names
(ignoring -1 failures; a query that failed or was absent in EVERY run
stays -1 and lands in "failed" — failures stay unmistakable, coverage
is never silently dropped). Throughput (*_per_sec) fields: union of
keys, max of the non-failed values, -1 if every run failed/lacked it.
"value" (total): the minimum total among runs whose OWN failed list is
empty (a failing run's total understates by the failed rows' cost); if
every run failed something, fail loud — a record merged from broken
runs is not a record. load_avg/cpu_share come from the run that won
"value", with every run's load_avg_start listed in the note so the
isolation evidence survives the merge (the CLAUDE.md bench-isolation
invariant).
"""
import json
import sys


def main() -> None:
    args = sys.argv[1:]
    note = ""
    if "--note" in args:
        i = args.index("--note")
        note = args[i + 1]
        del args[i:i + 2]
    out_path, run_paths = args[0], args[1:]
    if len(run_paths) < 2:
        sys.exit("need at least 2 run files to merge")
    runs = [json.load(open(p)) for p in run_paths]

    names = sorted(set().union(*(r["queries"].keys() for r in runs)))
    queries = {}
    for name in names:
        ok = [r["queries"][name] for r in runs
              if r["queries"].get(name, -1.0) >= 0]
        queries[name] = round(min(ok), 3) if ok else -1.0
    failed = sorted(n for n, v in queries.items() if v < 0)

    clean = [r for r in runs if not r.get("failed")]
    if not clean:
        sys.exit("every run has failures (" +
                 "; ".join(str(r.get("failed")) for r in runs) +
                 ") — fix the bench before committing a record")
    best = min(clean, key=lambda r: r["value"])
    merged = dict(best)
    merged["queries"] = queries
    merged["failed"] = failed
    merged["value"] = round(best["value"], 3)
    rate_keys = sorted(k for r in runs for k in r if k.endswith("_per_sec"))
    for k in rate_keys:
        ok = [r[k] for r in runs if r.get(k, -1) >= 0]
        merged[k] = max(ok) if ok else -1
    starts = " / ".join(f"{r['load_avg_start']:.2f}" for r in runs)
    merged["note"] = (f"min of {len(runs)} clean-box runs "
                      f"(load_avg_start {starts})"
                      + (f"; {note}" if note else ""))
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(f"[bench-merge] {len(run_paths)} runs -> {out_path} "
          f"(total {merged['value']}s, {len(failed)} failed)")


if __name__ == "__main__":
    main()
