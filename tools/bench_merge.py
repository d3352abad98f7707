#!/usr/bin/env python3
"""Merge N graft.Bench JSON outputs into the committed clean-box record.

Usage: python3 tools/bench_merge.py OUT.json RUN1.json RUN2.json [...]
         [--note "..."]

Per-query seconds: min across runs (ignoring -1 failures; a query that
failed in EVERY run stays -1 and lands in "failed"). Throughput
(*_per_sec) fields: max across runs. "value" (total): the minimum
run total. load_avg_start/end + cpu_share: taken from the run that won
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

    queries = {}
    for name in runs[0]["queries"]:
        vals = [r["queries"].get(name, -1.0) for r in runs]
        ok = [v for v in vals if v >= 0]
        queries[name] = round(min(ok), 3) if ok else -1.0
    failed = sorted(n for n, v in queries.items() if v < 0)

    best = min(runs, key=lambda r: r["value"])
    merged = dict(best)
    merged["queries"] = queries
    merged["failed"] = failed
    merged["value"] = round(min(r["value"] for r in runs), 3)
    for k in runs[0]:
        if k.endswith("_per_sec"):
            merged[k] = max(r.get(k, 0) for r in runs)
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
