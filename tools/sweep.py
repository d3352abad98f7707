#!/usr/bin/env python3
"""Oracle replica sweep -> committed artifact (VERDICT r11 #5).

Runs graft.Verify + the DuckDB oracle compare for each testdata SF dir
(sf0.001, sf0.01, sf0.1) AND the deterministic null-bearing twin of
sf0.001 (tools/make_null_twin.py), then writes one JSON artifact
(query -> per-SF pass/fail, plus input-dir content hashes) so the
sweep evidence survives fixture regenerations.

Usage: python3 tools/sweep.py ORACLE_SWEEP_r12.json
Runtime: several minutes (one sbt-forked Verify per SF dir).
Never run concurrently with a bench (CLAUDE.md isolation rule).
"""
import hashlib
import json
import re
import subprocess
import sys
import tempfile
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT_JSON = Path(sys.argv[1] if len(sys.argv) > 1 else "ORACLE_SWEEP.json")


def dir_hash(d: Path) -> str:
    """md5 of (name, bytes) for every parquet under d, sorted by name."""
    h = hashlib.md5()
    for f in sorted(d.rglob("*.parquet")):
        if f.is_file():
            h.update(f.name.encode())
            h.update(f.read_bytes())
    return h.hexdigest()


def run_verify(sfdir: str, outdir: str) -> None:
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sfdir} {outdir}"],
        cwd=REPO, check=True, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)


def run_check(sfdir: str, outdir: str) -> dict:
    """Parse oracle_check.py stdout into {query: 'pass'|'fail ...'}.

    Fails LOUD (not silently-green) when the compare crashes or emits
    zero PASS/FAIL lines — a crashed compare would otherwise contribute
    zero entries and the artifact would read as all-green (ADVICE r12).
    """
    p = subprocess.run(
        [sys.executable, str(REPO / "tools" / "oracle_check.py"),
         sfdir, outdir],
        capture_output=True, text=True)
    res = {}
    for line in p.stdout.splitlines():
        m = re.match(r"^(PASS|FAIL) (\S+?):? ", line + " ")
        if m:
            res[m.group(2)] = ("pass" if m.group(1) == "PASS"
                               else line.strip())
    if not res:
        raise RuntimeError(
            f"oracle_check produced no PASS/FAIL lines for {sfdir} "
            f"(rc={p.returncode}); stderr tail: {p.stderr[-800:]}")
    if p.returncode != 0 and all(v == "pass" for v in res.values()):
        raise RuntimeError(
            f"oracle_check exited rc={p.returncode} for {sfdir} with no "
            f"FAIL line parsed — partial output? stderr tail: "
            f"{p.stderr[-800:]}")
    # the expected universe comes from the Verify DUMP, not from the
    # union of compare outputs — a query whose compare line never
    # prints in ANY tag would otherwise be invisible (self-review r13)
    expected = {d.name for d in Path(outdir).iterdir()
                if d.is_dir() and not d.name.startswith("_")}
    for q in expected - set(res):
        res[q] = "FAIL no compare line emitted"
    return res


def main() -> None:
    sweeps = {}
    hashes = {}
    with tempfile.TemporaryDirectory(prefix="graft_sweep") as tmp:
        twin = f"{tmp}/nulltwin"
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_null_twin.py"),
             "/root/testdata/sf0.001", twin],
            check=True, stdout=subprocess.DEVNULL)
        targets = {"sf0.001": "/root/testdata/sf0.001",
                   "sf0.01": "/root/testdata/sf0.01",
                   "sf0.1": "/root/testdata/sf0.1",
                   "nulltwin_sf0.001": twin}
        for tag, sfdir in targets.items():
            outdir = f"{tmp}/v_{tag}"
            print(f"[sweep] {tag}: Verify -> {outdir}", flush=True)
            run_verify(sfdir, outdir)
            print(f"[sweep] {tag}: oracle compare", flush=True)
            sweeps[tag] = run_check(sfdir, outdir)
            hashes[tag] = dir_hash(Path(sfdir))
            n_fail = sum(1 for v in sweeps[tag].values() if v != "pass")
            print(f"[sweep] {tag}: {len(sweeps[tag])} queries, "
                  f"{n_fail} fail", flush=True)

    queries = sorted(set().union(*[set(s) for s in sweeps.values()]))
    artifact = {
        "generated_utc": datetime.now(timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "git_head": subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip(),
        # provenance: a sweep over a dirty tree must say so — git_head
        # alone cannot prove the sweep covered the committed source
        # (ADVICE r18: the 066130b ambiguity)
        "git_dirty": subprocess.run(
            ["git", "status", "--porcelain"], cwd=REPO,
            capture_output=True, text=True).stdout.strip().splitlines(),
        "input_dir_md5": hashes,
        "n_queries": len(queries),
        # MISSING (query absent from a sweep tag) counts as a failure —
        # a query that silently vanished from one SF is not green
        "n_fail_total": sum(
            1 for q in queries for s in sweeps.values()
            if s.get(q, "MISSING") != "pass"),
        "results": {q: {tag: sweeps[tag].get(q, "MISSING")
                        for tag in sweeps} for q in queries},
    }
    OUT_JSON.write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"[sweep] wrote {OUT_JSON}: {len(queries)} queries, "
          f"{artifact['n_fail_total']} total failures")
    sys.exit(0 if artifact["n_fail_total"] == 0 else 1)


if __name__ == "__main__":
    main()
