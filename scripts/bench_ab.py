#!/usr/bin/env python
"""Same-window A/B benchmark: HEAD vs a baseline ref (VERDICT r3
item 7).

Cross-window bench deltas on this sandbox VM are noise-dominated
(BENCH.md: the same job measured 4 s and 30 s minutes apart, GC ruled
out), so round-over-round claims need both builds measured in ONE
window.  A literal same-JVM A/B is unsound here: Python workers
resolve ``clara_ocr_spark`` by module path, so the second build's
UDF-bearing stages would silently execute the first build's worker
code.  Instead this harness interleaves full ``bench.py`` runs
A,B,A,B... back-to-back (fresh JVM each, tmpfs local dirs, min-of-N
inside each run, min across passes per build) — every A pass has a B
pass seconds away, so a hypervisor steal window hits both builds or
neither.

Usage::

    python scripts/bench_ab.py [--ref d36b0ed] [--passes 2] \
        [--sf-dir /root/testdata/sf0.1]

Prints one JSON line: per-query best seconds for each build plus the
ratio, and the pass-level totals so window health is visible.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(cwd: str, env: dict) -> dict:
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench failed in {cwd}:\n{proc.stderr[-3000:]}")
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="d36b0ed",
                    help="baseline git ref (default: the round-3 tag)")
    ap.add_argument("--passes", type=int, default=2,
                    help="A/B pass pairs (min across passes per build)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--worktree", default="/tmp/bench_ab_baseline")
    args = ap.parse_args()

    if not os.path.isdir(args.worktree):
        subprocess.run(
            ["git", "worktree", "add", "--detach", args.worktree, args.ref],
            cwd=ROOT, check=True, capture_output=True,
        )
    # share the cached bench corpora (ensure_corpus caches by path)
    data = os.path.join(args.worktree, ".data")
    if not os.path.exists(data):
        os.symlink(os.path.join(ROOT, ".data"), data)

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf_dir)
    passes = []  # (build, result)
    for i in range(args.passes):
        for build, cwd in (("baseline", args.worktree), ("head", ROOT)):
            res = _run_bench(cwd, env)
            passes.append((build, res))
            print(
                f"# pass {i} {build}: total={res['value']}s "
                f"extraction={res['extraction_docs_per_sec']} docs/s",
                file=sys.stderr,
            )

    best: dict[str, dict[str, float]] = {"baseline": {}, "head": {}}
    for build, res in passes:
        for q, s in res["queries"].items():
            cur = best[build].get(q)
            best[build][q] = s if cur is None else min(cur, s)
    common = sorted(set(best["baseline"]) & set(best["head"]))
    table = {
        q: {
            "baseline": best["baseline"][q],
            "head": best["head"][q],
            "ratio": round(best["head"][q] / best["baseline"][q], 3)
            if best["baseline"][q] > 0 else None,
        }
        for q in common
    }
    tot_b = round(sum(best["baseline"][q] for q in common), 3)
    tot_h = round(sum(best["head"][q] for q in common), 3)
    print(json.dumps({
        "metric": "same_window_ab_total",
        "baseline_ref": args.ref,
        "passes": args.passes,
        "baseline_total": tot_b,
        "head_total": tot_h,
        "ratio": round(tot_h / tot_b, 3),
        "pass_totals": [
            {"build": b, "total": r["value"]} for b, r in passes
        ],
        "queries": table,
    }))


if __name__ == "__main__":
    main()
