#!/usr/bin/env python
"""Scaling-efficiency evidence: same KG-pipeline job, same input, at two
parallelism levels (local[8] vs local[32] — the sandbox proxy for N vs 4N
executors per BASELINE.md). Each level runs in its own subprocess (own JVM).

    python bench/scaling.py [n_pages] [low_cores] [high_cores] [reps]

Each level runs `reps` times (default 2) and the BEST wall-clock is kept —
single-machine runs have ±20-30% noise (page cache, CPU frequency, JIT),
and the minimum is the least-contaminated estimate of the job's true cost.

Writes BENCH/BASELINE.md with throughput at both levels and
efficiency = (thr_high / thr_low) / (high / low); gate: >= 0.8.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def run_level(cores: int, n_pages: int, reps: int) -> dict:
    best = None
    for i in range(reps):
        out = subprocess.run(
            [sys.executable, str(ROOT / "bench" / "pipeline_job.py"), str(cores), str(n_pages)],
            capture_output=True,
            text=True,
            check=True,
            cwd=str(ROOT),
            env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "16g"},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        print(f"#   rep {i}: {r['secs']}s", file=sys.stderr)
        if best is None or r["secs"] < best["secs"]:
            best = r
    return best


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    print(f"# running local[{low}] ...", file=sys.stderr)
    r_low = run_level(low, n_pages, reps)
    print(f"# {r_low}", file=sys.stderr)
    print(f"# running local[{high}] ...", file=sys.stderr)
    r_high = run_level(high, n_pages, reps)
    print(f"# {r_high}", file=sys.stderr)

    eff = (r_high["pages_per_sec"] / r_low["pages_per_sec"]) / (high / low)
    md = f"""# BENCH/BASELINE — scaling evidence (N vs 4N proxy)

Same KG-pipeline job (pages -> triples, full plan incl. pandas-UDF text
extraction, mention detection, classification, merge, MinHash-LSH linking,
connected components, triple assembly) on the SAME deterministic input
({n_pages} pages, seed=42), at two parallelism levels, each in a fresh JVM.
Timing excludes JVM startup, Python-worker warmup, corpus generation and
input materialization; best of {reps} reps per level (single-machine noise).

| parallelism | wall (s) | pages/s | triples/s |
|---|---|---|---|
| local[{low}]  | {r_low['secs']} | {r_low['pages_per_sec']} | {r_low['triples_per_sec']} |
| local[{high}] | {r_high['secs']} | {r_high['pages_per_sec']} | {r_high['triples_per_sec']} |

**Scaling efficiency (local[{low}] -> local[{high}], x{high // low} cores):
{eff:.3f}**  (target >= 0.8 per BASELINE.json north_rule; measured as
(thr_{high}/thr_{low}) / ({high}/{low}))

Triples emitted: {r_high['triples']} (identical at both levels: {r_low['triples'] == r_high['triples']}).
"""
    (ROOT / "BENCH").mkdir(exist_ok=True)
    (ROOT / "BENCH" / "BASELINE.md").write_text(md)
    print(md)
    print(json.dumps({"efficiency": round(eff, 3), "low": r_low, "high": r_high}))
    return 0 if eff >= 0.8 else 1


if __name__ == "__main__":
    raise SystemExit(main())
