"""Workload-matched hardware calibration for the scaling-efficiency report.

The crawl's CPU is dominated by the portal parse kernel (xpathlite +
extraction — string-heavy Python).  This tool runs THAT EXACT kernel —
the golden simulator, which executes the same per-portal parse code on the
same fixture pages — as an embarrassingly-parallel multiprocessing job
(one chunk of seeds per worker, zero framework) at two worker counts, and
reports the throughput ratio.

That ratio is the HARDWARE ceiling for this workload on this box: no
scheduler, no shuffle, no driver — if pure multiprocessing only scales at
X from N to 4N cores (memory bandwidth / allocator contention on shared
silicon), no framework can beat X here.  On a real multi-executor cluster
(separate machines), per-core memory bandwidth is constant from N to 4N
executors, so this term is absent — which is exactly why the engine's
efficiency should be read relative to this ceiling.

Usage:
    python tools/bench_parse_kernel.py            # parent: 2 vs 8 workers
    SPARK_GRAFT_KERNEL_SEEDS=8000 ...             # subset size (default 8000)

Prints one JSON line: {"levels": {...}, "kernel_eff": ...}.
"""

import json
import multiprocessing
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_SEEDS = int(os.environ.get("SPARK_GRAFT_KERNEL_SEEDS", "8000"))
LEVELS = [int(x) for x in
          os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "2,8").split(",")]
# best-of-N per level, matching bench_scaling.py: this box is a shared-host
# VM whose effective CPU/bandwidth varies run-to-run (observed 2-3x swings
# minutes apart); contention noise is one-sided (it only ever slows a run
# down), so max-over-repeats estimates the uncontended capability at each
# level and keeps the efficiency ratio from mixing two contention eras.
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "1"))


def _fixture_dir():
    import __spark_entry__ as E
    return E._fixture(SF_DIR)


def _load_tables(fix):
    import pyarrow.parquet as pq
    seeds = pq.read_table(os.path.join(fix, "seeds.parquet")).to_pylist()
    stadte = pq.read_table(os.path.join(fix, "stadte.parquet")).to_pylist()
    return seeds, stadte


# Loaded ONCE in the parent; forked workers inherit it copy-on-write.
# Per-worker loading double-counted nothing at sf0.1 (2.4 GB x 8 fit in
# RAM) but at sf0.3 x 32 workers it needs ~230 GB and the box thrashes —
# fork inheritance keeps one copy, and the compute window still measures
# only parse work (refcount CoW faults are the same dict accesses the
# per-worker copy paid).
_SHARED = {}


def _load_shared(fix):
    if _SHARED.get("fix") == fix:
        return
    import pyarrow.parquet as pq

    pages = pq.read_table(os.path.join(fix, "pages.parquet"),
                          columns=["url", "text"])
    seeds, stadte = _load_tables(fix)
    _SHARED.update(
        fix=fix,
        pages_map=dict(
            zip(pages.column("url").to_pylist(),
                pages.column("text").to_pylist())
        ),
        stadte=stadte,
        by_id={s["seed_id"]: s for s in seeds},
    )


def _worker(args):
    """Parse one chunk of seeds; setup cost excluded from compute wall.

    All workers rendezvous on a barrier BEFORE the timed compute, so the
    measured windows fully overlap — without it, staggered startup means
    worker k computes while worker j still imports, and ``max(per-worker
    wall)`` under-measures the true concurrent wall (observed as a
    spurious super-linear "efficiency" once the parse kernel got fast
    enough that startup jitter rivaled compute)."""
    seed_chunk, barrier, q = args
    from scrapy_crawler_german_real_estate_sites_spark.plans.simulator import (
        simulate,
    )

    pages_map = _SHARED["pages_map"]
    chunk = [_SHARED["by_id"][sid] for sid in seed_chunk]
    stadte = _SHARED["stadte"]
    barrier.wait()
    t0 = time.time()
    res = simulate(pages_map, chunk, stadte, hour=7)
    dt = time.time() - t0
    q.put((len(res.fetch_order), dt))


def run_level(fix, seed_ids, workers):
    _load_shared(fix)  # before fork: children inherit, no per-child copy
    chunks = [seed_ids[i::workers] for i in range(workers)]
    barrier = multiprocessing.Barrier(workers)
    q = multiprocessing.Queue()
    ps = [
        multiprocessing.Process(target=_worker, args=((c, barrier, q),))
        for c in chunks
    ]
    [p.start() for p in ps]
    out = [q.get() for _ in ps]
    [p.join() for p in ps]
    fetched = sum(f for f, _ in out)
    wall = max(d for _, d in out)  # compute-only window, load excluded
    return {"workers": workers, "fetched": fetched,
            "compute_wall": round(wall, 2),
            "urls_per_sec": round(fetched / wall, 2)}


def main():
    fix = _fixture_dir()
    seeds, _ = _load_tables(fix)
    seed_ids = [s["seed_id"] for s in seeds][:N_SEEDS]
    results = {}
    for w in LEVELS:
        best = None
        for _ in range(REPEATS):
            r = run_level(fix, seed_ids, w)
            print(f"kernel x{w}: {r}", file=sys.stderr)
            if best is None or r["urls_per_sec"] > best["urls_per_sec"]:
                best = r
        results[w] = best
    lo, hi = min(LEVELS), max(LEVELS)
    eff = results[hi]["urls_per_sec"] / (
        (hi / lo) * results[lo]["urls_per_sec"]
    )
    payload = {"levels": {str(k): v for k, v in results.items()},
               "kernel_eff": round(eff, 3), "n_seeds": len(seed_ids),
               "sf": os.path.basename(os.path.normpath(SF_DIR))}
    out_path = os.path.join(
        REPO, "BENCH", f"kernel_calib_{min(LEVELS)}_{max(LEVELS)}.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
