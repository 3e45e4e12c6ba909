#!/usr/bin/env python
"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on a tuned local[$SPARK_GRAFT_CPUS]
session and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan + execute + collect to driver),
after a one-query JVM warm-up. The full query set runs
$SPARK_GRAFT_REPEAT times (default 2) ROUND-ROBIN — pass 1 runs every
query once, then pass 2 re-runs every query — and the per-query
MINIMUM across passes is reported. Interleaving matters: this
container's host-level CPU contention arrives in multi-second windows
(BASELINE.md §B, ±50%), and back-to-back repeats of one query can land
every sample inside a single window (BENCH_r03 recorded a 5.6x phantom
spike on q15 exactly that way). Round-robin puts each query's samples
minutes apart so one window can poison at most one pass.
Run with --explain to dump formatted physical plans instead of timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    explain = "--explain" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("-")]

    from timeseries_data_provider_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("tdps-bench")
    qs = entry.queries()
    non_bench = set(getattr(entry, "NON_BENCH", ()))
    if only:
        # substring name filter; NON_BENCH queries (correctness
        # harnesses whose runtime is driver orchestration, not query
        # cost) are included only when named EXACTLY — a loose
        # substring like "6" must not sweep the collector replay into
        # a timed run
        qs = {
            k: v
            for k, v in qs.items()
            if any(o in k for o in only)
            and (k not in non_bench or k in only)
        }
        if not qs:
            print(f"no queries match {only}", file=sys.stderr)
            sys.exit(1)
    else:
        for skip in non_bench:
            qs.pop(skip, None)

    # warm-up (not counted): JVM JIT + parquet footer caches + Python
    # UDF worker pool (a long-running service reuses workers; paying the
    # spawn inside one arbitrary query would misattribute it). Skipped
    # under --explain, which runs no timed collects (review finding:
    # explain mode used to pay a full query collect for nothing).
    # Caveat: a few declared queries have DOCUMENTED construction-time
    # side effects (q59's histogram cut, q31's once-per-process layout
    # build, q65's trace replay — each named in its docstring), so
    # --explain still pays those one-time jobs; it never runs the
    # queries themselves.
    if not explain:
        qs[next(iter(qs))](spark, sf_dir).collect()
        spark.range(256).repartition(32).mapInPandas(
            lambda it: it, "id long"
        ).count()

    repeat = max(1, int(os.environ.get("SPARK_GRAFT_REPEAT", "2")))
    names = sorted(qs)
    if explain:
        for name in names:
            print(f"===== {name}")
            qs[name](spark, sf_dir).explain("formatted")
    samples: dict[str, list[float]] = {name: [] for name in names}
    # ONE explain guard around everything that times or reports — a
    # seam between separate guards is where the --explain min([])
    # crash slipped in (review finding)
    if not explain:
        import statistics

        # Round-robin passes: one host-contention window can poison at
        # most one of each query's samples (see module docstring).
        for _ in range(repeat):
            for name in names:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).collect()
                samples[name].append(time.perf_counter() - t0)

        # Headline per-query number stays the MIN (host contention only
        # ever ADDS time); p50/max ride along so a reader can separate
        # composition cost from noise without re-deriving it from
        # cross-round deltas (VERDICT r5 item 8). p50 is the true
        # median (mean of the middle two at even repeat counts — the
        # upper-middle sample would equal max at the default repeat=2).
        timings = {
            name: round(min(s), 4) for name, s in samples.items()
        }
        spread = {
            name: {
                "min": round(min(s), 4),
                "p50": round(statistics.median(s), 4),
                "max": round(max(s), 4),
            }
            for name, s in samples.items()
        }
        sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
        try:
            sf_num = float(sf)
        except ValueError:
            sf_num = sf
        print(
            json.dumps(
                {
                    "metric": "total_query_sec",
                    "value": round(sum(timings.values()), 4),
                    "unit": "sec",
                    "queries": timings,
                    "query_spread": spread,
                    "repeat": repeat,
                    "sf": sf_num,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
