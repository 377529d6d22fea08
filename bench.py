"""Benchmark harness.

Runs the headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the webtext
pages→triples pipeline at two parallelism levels (local[N/4] vs local[N])
to evidence the north rule's N→4N scaling efficiency.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pages_per_hour": ..., "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pheknowlator_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "48000"))

HEADLINE = [
    "subclass_core_inverse",
    "instance_core_inverse",
    "edge_filter_project",
    "edge_dedup_window",
    "identifier_map_join",
    "graph_stats",
    "top_predicates",
    "mode_per_group",
    "connected_components",
    "transitive_closure",
    "dedup_exact",
    "minhash_near_dup",
    "ann_quantized_topk",
    "mentions",
    "comention_edges",
    "token_stats",
    "pipeline_triples",
]


def force(df):
    df.write.format("noop").mode("overwrite").save()


PAGES_DIR = os.environ.get("SPARK_GRAFT_BENCH_PAGES_DIR", "/tmp/pkt_bench_pages_v2")
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))  # N vs 4N cores
STAGE_FILES = 64  # pages parquet file count == max scan parallelism grain

# bench sessions read one staged file per task: balanced task sizes at BOTH
# core counts (64 tasks = 32 waves at N=2, 8 waves at 4N=8), the local-mode
# stand-in for a real cluster's input-split sizing. Without this, Spark's
# local split sizing gives exactly one split per core and a single straggler
# sets the stage time.
SCALE_CONF = {
    "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
    "spark.sql.files.openCostInBytes": str(128 * 1024),
}


def stage_pages(n_pages: int) -> None:
    """Untimed setup: materialize the synthetic pages table to parquet —
    the timed job reads it like the production Iceberg pages table (keeps
    exactly one Python crossing in the measured path)."""
    if os.path.exists(os.path.join(PAGES_DIR, "_SUCCESS")):
        return
    from pheknowlator_spark.sources.pages import generate_pages

    spark = get_spark(app_name="bench_setup", master=f"local[{CPUS}]")
    generate_pages(spark, n_pages, partitions=STAGE_FILES, size_factor=5).write.mode(
        "overwrite"
    ).parquet(PAGES_DIR)
    spark.stop()


def run_pipeline_job(spark) -> None:
    """pages parquet → extract+quality+mention (fused Arrow stage) → link →
    co-mention edges → triples."""
    from pheknowlator_spark.sources.pages import entity_dictionary
    from pheknowlator_spark.webtext.pipeline import run_pipeline

    pages = spark.read.parquet(PAGES_DIR)
    out = run_pipeline(
        pages,
        entity_dictionary(spark),
        min_pages=2,
        re_extract=True,
        quality_threshold=0.4,
    )
    force(out["triples"])


def run_scan_job(spark) -> None:
    """The corpus-scan stage alone (fused extract+quality+mention) — the
    wall-time-dominant stage at 10^12-doc scale, and the one whose scaling
    matters most (everything downstream runs on mention aggregates)."""
    from pheknowlator_spark.sources.pages import entity_dictionary
    from pheknowlator_spark.webtext.mentions import extract_and_detect

    pages = spark.read.parquet(PAGES_DIR)
    force(extract_and_detect(pages, entity_dictionary(spark), min_quality=0.4))


def _timed(cores: int, reps: int, job, max_reps: int | None = None) -> float:
    """Warm best-of-N with storm tolerance.

    This VM shows up to 4x run-to-run variance (system-CPU storms on the
    Python worker fleet); a single polluted rep would invalidate the
    scaling ratio. After the warm-up, reps continue past ``reps`` while the
    best time is still improving by >10%, up to ``max_reps`` — the stable
    floor is the statistic, matching how per-executor throughput would be
    measured on a quiet cluster.
    """
    max_reps = max_reps or (2 * reps + 2)
    spark = get_spark(
        app_name=f"bench_c{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf=SCALE_CONF,
    )
    job(spark)  # warm python workers + JIT
    best = float("inf")
    n = 0
    while n < max_reps:
        t0 = time.time()
        job(spark)
        t = time.time() - t0
        n += 1
        improved = t < best * 0.9
        best = min(best, t)
        if n >= reps and not improved:
            break
    spark.stop()
    return best


def main() -> None:
    import __spark_entry__ as entry_mod

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    results: dict[str, float] = {}

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    queries = entry_mod.queries()
    # one warmup action so JVM/codegen startup doesn't pollute query times
    force(spark.read.parquet(f"{SF_DIR}/region.parquet"))

    t_total0 = time.time()
    for name in HEADLINE:
        t0 = time.time()
        force(queries[name](spark, SF_DIR))
        results[name] = round(time.time() - t0, 3)
    spark.stop()

    total = round(time.time() - t_total0, 3)

    # scaling: identical pages→triples job at N vs 4N cores (sandbox
    # stand-in for N vs 4N executors; BASELINE.md documents the mapping)
    stage_pages(N_PAGES)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    quarter = SCALE_N
    full = 4 * SCALE_N
    t_quarter = _timed(quarter, reps, run_pipeline_job)
    t_full = _timed(full, reps, run_pipeline_job)
    scan_quarter = _timed(quarter, reps, run_scan_job)
    scan_full = _timed(full, reps, run_scan_job)
    pages_per_hour = N_PAGES / t_full * 3600

    thr_n, thr_4n = N_PAGES / t_quarter, N_PAGES / t_full
    efficiency = (thr_4n / thr_n) / (full / quarter)
    scan_efficiency = (scan_quarter / scan_full) / (full / quarter)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
                "pages_per_hour": round(pages_per_hour),
                "bench_pages": N_PAGES,
                "scaling": {
                    "cores_n": quarter,
                    "cores_4n": full,
                    "sec_n": round(t_quarter, 3),
                    "sec_4n": round(t_full, 3),
                    "throughput_n_pages_per_sec": round(thr_n, 2),
                    "throughput_4n_pages_per_sec": round(thr_4n, 2),
                    "efficiency_n_to_4n": round(efficiency, 3),
                    "scan_stage_sec_n": round(scan_quarter, 3),
                    "scan_stage_sec_4n": round(scan_full, 3),
                    "scan_stage_efficiency_n_to_4n": round(scan_efficiency, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
