"""Round-6 optimization harness (bench.py is FROZEN for measurement; this
file exists for §1-style isolation: per-query floors, explain captures,
stage breakdowns). Usage:

  python bench_extra.py time q1 q2 ...     # best-of-N noop-sink floors
  python bench_extra.py explain q1 q2 ...  # write plans/r06/<q>_<tag>.txt
  python bench_extra.py full_build         # time the full_build composition

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, REPS (default 3), TAG (explain
file suffix, default "before").
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
REPS = int(os.environ.get("REPS", "3"))
TAG = os.environ.get("TAG", "before")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entry_mod

    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:]
    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]")
    queries = entry_mod.queries()
    force(spark.read.parquet(f"{SF_DIR}/region.parquet"))

    if mode == "explain":
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = queries[name](spark, SF_DIR)
            p = f"plans/r06/{name}_{TAG}.txt"
            emode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(emode))
            print(f"wrote {p}")
        return

    if mode == "full_build":
        import shutil
        import tempfile

        from pheknowlator_spark.plans.checkpoint import StageStore
        from pheknowlator_spark.plans.full_build import full_build

        best, times = float("inf"), []
        for _ in range(REPS):
            d = tempfile.mkdtemp(prefix="pkt_bx_fb_")
            try:
                t0 = time.time()
                out = full_build(
                    spark,
                    StageStore(spark, d),
                    [entry_mod._owlnets_fixture(spark, SF_DIR)],
                    entry_mod._nation_region_edges(spark, SF_DIR, "RO_0001015"),
                    approach="subclass",
                )
                out["owlnets"].count()
                t = time.time() - t0
                times.append(round(t, 3))
                best = min(best, t)
            finally:
                shutil.rmtree(d, ignore_errors=True)
        print(json.dumps({"full_build": round(best, 3), "reps": times}))
        return

    results: dict[str, float] = {}
    rep_log: dict[str, list] = {}
    if not names:
        import bench as bench_mod

        names = list(bench_mod.HEADLINE)
    for name in names:
        best, times = float("inf"), []
        for _ in range(REPS):
            t0 = time.time()
            force(queries[name](spark, SF_DIR))
            t = time.time() - t0
            times.append(round(t, 3))
            best = min(best, t)
        results[name] = round(best, 3)
        rep_log[name] = times
    print(json.dumps({"total": round(sum(results.values()), 3),
                      "queries": results, "reps": rep_log}))


if __name__ == "__main__":
    main()
