"""End-to-end incremental rebuild (SURVEY §2.11 incremental scans made
executable): commit a build from an initial page batch, append a new page
file, re-run, and assert (a) DELTA-ONLY scan work — the re-run processes
only the new file, recorded in StageStore lineage — and (b) the final
triple set equals a from-scratch batch rebuild over the full pages table."""

from pyspark.sql import functions as F

from pheknowlator_spark.plans.checkpoint import StageStore
from pheknowlator_spark.sources.pages import entity_dictionary, generate_pages
from pheknowlator_spark.streaming.events import (
    incremental_build,
    incremental_result,
)
from pheknowlator_spark.webtext.pipeline import run_pipeline


def _triples(df):
    return {(r.s, r.p, r.o) for r in df.select("s", "p", "o").collect()}


def test_incremental_rebuild_delta_only_and_equality(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    ckpt_dir = str(tmp_path / "stream_ckpt")
    store = StageStore(spark, str(tmp_path / "stages"))
    ed = entity_dictionary(spark)

    pages = generate_pages(spark, 120, partitions=4)
    first = pages.filter(F.xxhash64("url") % 3 != 0)
    second = pages.filter(F.xxhash64("url") % 3 == 0)
    first.coalesce(1).write.mode("overwrite").parquet(pages_dir)

    # initial build: one committed batch stage
    run1 = incremental_build(spark, store, pages_dir, ed, ckpt_dir)
    assert len(run1) == 1 and run1[0].startswith("incr_triples_")
    t1 = _triples(incremental_result(spark, store))
    assert t1  # the generator's hot surfaces guarantee co-mentions

    # idempotent re-run with NO new data: zero batches, zero new stages
    assert incremental_build(spark, store, pages_dir, ed, ckpt_dir) == []
    assert store.manifest()["stages"] == run1

    # append a page batch → re-run processes ONLY the new file
    second.coalesce(1).write.mode("append").parquet(pages_dir)
    run2 = incremental_build(spark, store, pages_dir, ed, ckpt_dir)
    assert len(run2) == 1 and run2[0] not in run1

    # (a) delta-only scan work: lineage rows exist for exactly the two
    # batch stages (one per file), and the second run's stage holds only
    # the delta batch's triples — the first stage was not recomputed
    # (StageStore.run returns the committed snapshot without invoking fn)
    lineage = store.lineage()
    stages = {
        r.stage for r in lineage.select("stage").distinct().collect()
    }
    assert stages == set(run1) | set(run2)
    delta_rows = store.run(
        run2[0], lambda: (_ for _ in ()).throw(RuntimeError("recompute!"))
    )
    batch2_expected = _triples(run_pipeline(second, ed, min_pages=1)["triples"])
    assert _triples(delta_rows) == batch2_expected

    # (b) final triples == from-scratch rebuild over the full pages table
    full = _triples(
        run_pipeline(spark.read.parquet(pages_dir), ed, min_pages=1)["triples"]
    )
    got = _triples(incremental_result(spark, store))
    assert got == full
    assert got >= t1  # append-only growth
