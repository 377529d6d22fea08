"""spark-submit entry point for the pages→triples build (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

The package ships as a zip through ``--py-files`` so executors import it
without any shared filesystem; nothing here relies on driver-local
PYTHONPATH. On a real cluster swap ``--master`` for YARN/K8s and the
parquet paths for Iceberg tables.

Usage (see scripts/spark_submit_demo.sh):

    cd /root/repo && zip -qr /tmp/pkt_spark.zip pheknowlator_spark
    spark-submit --master 'local[8]' --py-files /tmp/pkt_spark.zip \
        scripts/submit_pipeline.py <pages_parquet> <out_dir> [min_pages]

Writes the triples + lineage through StageStore (resumable: re-submit with
the same out_dir and committed stages are read back, not recomputed).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    from pyspark.sql import SparkSession

    # the package arrives via --py-files; import AFTER SparkSession exists
    spark = SparkSession.builder.appName("pkt_pages_to_triples").getOrCreate()
    from pheknowlator_spark.plans.checkpoint import StageStore
    from pheknowlator_spark.sources.pages import entity_dictionary
    from pheknowlator_spark.webtext.pipeline import run_pipeline

    pages_path, out_dir = sys.argv[1], sys.argv[2]
    min_pages = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    store = StageStore(spark, out_dir)
    pages = spark.read.parquet(pages_path)
    out = run_pipeline(
        pages,
        entity_dictionary(spark),
        min_pages=min_pages,
        re_extract=True,
        quality_threshold=0.4,
    )
    # commit the co-mention aggregate FIRST (the only stage that needs the
    # corpus scan), then derive triples from the COMMITTED parquet — the
    # linear unshared pipeline plan would otherwise re-run the whole scan +
    # mention detection a second time for the triples stage
    comentions = store.run("comention_edges", lambda: out["comention_edges"])

    def triples_from_committed():
        from pheknowlator_spark.operators.constructors import construct_edges
        from pheknowlator_spark.webtext.pipeline import edges_for_construction

        t, _errors = construct_edges(
            edges_for_construction(comentions), approach="subclass"
        )
        return t.distinct()

    triples = store.run(
        "triples", triples_from_committed, partition_by=["edge_type"]
    )
    manifest = store.write_manifest()
    print(
        json.dumps(
            {
                "triples": triples.count(),
                "comention_edges": comentions.count(),
                "manifest": manifest,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
