"""Graph statistics aggregations (A2-A6).

Single-pass DataFrame aggregations replacing the reference's
set-comprehension counts (kg_utils.py:441-485) and Counter top-k
(kg_utils.py:474-477). At 10^12-triple scale swap exact countDistinct for
approx_count_distinct (both exposed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pheknowlator_spark.functions.rdf import (
    OWL_CLASS,
    OWL_NAMED_INDIVIDUAL,
    OWL_OBJECT_PROPERTY,
    RDF_TYPE,
)


def graph_statistics(triples: DataFrame, approximate: bool = False) -> DataFrame:
    """A2: triple/node/predicate/class/individual/property counts
    (derives_graph_statistics, kg_utils.py:441-485).

    Two aggregation passes instead of one 7-way multi-distinct: the three
    typed-node counts run over the highly selective ``rdf:type`` slice
    (the predicate pushes to the scan) while the corpus-wide distincts
    keep a 4-way Expand — Spark plans N distinct aggregates as an
    N×-row Expand before the dedup exchange, so trimming the Expand from
    7× to 4× cuts the dominant shuffle by ~40% at every scale for a
    second, filter-pushed scan of the input (measured 1.59 → 1.23 s at
    sf0.1). Callers passing an expensive UNMATERIALIZED subtree should
    cut lineage first — both passes evaluate the input.
    """
    cd = F.approx_count_distinct if approximate else F.countDistinct
    typed = triples.filter(
        (F.col("p") == RDF_TYPE)
        & F.col("o").isin([OWL_CLASS, OWL_NAMED_INDIVIDUAL, OWL_OBJECT_PROPERTY])
    )
    small = typed.agg(
        cd(F.when(F.col("o") == OWL_CLASS, F.col("s"))).alias("n_classes"),
        cd(F.when(F.col("o") == OWL_NAMED_INDIVIDUAL, F.col("s"))).alias(
            "n_individuals"
        ),
        cd(F.when(F.col("o") == OWL_OBJECT_PROPERTY, F.col("s"))).alias(
            "n_object_properties"
        ),
    )
    big = triples.agg(
        F.count(F.lit(1)).alias("n_triples"),
        cd(F.col("s")).alias("n_subjects"),
        cd(F.col("p")).alias("n_predicates"),
        cd(F.col("o")).alias("n_objects"),
    )
    return big.crossJoin(F.broadcast(small)).select(
        "n_triples",
        "n_subjects",
        "n_predicates",
        "n_objects",
        "n_classes",
        "n_individuals",
        "n_object_properties",
    )


def top_predicates(triples: DataFrame, k: int = 6) -> DataFrame:
    """A4: most common predicates (kg_utils.py:474-475)."""
    return (
        triples.groupBy("p")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("p").asc())
        .limit(k)
    )


def top_degree_nodes(triples: DataFrame, k: int = 6) -> DataFrame:
    """A4: highest out-degree subjects (kg_utils.py:476-477)."""
    return (
        triples.groupBy("s")
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy(F.col("degree").desc(), F.col("s").asc())
        .limit(k)
    )


def edge_type_statistics(triples: DataFrame) -> DataFrame:
    """A3: per-edge-type triple and node counts (knowledge_graph.py:295-314)."""
    return triples.groupBy("edge_type").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("s").alias("n_subjects"),
        F.countDistinct("o").alias("n_objects"),
    )


def mode_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """A5/W3: most frequent value per group with deterministic (lexicographic
    min) tie-break — replaces statistics.mode + random.sample tie-break
    (owlnets.py:703-704; SURVEY §7.4 risk 2)."""
    counted = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    # top-1 per group as a min_by hash aggregation (map-side partial
    # combine) instead of a row_number window sort; cnt >= 1 so the
    # negated ordering key cannot overflow
    return (
        counted.groupBy(group_col)
        .agg(
            F.min_by(
                F.col(value_col),
                F.struct((-F.col("cnt")).alias("d"), F.col(value_col)),
            ).alias(value_col)
        )
        .select(group_col, value_col)
    )


def synonym_dictionary(triples: DataFrame, synonym_predicates: list[str]) -> DataFrame:
    """A6: lowercase literal → set of class URIs — the dictionary that feeds
    the Aho-Corasick automaton (kg_utils.py:138-194).

    Returns [surface, curies: array<string>, match_type]."""
    syn = triples.filter(
        F.col("p").isin(synonym_predicates) & F.col("o_is_literal")
    )
    return (
        syn.groupBy(F.lower(F.col("o")).alias("surface"), F.col("p").alias("match_type"))
        .agg(F.sort_array(F.collect_set("s")).alias("curies"))
    )
