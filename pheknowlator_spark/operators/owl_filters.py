"""OWL-semantics triple filtering + graph set ops (P5-P10, U1-U5, A10).

Re-expresses reference pkt_kg/owlnets.py:122-225 and
pkt_kg/utils/kg_utils.py graph-set utilities as joins/filters over the
triple DataFrame. The reference probes ``graph.triples((x, RDF.type, None))``
per row (its hottest nested loop, owlnets.py:168-173); here the node-kind
lookups are two hash joins over the whole table at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pheknowlator_spark.functions.rdf import (
    OBO,
    OWL_AXIOM,
    OWL_CLASS,
    OWL_DEPRECATED,
    OWL_DISJOINT_WITH,
    OWL_NAMED_INDIVIDUAL,
    OWL_OBJECT_PROPERTY,
    RDF_TYPE,
    RDFS_SUBCLASSOF,
)

# namespace prefix filters (owlnets.py:92-94)
TOP_LEVEL_NS = ("ISO", "SUMO", "BFO")
SUPPORT_NS = ("IAO", "SWO", "OBI", "UBPROP")
RELATIONS_NS = ("RO",)


def remove_disjoint_with(triples: DataFrame) -> DataFrame:
    """Drop triples with owl:disjointWith as predicate or object
    (owlnets.py:122-138)."""
    return triples.filter(
        (F.col("p") != OWL_DISJOINT_WITH) & (F.col("o") != OWL_DISJOINT_WITH)
    )


def _typed_as(triples: DataFrame, type_uri: str) -> DataFrame:
    return (
        triples.filter((F.col("p") == RDF_TYPE) & (F.col("o") == type_uri))
        .select(F.col("s").alias("node"))
        .distinct()
    )


def _ns_pred(col, namespaces: tuple[str, ...]):
    """True if the OBO CURIE of ``col`` starts with any of the given prefixes."""
    curie = F.element_at(F.split(col, "/"), -1)
    pred = F.lit(False)
    for ns in namespaces:
        pred = pred | curie.startswith(ns + "_")
    return pred


def filter_owl_semantics(
    triples: DataFrame,
    keep_relations_ns: bool = True,
) -> DataFrame:
    """P5: keep URI-URI-URI triples whose subject and object are typed
    owl:Class or owl:NamedIndividual and predicate is an owl:ObjectProperty
    or rdfs:subClassOf / rdf:type; drop top-level/support-namespace nodes
    (ISO/SUMO/BFO, IAO/SWO/OBI/UBPROP) in subject/object position and
    (optionally) RO relations as nodes.

    Parity: removes_edges_with_owl_semantics (owlnets.py:140-191).

    Scale: classes/props node-kind tables come from the same triple scan and
    are orders of magnitude smaller than the triple table — broadcast them.
    """
    uri_triples = triples.filter(~F.col("o_is_literal"))
    classes = _typed_as(triples, OWL_CLASS).unionByName(
        _typed_as(triples, OWL_NAMED_INDIVIDUAL)
    ).distinct()
    props = _typed_as(triples, OWL_OBJECT_PROPERTY)

    node_ns = TOP_LEVEL_NS + SUPPORT_NS + (RELATIONS_NS if keep_relations_ns else ())
    good_nodes = classes.filter(~_ns_pred(F.col("node"), node_ns))

    out = (
        uri_triples.join(
            F.broadcast(good_nodes.withColumnRenamed("node", "s")), "s", "left_semi"
        )
        .join(
            F.broadcast(good_nodes.withColumnRenamed("node", "o")), "o", "left_semi"
        )
    )
    pred_ok = (
        (F.col("p") == RDFS_SUBCLASSOF)
        | (F.col("p") == RDF_TYPE)
    )
    out = out.join(
        F.broadcast(props.withColumnRenamed("node", "p")), "p", "left_semi"
    ).unionByName(out.filter(pred_ok)).distinct()
    return out


def clean_decoded_graph(triples: DataFrame) -> DataFrame:
    """P5 relaxed variant for post-decode graphs (owlnets.py:193-225):
    keep non-literal triples not touching owl:* vocabulary nodes."""
    owl_ns = "http://www.w3.org/2002/07/owl#"
    return triples.filter(
        (~F.col("o_is_literal"))
        & (~F.col("s").startswith(owl_ns))
        & (~F.col("o").startswith(owl_ns))
        & (F.col("p") != RDF_TYPE)
        | ((F.col("p") == RDF_TYPE) & (~F.col("o").startswith(owl_ns)) & (~F.col("o_is_literal")))
    )


def self_loops(triples: DataFrame) -> DataFrame:
    """P7: triples with s == o (kg_utils.py:423-438)."""
    return triples.filter(F.col("s") == F.col("o"))


def remove_self_loops(triples: DataFrame) -> DataFrame:
    return triples.filter(F.col("s") != F.col("o"))


def deprecated_classes(triples: DataFrame) -> DataFrame:
    """P8: subjects with owl:deprecated 'true' (kg_utils.py:105-117)."""
    return (
        triples.filter(
            (F.col("p") == OWL_DEPRECATED) & (F.lower(F.col("o")) == "true")
        )
        .select(F.col("s").alias("node"))
        .distinct()
    )


def checks_classes(edges: DataFrame, ontology_classes: DataFrame,
                   sub_col: str = "n1_uri", obj_col: str = "n2_uri",
                   sub_is_class=None, obj_is_class=None) -> DataFrame:
    """P9: admit an edge only if its ontology-class endpoints exist in the
    merged-ontology class set (knowledge_graph.py:248-267).

    ``ontology_classes``: one-column DataFrame ``[node]`` (broadcast).
    ``sub_is_class``/``obj_is_class``: optional boolean Columns gating which
    side must be checked (entity sides skip the check).
    """
    cls = ontology_classes.select(F.col(ontology_classes.columns[0]).alias("node"))
    out = edges
    if sub_is_class is None:
        out = out.join(
            F.broadcast(cls.withColumnRenamed("node", sub_col)), sub_col, "left_semi"
        )
    else:
        flagged = out.join(
            F.broadcast(cls.select(F.col("node").alias(sub_col), F.lit(True).alias("__s_ok"))),
            sub_col, "left",
        )
        out = flagged.filter(F.col("__s_ok") | ~sub_is_class).drop("__s_ok")
    if obj_is_class is None:
        out = out.join(
            F.broadcast(cls.withColumnRenamed("node", obj_col)), obj_col, "left_semi"
        )
    else:
        flagged = out.join(
            F.broadcast(cls.select(F.col("node").alias(obj_col), F.lit(True).alias("__o_ok"))),
            obj_col, "left",
        )
        out = flagged.filter(F.col("__o_ok") | ~obj_is_class).drop("__o_ok")
    return out


def remove_triples(triples: DataFrame, to_remove: DataFrame) -> DataFrame:
    """U3: triple removal via anti-join on (s,p,o) (kg_utils.py:303-318)."""
    return triples.join(
        to_remove.select("s", "p", "o"), ["s", "p", "o"], "left_anti"
    )


def graph_difference(all_triples: DataFrame, subset: DataFrame) -> DataFrame:
    """U2: logic = all − annotation (kg_utils.py:640)."""
    return all_triples.join(subset.select("s", "p", "o"), ["s", "p", "o"], "left_anti")


def resolve_duplicate_predicates(triples: DataFrame) -> DataFrame:
    """A10: per (s,o) group with >1 predicate where one is rdfs:subClassOf,
    keep the non-subClassOf predicate (verifies_cleaned_classes,
    owlnets.py:591-619). Window top-1 with subClassOf sorted last."""
    from pyspark.sql import Window

    w = Window.partitionBy("s", "o").orderBy(
        (F.col("p") == RDFS_SUBCLASSOF).cast("int").asc(), F.col("p").asc()
    )
    return (
        triples.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def axiom_nodes(triples: DataFrame) -> DataFrame:
    """Nodes typed owl:Axiom (N1 candidate set, owlnets.py:793-800)."""
    return _typed_as(triples, OWL_AXIOM)


def class_nodes(triples: DataFrame) -> DataFrame:
    return _typed_as(triples, OWL_CLASS)


def object_property_nodes(triples: DataFrame) -> DataFrame:
    return _typed_as(triples, OWL_OBJECT_PROPERTY)
