"""OWL-NETS decode tests (M4) — one fixture per decode rule, with expected
outputs derived from the published OWL-NETS 2.0 semantics (reference
tests/test_owlnets.py:652-965 assertion style, re-derived not copied)."""

import pytest
from pyspark.sql import functions as F

from pheknowlator_spark.functions.rdf import (
    OBO,
    OWL_AXIOM,
    OWL_CLASS,
    OWL_OBJECT_PROPERTY,
    OWL_RESTRICTION,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    RDFS_SUBCLASSOF,
)
from pheknowlator_spark.operators.owlnets import (
    BFO_ROOT,
    RO_0000086,
    assign_forests,
    decode_roots,
    make_graph_connected,
    purify_graph,
    run_owlnets,
)

OWL_NS = "http://www.w3.org/2002/07/owl#"
GO1, GO2, GO3 = OBO + "GO_0000785", OBO + "GO_0110165", OBO + "GO_0005694"
PART_OF = OBO + "BFO_0000050"
A, B, X, Y = OBO + "A_1", OBO + "B_1", OBO + "X_1", OBO + "Y_1"
PATO = OBO + "PATO_0000587"


def t(s, p, o, lit=False):
    return (s, p, o, lit, None, None)


TRIPLE_SCHEMA = (
    "s string, p string, o string, o_is_literal boolean, "
    "o_lang string, o_datatype string"
)


def make_triples(spark, rows):
    base = [
        t(PART_OF, RDF_TYPE, OWL_OBJECT_PROPERTY),
        t(RO_0000086, RDF_TYPE, OWL_OBJECT_PROPERTY),
    ]
    return spark.createDataFrame(base + rows, TRIPLE_SCHEMA)


def decoded_set(spark, rows, approach="subclass"):
    out = run_owlnets(make_triples(spark, rows), approach=approach)
    return {(r.s, r.p, r.o) for r in out["owlnets"].collect()}, out


def test_restriction_decode(spark):
    rows = [
        t(GO1, RDF_TYPE, OWL_CLASS),
        t(GO2, RDF_TYPE, OWL_CLASS),
        t(GO3, RDF_TYPE, OWL_CLASS),
        t(GO1, RDFS_SUBCLASSOF, GO2),
        t(GO1, RDFS_SUBCLASSOF, "bnode:r1"),
        t("bnode:r1", RDF_TYPE, OWL_RESTRICTION),
        t("bnode:r1", OWL_NS + "onProperty", PART_OF),
        t("bnode:r1", OWL_NS + "someValuesFrom", GO3),
    ]
    got, _ = decoded_set(spark, rows)
    assert (GO1, PART_OF, GO3) in got  # the decoded restriction
    assert (GO1, RDFS_SUBCLASSOF, GO2) in got  # plain triple survives


def test_intersection_decode(spark):
    rows = [
        t(X, RDF_TYPE, OWL_CLASS),
        t(A, RDF_TYPE, OWL_CLASS),
        t(B, RDF_TYPE, OWL_CLASS),
        t(X, RDFS_SUBCLASSOF, "bnode:c1"),
        t("bnode:c1", RDF_TYPE, OWL_CLASS),
        t("bnode:c1", OWL_NS + "intersectionOf", "bnode:l1"),
        t("bnode:l1", RDF_FIRST, A),
        t("bnode:l1", RDF_REST, "bnode:l2"),
        t("bnode:l2", RDF_FIRST, B),
        t("bnode:l2", RDF_REST, RDF_NIL),
    ]
    got, _ = decoded_set(spark, rows)
    # intersection: node → member (owlnets.py:534-535)
    assert (X, RDFS_SUBCLASSOF, A) in got
    assert (X, RDFS_SUBCLASSOF, B) in got


def test_union_decode_reversed(spark):
    rows = [
        t(X, RDF_TYPE, OWL_CLASS),
        t(A, RDF_TYPE, OWL_CLASS),
        t(B, RDF_TYPE, OWL_CLASS),
        t(X, RDFS_SUBCLASSOF, "bnode:c1"),
        t("bnode:c1", RDF_TYPE, OWL_CLASS),
        t("bnode:c1", OWL_NS + "unionOf", "bnode:l1"),
        t("bnode:l1", RDF_FIRST, A),
        t("bnode:l1", RDF_REST, "bnode:l2"),
        t("bnode:l2", RDF_FIRST, B),
        t("bnode:l2", RDF_REST, RDF_NIL),
    ]
    got, _ = decoded_set(spark, rows)
    # union: member → node (owlnets.py:528-529)
    assert (A, RDFS_SUBCLASSOF, X) in got
    assert (B, RDFS_SUBCLASSOF, X) in got


def test_has_self_decode(spark):
    rows = [
        t(X, RDF_TYPE, OWL_CLASS),
        t(X, RDFS_SUBCLASSOF, "bnode:r1"),
        t("bnode:r1", RDF_TYPE, OWL_RESTRICTION),
        t("bnode:r1", OWL_NS + "onProperty", PART_OF),
        t("bnode:r1", OWL_NS + "hasSelf", "true", lit=True),
    ]
    got, _ = decoded_set(spark, rows)
    assert (X, PART_OF, X) in got


def test_pato_property_selection(spark):
    # union members that are PATO terms from a non-PATO node → RO_0000086
    rows = [
        t(X, RDF_TYPE, OWL_CLASS),
        t(PATO, RDF_TYPE, OWL_CLASS),
        t(X, RDFS_SUBCLASSOF, "bnode:c1"),
        t("bnode:c1", RDF_TYPE, OWL_CLASS),
        t("bnode:c1", OWL_NS + "intersectionOf", "bnode:l1"),
        t("bnode:l1", RDF_FIRST, PATO),
        t("bnode:l1", RDF_REST, RDF_NIL),
    ]
    got, _ = decoded_set(spark, rows)
    assert (X, RO_0000086, PATO) in got


def test_negation_dropped(spark):
    lacks = OBO + "pr#lacks_part"
    rows = [
        t(X, RDF_TYPE, OWL_CLASS),
        t(Y, RDF_TYPE, OWL_CLASS),
        t(X, RDFS_SUBCLASSOF, "bnode:r1"),
        t("bnode:r1", RDF_TYPE, OWL_RESTRICTION),
        t("bnode:r1", OWL_NS + "onProperty", lacks),
        t("bnode:r1", OWL_NS + "someValuesFrom", Y),
    ]
    got, out = decoded_set(spark, rows)
    assert not any(p == lacks for _, p, _ in got)
    stats = {r.status for r in out["decode_status"].collect()}
    assert "negation" in stats


def test_complement_of_dropped(spark):
    rows = [
        t(X, RDF_TYPE, OWL_CLASS),
        t(Y, RDF_TYPE, OWL_CLASS),
        t(X, RDFS_SUBCLASSOF, "bnode:c1"),
        t("bnode:c1", RDF_TYPE, OWL_CLASS),
        t("bnode:c1", OWL_NS + "complementOf", Y),
    ]
    got, out = decoded_set(spark, rows)
    assert (X, RDFS_SUBCLASSOF, Y) not in got
    stats = {r.status for r in out["decode_status"].collect()}
    assert "complementOf" in stats


def test_axiom_direct_decode(spark):
    rows = [
        t(A, RDF_TYPE, OWL_CLASS),
        t(B, RDF_TYPE, OWL_CLASS),
        t("bnode:ax1", RDF_TYPE, OWL_AXIOM),
        t("bnode:ax1", OWL_NS + "annotatedSource", A),
        t("bnode:ax1", OWL_NS + "annotatedTarget", B),
        t("bnode:ax1", OWL_NS + "annotatedProperty", RDFS_SUBCLASSOF),
    ]
    triples = make_triples(spark, rows)
    roots = {r.root for r in decode_roots(triples).collect()}
    assert "bnode:ax1" in roots
    got, _ = decoded_set(spark, rows)
    assert (A, RDFS_SUBCLASSOF, B) in got


def test_cardinality_captured_not_decoded(spark):
    rows = [
        t(X, RDF_TYPE, OWL_CLASS),
        t(Y, RDF_TYPE, OWL_CLASS),
        t(X, RDFS_SUBCLASSOF, "bnode:r1"),
        t("bnode:r1", RDF_TYPE, OWL_RESTRICTION),
        t("bnode:r1", OWL_NS + "onProperty", PART_OF),
        t("bnode:r1", OWL_NS + "qualifiedCardinality", "2", lit=True),
        t("bnode:r1", OWL_NS + "onClass", Y),
    ]
    got, out = decoded_set(spark, rows)
    assert (X, PART_OF, Y) in got  # onClass target still decoded
    stats = {r.status for r in out["decode_status"].collect()}
    assert "cardinality" in stats


def test_disjoint_with_removed(spark):
    rows = [
        t(A, RDF_TYPE, OWL_CLASS),
        t(B, RDF_TYPE, OWL_CLASS),
        t(A, OWL_NS + "disjointWith", B),
        t(A, RDFS_SUBCLASSOF, B),
    ]
    got, _ = decoded_set(spark, rows)
    assert (A, OWL_NS + "disjointWith", B) not in got
    assert (A, RDFS_SUBCLASSOF, B) in got


def test_make_graph_connected(spark):
    triples = spark.createDataFrame(
        [(A, RDFS_SUBCLASSOF, B), (X, PART_OF, Y)], "s string, p string, o string"
    )
    out = make_graph_connected(triples, "subclass")
    got = {(r.s, r.p, r.o) for r in out.collect()}
    # B is rootless (no subClassOf ancestor) → attached to BFO root
    assert (B, RDFS_SUBCLASSOF, BFO_ROOT) in got
    # A has an ancestor (B) → not attached directly
    assert (A, RDFS_SUBCLASSOF, BFO_ROOT) not in got


def test_purify_subclass(spark):
    triples = spark.createDataFrame(
        [
            (X, RDF_TYPE, A),
            (A, RDFS_SUBCLASSOF, B),
        ],
        "s string, p string, o string",
    )
    out = purify_graph(triples, "subclass")
    got = {(r.s, r.p, r.o) for r in out.collect()}
    # rdf:type rewritten to subClassOf and expanded to object ancestors
    assert (X, RDFS_SUBCLASSOF, A) in got
    assert (X, RDFS_SUBCLASSOF, B) in got
    assert (X, RDF_TYPE, A) not in got


def test_forest_assignment_depth(spark):
    rows = [
        t(X, RDF_TYPE, OWL_CLASS),
        t(X, RDFS_SUBCLASSOF, "bnode:1"),
        t("bnode:1", OWL_NS + "intersectionOf", "bnode:2"),
        t("bnode:2", RDF_FIRST, A),
        t("bnode:2", RDF_REST, "bnode:3"),
        t("bnode:3", RDF_FIRST, B),
        t("bnode:3", RDF_REST, RDF_NIL),
    ]
    triples = make_triples(spark, rows)
    forests = assign_forests(triples, decode_roots(triples))
    x_forest = {
        (r.s, r.p, r.o) for r in forests.filter(F.col("root") == X).collect()
    }
    assert ("bnode:3", RDF_FIRST, B) in x_forest  # depth-3 bnode reached
