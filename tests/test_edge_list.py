"""Edge-list pipeline tests (M1) — parity with reference tests/test_edge_list.py
semantics: header inference, comment-row skipping, criteria filtering,
2-column reduction, label formatting, identifier-map joins.

Fixtures are synthesized here (FIXTURES.md §§4-6 shapes), not copied.
"""

import pytest
from pyspark.sql import functions as F

from pheknowlator_spark.operators.edge_list import (
    EdgeTypeConfig,
    apply_identifier_maps,
    build_edge_list,
    compile_criterion,
    data_reducer,
    edge_list_stats,
    filter_data,
    fix_criteria,
    label_formatter,
    parse_resource_info,
    read_edge_source,
)

# mirrors reference tests/data/resource_info.txt field layout:
# edge_type|source_labels|data_type|edge_relation|uri1|uri2|delimiter|
# column_idx|identifier_maps|evidence_criteria|filter_criteria
RESOURCE_INFO = (
    "chemical-disease|:;MESH_;|class-class|RO_0002606|"
    "http://purl.obolibrary.org/obo/|http://purl.obolibrary.org/obo/|t|1;4|"
    "0:mesh_chebi;1:disease_doid|5;!=;''|None\n"
    "gene-disease|;;|entity-class|RO_0003302|"
    "https://www.ncbi.nlm.nih.gov/gene/|http://purl.obolibrary.org/obo/|t|0;2|"
    "1:disease_doid|4;>=;0.70|None\n"
)


def test_parse_resource_info():
    cfg = parse_resource_info(RESOURCE_INFO)
    assert set(cfg) == {"chemical-disease", "gene-disease"}
    cd = cfg["chemical-disease"]
    assert cd.data_type == "class-class"
    assert cd.uri == ("http://purl.obolibrary.org/obo/",) * 2
    assert cd.column_idx == "1;4"
    assert cd.source_labels == ":;MESH_;"
    # quote-strip dance (edge_list.py:55-56): |5;!=;''| → "5;!=;" →
    # filter_fixer later yields "5;!=;None"
    assert cd.evidence_criteria == "5;!=;"
    assert cd.filter_criteria == "None"
    gd = cfg["gene-disease"]
    assert gd.edge_relation == "RO_0003302"
    assert gd.evidence_criteria == "4;>=;0.70"


@pytest.fixture(scope="module")
def gene_disease_tsv(tmp_path_factory):
    p = tmp_path_factory.mktemp("edges") / "gene_disease.tsv"
    rows = [
        "geneId\tgeneSymbol\tdiseaseId\tdiseaseName\tscore",
        "19\tA1BG\tC0019209\tHepatomegaly\t0.80",
        "19\tA1BG\tC0036341\tSchizophrenia\t0.50",
        "20\tA1CF\tC0001418\tAdenocarcinoma\t0.75",
        "23\tAARS\tC0001418\tAdenocarcinoma\t0.99",
    ]
    p.write_text("\n".join(rows) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def chem_disease_tsv(tmp_path_factory):
    # CTD-style: '#'-prefixed preamble rows lack tabs → skipped
    p = tmp_path_factory.mktemp("edges2") / "chem_disease.tsv"
    rows = [
        "# CTD chemical-disease associations",
        "# generated for tests",
        "ChemicalName\tChemicalID\tCasRN\tDiseaseName\tDiseaseID\tDirectEvidence",
        "10074-G5\tC534883\tNone\tAdenocarcinoma\tMESH:D000230\tmarker/mechanism",
        "10074-G5\tC534883\tNone\tLiver disease\tMESH:D008107\t",
        "Abrine\tC026591\tNone\tCancer\tMESH:D009369\ttherapeutic",
    ]
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_read_edge_source_header_and_skip(spark, chem_disease_tsv):
    df = read_edge_source(spark, chem_disease_tsv, "t")
    assert df.columns[:2] == ["ChemicalName", "ChemicalID"]
    assert df.count() == 3  # preamble + header rows excluded


def test_read_edge_source_fillna(spark, tmp_path):
    p = tmp_path / "gaps.tsv"
    p.write_text("a\tb\nx\t\ny\tz\n")
    df = read_edge_source(spark, str(p), "t")
    vals = {(r.a, r.b) for r in df.collect()}
    assert ("x", "None") in vals


def test_filter_numeric_ge(spark, gene_disease_tsv):
    df = read_edge_source(spark, gene_disease_tsv, "t")
    out = filter_data(df, "4;>=;0.70", "None")
    assert {r.geneId for r in out.collect()} == {"19", "20", "23"}
    assert out.count() == 3


def test_filter_not_equals_empty(spark, chem_disease_tsv):
    df = read_edge_source(spark, chem_disease_tsv, "t")
    # as produced by parse_resource_info from |5;!=;''| — fixer → "5;!=;None",
    # dropping rows whose (null-filled) evidence cell is 'None'
    out = filter_data(df, "None", "5;!=;")
    assert out.count() == 2


def test_filter_reversed_containment(spark, chem_disease_tsv):
    df = read_edge_source(spark, chem_disease_tsv, "t")
    # '5;marker;not in x' → keep rows whose evidence does NOT contain 'marker'
    out = filter_data(df, "5;marker;not in x", "None")
    assert out.count() == 2
    out2 = filter_data(df, "5;marker;in x", "None")
    assert out2.count() == 1


def test_filter_in_list(spark, chem_disease_tsv):
    df = read_edge_source(spark, chem_disease_tsv, "t")
    out = filter_data(df, "5;in;['marker/mechanism','therapeutic']", "None")
    assert out.count() == 2


def test_filter_startswith(spark, gene_disease_tsv):
    df = read_edge_source(spark, gene_disease_tsv, "t")
    out = filter_data(df, "1;.startswith('A1');", "None")
    assert {r.geneSymbol for r in out.collect()} == {"A1BG", "A1CF"}


def test_filter_dedup(spark, gene_disease_tsv):
    df = read_edge_source(spark, gene_disease_tsv, "t")
    # sort by score desc, keep first per geneId → gene 19 keeps 0.80 row
    out = filter_data(df, "4-0;dedup;desc", "None")
    assert out.count() == 3
    g19 = [r for r in out.collect() if r.geneId == "19"]
    assert g19[0].score == "0.80"


def test_filter_unknown_op_raises(spark, gene_disease_tsv):
    df = read_edge_source(spark, gene_disease_tsv, "t")
    with pytest.raises(ValueError):
        compile_criterion(df, "4;~~;0.70")


def test_fix_criteria():
    assert fix_criteria(";;") == "None;None;None"
    assert fix_criteria("5;!=;") == "5;!=;None"  # stripped '' → empty → None
    assert fix_criteria("1;.startswith('gene');") == "1;.startswith('gene');"


def test_data_reducer(spark, gene_disease_tsv):
    df = read_edge_source(spark, gene_disease_tsv, "t")
    out = data_reducer(df, "0;2")
    assert out.columns == ["sub_id", "obj_id"]
    assert out.count() == 4


def test_data_reducer_float_coercion(spark):
    df = spark.createDataFrame([("19.0", "x"), ("20.0", "y")], "a string, b string")
    out = data_reducer(df, "0;1")
    assert {r.sub_id for r in out.collect()} == {"19", "20"}


def test_label_formatter_strip_prefix(spark):
    df = spark.createDataFrame([("MESH:D000230", "REACT:R-HSA-1")], "a string, b string")
    out = label_formatter(df, ":;;")
    assert [(r.a, r.b) for r in out.collect()] == [("D000230", "R-HSA-1")]


def test_label_formatter_prepend(spark):
    df = spark.createDataFrame([("D000230", "123")], "a string, b string")
    out = label_formatter(df, ";MESH_;DOID_")
    assert [(r.a, r.b) for r in out.collect()] == [("MESH_D000230", "DOID_123")]


def test_identifier_maps_inner_join_drops_unmapped(spark):
    edges = spark.createDataFrame(
        [("MESH_C534883", "MESH_D000230"), ("MESH_ZZZ", "MESH_D008107")],
        "sub_id string, obj_id string",
    )
    mesh_chebi = spark.createDataFrame(
        [("MESH_C534883", "CHEBI_133814")], "src_id string, tgt_id string"
    )
    dis_doid = spark.createDataFrame(
        [("MESH_D000230", "DOID_3910"), ("MESH_D008107", "DOID_409")],
        "src_id string, tgt_id string",
    )
    out = apply_identifier_maps(
        edges, "0:mesh_chebi;1:disease_doid",
        {"mesh_chebi": mesh_chebi, "disease_doid": dis_doid},
    )
    assert [(r.sub_id, r.obj_id) for r in out.collect()] == [
        ("CHEBI_133814", "DOID_3910")
    ]


def test_build_edge_list_end_to_end(spark, gene_disease_tsv):
    cfg = parse_resource_info(RESOURCE_INFO)["gene-disease"]
    dis_doid = spark.createDataFrame(
        [("C0019209", "DOID_1234"), ("C0001418", "DOID_299")],
        "src_id string, tgt_id string",
    )
    out = build_edge_list(spark, cfg, gene_disease_tsv, {"disease_doid": dis_doid})
    rows = {(r.edge_type, r.sub_id, r.obj_id) for r in out.collect()}
    # score>=0.70 keeps rows (19,C0019209),(20,C0001418),(23,C0001418);
    # all three disease ids map
    assert rows == {
        ("gene-disease", "19", "DOID_1234"),
        ("gene-disease", "20", "DOID_299"),
        ("gene-disease", "23", "DOID_299"),
    }
    stats = edge_list_stats(out).collect()[0]
    assert (stats.n_edges, stats.n_subjects, stats.n_objects) == (3, 3, 2)


def test_explodes_data_reference_cases(spark):
    # hgnc fixture from the reference's test_data_utils_miscellaneous.py:55
    from pheknowlator_spark.operators.edge_list import explodes_data

    rows = [
        ("HGNC:5", "A1BG", "None"),
        ("HGNC:37133", "A1BG-AS1", "FLJ23569"),
        ("HGNC:24086", "A1CF", "ACF|ASP|ACF64|ACF65|APOBEC1CF"),
        ("HGNC:7", "A2M", "FWP007|S863-7|CPAMD5"),
        ("HGNC:27057", "A2M-AS1", ""),
    ]
    df = spark.createDataFrame(
        rows, "hgnc_id string, hgnc_symbols string, hgnc_synonyms string"
    )
    out = explodes_data(df, ["hgnc_synonyms"], "|")
    got = {(r.hgnc_id, r.hgnc_symbols, r.hgnc_synonyms) for r in out.collect()}
    # more rows than input, no packed cells remain, empty cell -> fill_value
    assert out.count() == 11 > len(rows)
    assert not any("|" in s for _, _, s in got)
    assert ("HGNC:24086", "A1CF", "ACF64") in got
    assert ("HGNC:27057", "A2M-AS1", "None") in got  # empty list row kept
    assert ("HGNC:5", "A1BG", "None") in got


def test_explodes_data_multi_column_recursion(spark):
    # two packed columns expanding to DIFFERENT lengths (the case the
    # reference's stack-recursion exists for): cross product per input row
    from pheknowlator_spark.operators.edge_list import explodes_data

    df = spark.createDataFrame(
        [("e1", "a|b", "x|y|z"), ("e2", "c", "")],
        "id string, lhs string, rhs string",
    )
    out = explodes_data(df, ["lhs", "rhs"], "|")
    got = {(r.id, r.lhs, r.rhs) for r in out.collect()}
    assert got == {
        ("e1", "a", "x"), ("e1", "a", "y"), ("e1", "a", "z"),
        ("e1", "b", "x"), ("e1", "b", "y"), ("e1", "b", "z"),
        ("e2", "c", "None"),
    }


def test_identifier_maps_packed_cells(spark):
    # F8 wiring: a mapping table whose tgt cells are '|'-packed must
    # fan out to ALL targets; without the explode the join under-emits
    edges = spark.createDataFrame(
        [("MESH_C1", "D1"), ("MESH_C2", "D2")], "sub_id string, obj_id string"
    )
    packed_map = spark.createDataFrame(
        [("MESH_C1", "CHEBI_1|CHEBI_2"), ("MESH_C2", "CHEBI_3")],
        "src_id string, tgt_id string",
    )
    out = apply_identifier_maps(
        edges, "0:m", {"m": packed_map}, map_delimiter="|"
    )
    got = {(r.sub_id, r.obj_id) for r in out.collect()}
    assert got == {("CHEBI_1", "D1"), ("CHEBI_2", "D1"), ("CHEBI_3", "D2")}


def test_filter_dedup_desc_int_min(spark):
    # desc keep-first on a bigint column containing INT64_MIN: naive
    # negation overflows (aborts under ANSI mode, silently wraps without),
    # ranking the minimum as the maximum; the widened-decimal negation
    # must keep the true max row and not throw
    df = spark.createDataFrame(
        [
            ("k1", -(1 << 63)),
            ("k1", 5),
            ("k1", 7),
            ("k2", -(1 << 63)),
        ],
        "key string, val long",
    )
    out = compile_criterion(df, "1-0;dedup;desc")
    got = {(r.key, r.val) for r in out.collect()}
    assert got == {("k1", 7), ("k2", -(1 << 63))}


def test_filter_dedup_desc_nan_last(spark):
    # NaN never wins desc keep-first (pandas sort_values NaN-last
    # semantics), and the real maximum is kept
    nan = float("nan")
    df = spark.createDataFrame(
        [("k1", nan), ("k1", 5.0), ("k1", 2.0), ("k2", nan)],
        "key string, val double",
    )
    out = compile_criterion(df, "1-0;dedup;desc")
    rows = {r.key: r.val for r in out.collect()}
    assert rows["k1"] == 5.0
    import math
    assert math.isnan(rows["k2"])  # all-NaN group still yields a row
