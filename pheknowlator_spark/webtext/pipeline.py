"""End-to-end webtext → KG pipeline (SURVEY §7.0 stages [1]-[6]).

pages → extract → mention-detect → link → canonicalize → co-mention edge
derivation → instance/subclass triple construction. Each stage is a pure
DataFrame→DataFrame function; ``plans.checkpoint`` wraps them into
idempotent, resumable stage writes with lineage.

Edge derivation (stage [5]): co-mentioned entity pairs within a page are
scored by pair frequency across the corpus; pairs at/above ``min_score``
become typed edges. Edge type = ontology-namespace pair (e.g. CHEBI+DOID →
'chemical-disease'), relation from a small config map — replacing the
reference's downloaded edge sources with corpus-derived evidence while
reusing its construction semantics downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pheknowlator_spark.functions.rdf import OBO
from pheknowlator_spark.operators.constructors import construct_edges
from pheknowlator_spark.webtext.canonicalize import build_canonical_map
from pheknowlator_spark.webtext.linking import link_mentions, score_mentions
from pheknowlator_spark.webtext.mentions import detect_mentions

# namespace-pair → (edge_type, relation CURIE, inverse or None)
DEFAULT_EDGE_TYPES = {
    ("CHEBI", "DOID"): ("chemical-disease", "RO_0002606", None),
    ("CHEBI", "PR"): ("chemical-protein", "RO_0002434", "RO_0002434"),
    ("PR", "DOID"): ("protein-disease", "RO_0003302", None),
    ("PR", "HP"): ("protein-phenotype", "RO_0003302", None),
    ("CHEBI", "HP"): ("chemical-phenotype", "RO_0002606", None),
    ("DOID", "HP"): ("disease-phenotype", "RO_0002200", "RO_0004029"),
}


def curie_namespace(col):
    return F.split(col, "_").getItem(0)


def derive_comention_edges(
    linked: DataFrame,
    edge_type_map: dict[tuple[str, str], tuple[str, str, str | None]] | None = None,
    min_pages: int = 1,
) -> DataFrame:
    """Stage [5]: per-page co-mentions → scored, typed edge rows.

    ``linked``: [url, curie, ...] one row per linked mention. Pair
    generation is a self-join per url on distinct (url, curie) — quadratic
    only within a page (bounded by mentions-per-page, not corpus size), with
    the canonical direction fixed by the namespace pair so each undirected
    pair appears once.
    """
    edge_type_map = edge_type_map or DEFAULT_EDGE_TYPES
    # consumed twice (both sides of the pair self-join) — eager persist so
    # the mention-detection pipeline upstream runs exactly once (lazy
    # persists race when both join sides evaluate concurrently)
    page_entities = linked.select("url", "curie").distinct().persist()
    page_entities.count()
    a = page_entities.select("url", F.col("curie").alias("c1"))
    b = page_entities.select("url", F.col("curie").alias("c2"))
    pairs = a.join(b, "url").filter(F.col("c1") < F.col("c2"))

    ns1, ns2 = curie_namespace(F.col("c1")), curie_namespace(F.col("c2"))
    # build the CASE mapping both (ns1,ns2) and (ns2,ns1)
    et = F.lit(None).cast("string")
    rel = F.lit(None).cast("string")
    inv = F.lit(None).cast("string")
    swap = F.lit(False)
    for (x, y), (etype, r, i) in edge_type_map.items():
        fwd = (ns1 == x) & (ns2 == y)
        bwd = (ns1 == y) & (ns2 == x) & F.lit(x != y)
        et = F.when(fwd | bwd, etype).otherwise(et)
        rel = F.when(fwd | bwd, r).otherwise(rel)
        inv = F.when(fwd | bwd, F.lit(i).cast("string")).otherwise(inv)
        swap = F.when(bwd, F.lit(True)).otherwise(swap)

    typed = (
        pairs.withColumn("edge_type", et)
        .withColumn("rel", rel)
        .withColumn("inv_rel", inv)
        .withColumn("__swap", swap)
        .filter(F.col("edge_type").isNotNull())
        .select(
            "edge_type",
            F.when(F.col("__swap"), F.col("c2")).otherwise(F.col("c1")).alias("sub_id"),
            F.when(F.col("__swap"), F.col("c1")).otherwise(F.col("c2")).alias("obj_id"),
            "rel",
            "inv_rel",
            "url",
        )
    )
    scored = typed.groupBy("edge_type", "sub_id", "obj_id", "rel", "inv_rel").agg(
        F.countDistinct("url").alias("n_pages")
    )
    return scored.filter(F.col("n_pages") >= min_pages)


def edges_for_construction(comention_edges: DataFrame) -> DataFrame:
    """Adapt scored co-mention edges to the constructor input contract.

    All CURIEs here are ontology classes (they came from the ontology
    dictionary), so both sides are kind='class' with the OBO namespace.
    """
    return comention_edges.select(
        "edge_type",
        F.lit("class").alias("n1_kind"),
        F.lit("class").alias("n2_kind"),
        "sub_id",
        "obj_id",
        F.lit(OBO).alias("uri1"),
        F.lit(OBO).alias("uri2"),
        "rel",
        "inv_rel",
    )


def run_pipeline(
    pages: DataFrame,
    entity_dictionary: DataFrame,
    same_as: DataFrame | None = None,
    approach: str = "subclass",
    min_pages: int = 1,
    lang: str = "en",
    re_extract: bool = False,
    quality_threshold: float | None = None,
    materialize: bool = False,
) -> dict[str, DataFrame]:
    """Full stages [1]-[6]; returns every intermediate for checkpointing.

    ``pages`` must carry (url, html, text, lang); when ``re_extract`` the
    text column is recomputed from html (byte-identity contract).
    ``quality_threshold`` adds the corpus quality-filter stage (JVM-side
    expression scoring). ``materialize`` forces each persisted stage
    boundary eagerly — lazy persists shared by several consumers inside
    one job can be computed redundantly by concurrent subtrees; production
    runs materialize through plans.StageStore instead.
    """
    pages_en = pages.filter(F.col("lang") == lang)
    if re_extract:
        # fused extract → quality → scan: one Arrow crossing (see
        # mentions.extract_and_detect for the scaling rationale)
        from pheknowlator_spark.webtext.mentions import extract_and_detect

        mentions = extract_and_detect(
            pages_en, entity_dictionary, min_quality=quality_threshold
        )
    else:
        if quality_threshold is not None:
            from pheknowlator_spark.functions.text import quality_score

            pages_en = pages_en.filter(
                quality_score(F.col("text")) >= quality_threshold
            )
        mentions = detect_mentions(pages_en, entity_dictionary)
    linked = score_mentions(mentions)
    if materialize:
        linked = linked.persist()
        linked.count()
    if same_as is not None:
        canonical_map = build_canonical_map(same_as)
        linked = link_mentions(linked, canonical_map)
    else:
        canonical_map = None

    comentions = derive_comention_edges(linked, min_pages=min_pages)
    edges = edges_for_construction(comentions)
    triples, errors = construct_edges(edges, approach=approach)

    out = {
        "mentions": mentions,
        "linked": linked,
        "comention_edges": comentions,
        "triples": triples.distinct(),
        "construction_errors": errors,
    }
    if canonical_map is not None:
        out["canonical_map"] = canonical_map
    return out
