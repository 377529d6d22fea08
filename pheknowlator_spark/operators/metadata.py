"""Node-metadata operators (J8, P10, G6, G7, F5).

Metadata table contract (FIXTURES.md §9, mirrors the reference's pickled
node_metadata_dict, metadata.py:43-56)::

    uri: string, kind: 'nodes'|'relations', label: string?,
    description: string?, synonyms: array<string>
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pheknowlator_spark.functions.rdf import (
    OBOINOWL,
    RDFS_LABEL,
    literal_triple,
)

IAO_DEFINITION = "http://purl.obolibrary.org/obo/IAO_0000115"
HAS_SYNONYM = OBOINOWL + "hasExactSynonym"


def tidy_text(col):
    """F5: newline/extra-whitespace tidy (metadata.py:94-95)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(col, r"[\n\r]", " "), r"\s\s+", " ")
    )


def metadata_gate(
    edges: DataFrame,
    metadata: DataFrame,
    sub_uri: str = "n1_uri",
    obj_uri: str = "n2_uri",
    data_type_col: str = "data_type",
) -> DataFrame:
    """P10: admit an edge if node metadata exists per the type pattern —
    class-class edges always pass; any entity side requires metadata
    (meta-logic, knowledge_graph.py:336-339)."""
    meta_uris = metadata.select(F.col("uri")).distinct()
    flagged = (
        edges.join(
            F.broadcast(
                meta_uris.select(F.col("uri").alias(sub_uri), F.lit(True).alias("__s_m"))
            ),
            sub_uri,
            "left",
        )
        .join(
            F.broadcast(
                meta_uris.select(F.col("uri").alias(obj_uri), F.lit(True).alias("__o_m"))
            ),
            obj_uri,
            "left",
        )
    )
    parts = F.split(F.col(data_type_col), "-")
    sub_is_class = parts.getItem(0) == "class"
    obj_is_class = parts.getItem(1) == "class"
    keep = (sub_is_class | F.coalesce("__s_m", F.lit(False))) & (
        obj_is_class | F.coalesce("__o_m", F.lit(False))
    )
    return flagged.filter(keep).drop("__s_m", "__o_m")


def metadata_triples(nodes: DataFrame, metadata: DataFrame) -> DataFrame:
    """G6/J8: label/description/synonym annotation triples per node
    (creates_node_metadata, metadata.py:157-196).

    ``nodes``: one-column [uri] of nodes present in the graph. Broadcast
    join + explode of the synonym array.
    """
    m = nodes.select("uri").distinct().join(F.broadcast(metadata), "uri", "inner")
    label_t = m.filter(F.col("label").isNotNull()).select(
        literal_triple(F.col("uri"), RDFS_LABEL, tidy_text(F.col("label"))).alias("t")
    )
    desc_t = m.filter(F.col("description").isNotNull()).select(
        literal_triple(
            F.col("uri"), IAO_DEFINITION, tidy_text(F.col("description"))
        ).alias("t")
    )
    syn_t = (
        m.filter(F.size(F.coalesce("synonyms", F.array())) > 0)
        .select("uri", F.explode("synonyms").alias("syn"))
        .select(
            literal_triple(F.col("uri"), HAS_SYNONYM, tidy_text(F.col("syn"))).alias(
                "t"
            )
        )
    )
    return label_t.unionByName(desc_t).unionByName(syn_t).select("t.*").distinct()


def ontology_header(
    spark,
    ontology_uri: str,
    version: str,
    description: str = "PheKnowLator-semantics knowledge graph",
) -> DataFrame:
    """G7: provenance header triples (adds_ontology_annotations,
    metadata.py:198-233)."""
    from pheknowlator_spark.functions.rdf import (
        OWL_ONTOLOGY,
        RDF_TYPE,
    )

    owl = "http://www.w3.org/2002/07/owl#"
    rows = [
        (ontology_uri, RDF_TYPE, OWL_ONTOLOGY, False, None, None),
        (ontology_uri, owl + "versionInfo", version, True, None, None),
        (
            ontology_uri,
            "http://purl.org/dc/elements/1.1/description",
            description,
            True,
            None,
            None,
        ),
    ]
    return spark.createDataFrame(
        rows,
        "s string, p string, o string, o_is_literal boolean, "
        "o_lang string, o_datatype string",
    )
