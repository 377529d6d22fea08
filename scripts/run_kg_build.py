"""Build-matrix CLI — the Spark-first twin of the reference's ``Main.py``
(Main.py:17-116): one argparse entry that reads a ``resource_info.txt``
config, derives edge lists from prestaged edge-data files, and runs any of
the 8 build flavors {subclass,instance} x {relationsOnly,inverseRelations}
x {OWL,noOWL} (builds/README.md:124-134) for build types partial / full /
post-closure, writing the reference's output-file contract with the
reference's naming convention (knowledge_graph.py:140:
``PheKnowLator_<version>_<build>_<approach>_<rel>_<owl>``).

Differences from the reference by design (SURVEY §2.1/§3): downloads
(S1-S5) are out of scope — ontologies arrive as parsed RDF/XML (.owl) or
N-Triples (.nt) files; OWLTools merge/pretty-print are replaced by
DataFrame set-union; ray-actor sharding is replaced by Spark partitioning.
Every stage is a StageStore commit, so re-running with the same --out
resumes from the last committed stage.

Usage (mirrors Main.py flags):
  python scripts/run_kg_build.py \
    --res tests/data/resource_info.txt --edg tests/data/edge_data \
    --onts tests/data/ontologies --maps tests/data \
    --rel-data tests/data --app subclass --kg full --rel yes --owl yes \
    --nde yes --out /tmp/kg_build
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

EDGE_SCHEMA = (
    "edge_type string, n1_kind string, n2_kind string, sub_id string, "
    "obj_id string, uri1 string, uri2 string, rel string, inv_rel string"
)


def yes_no(v: str) -> bool:
    v = str(v).lower()
    if v not in ("yes", "no"):
        raise argparse.ArgumentTypeError('expected "yes" or "no"')
    return v == "yes"


def kg_filename(kg_version: str, build: str, approach: str,
                inverse_relations: bool, decode_owl: bool) -> str:
    """Reference naming (knowledge_graph.py:140): PheKnowLator_<version>_
    <build>_<approach>_<inverseRelations|relationsOnly>_<noOWL|OWL>."""
    rel = "inverseRelations" if inverse_relations else "relationsOnly"
    owl = "noOWL" if decode_owl else "OWL"
    return f"PheKnowLator_{kg_version}_{build}_{approach}_{rel}_{owl}"


def load_ontologies(spark: SparkSession, ont_dir: str) -> list[DataFrame]:
    """Parse every .owl (RDF/XML) and .nt file in the ontology dir into
    triple tables (reference: Graph().parse per ontology,
    knowledge_graph.py:384-388; merge is DataFrame union downstream)."""
    from pheknowlator_spark.sources.rdfxml import read_rdfxml
    from pheknowlator_spark.sources.sinks import read_ntriples

    parts: list[DataFrame] = []
    for p in sorted(glob.glob(os.path.join(ont_dir, "*.owl"))):
        parts.append(read_rdfxml(spark, p))
    for p in sorted(glob.glob(os.path.join(ont_dir, "*.nt"))):
        parts.append(read_ntriples(spark, p))
    if not parts:
        raise SystemExit(f"no .owl/.nt ontologies found in {ont_dir}")
    return parts


def load_subclass_map(spark: SparkSession, path: str | None) -> DataFrame | None:
    """Subclass construction map (construction_approaches.py:63-79):
    accepts the reference's pickled dict {entity: {class,...}} or a 2-col
    TSV ``entity_id<TAB>class_id`` → exploded dimension DataFrame."""
    if not path:
        return None
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            d = pickle.load(f)
        rows = [
            (str(k), str(c))
            for k, v in d.items()
            for c in (v if isinstance(v, (set, list, tuple)) else [v])
        ]
    else:
        with open(path) as f:
            rows = [
                tuple(ln.rstrip("\n").split("\t")[:2])
                for ln in f
                if "\t" in ln
            ]
    if not rows:
        return None
    return spark.createDataFrame(rows, "entity_id string, class_id string")


def derive_master_edges(
    spark: SparkSession,
    res_path: str,
    edge_dir: str,
    maps_dir: str | None,
    out_dir: str,
    map_delimiter: str | None = None,
) -> tuple[DataFrame, dict]:
    """CreatesEdgeList parity (edge_list.py:387-418): per config row, find
    its prestaged data file (``<edge_type>_*`` naming, downloads.py:335-365
    rename convention), run the scan→filter→reduce→relabel→map pipeline,
    and union into one tall edge table. Identifier-map paths in the config
    are re-anchored by basename into ``maps_dir``."""
    from pheknowlator_spark.operators.edge_list import (
        build_edge_list,
        parse_resource_info,
    )

    with open(res_path) as f:
        configs = parse_resource_info(f.read())

    all_edges: DataFrame | None = None
    built: dict = {}
    for etype, cfg in configs.items():
        matches = sorted(glob.glob(os.path.join(edge_dir, f"{etype}_*")))
        if not matches:
            print(f"SKIP  {etype}: no data file {etype}_* in {edge_dir}")
            continue
        maps: dict[str, DataFrame] = {}
        if cfg.identifier_maps not in ("None", ""):
            fixed = []
            for part in cfg.identifier_maps.split(";"):
                col, mpath = part.split(":", 1)
                base = os.path.basename(mpath)
                local = os.path.join(maps_dir or edge_dir, base)
                if not os.path.exists(local):
                    raise SystemExit(
                        f"{etype}: identifier map {base} not found in "
                        f"{maps_dir or edge_dir}"
                    )
                fixed.append(f"{col}:{base}")
                maps[base] = spark.read.csv(local, sep="\t").toDF(
                    "src_id", "tgt_id"
                )
            cfg.identifier_maps = ";".join(fixed)
        df = build_edge_list(
            spark, cfg, matches[0], maps, map_delimiter=map_delimiter
        )
        n1_kind, n2_kind = cfg.data_type.split("-")
        kinds = df.select(
            "edge_type",
            F.lit(n1_kind).alias("n1_kind"),
            F.lit(n2_kind).alias("n2_kind"),
            "sub_id",
            "obj_id",
            F.lit(cfg.uri[0]).alias("uri1"),
            F.lit(cfg.uri[1]).alias("uri2"),
            F.lit(cfg.edge_relation).alias("rel"),
            F.lit(None).cast("string").alias("inv_rel"),
        )
        all_edges = kinds if all_edges is None else all_edges.unionByName(kinds)
        built[etype] = cfg
        print(f"BUILT {etype}: {matches[0]}")

    if all_edges is None:
        all_edges = spark.createDataFrame([], EDGE_SCHEMA)

    # materialize the master edge table (parquet = the scale path); the
    # reference's Master_Edge_List_Dict.json shape is emitted alongside for
    # fixture-scale interop (guarded like sinks' 5M id-map JSON)
    master_dir = os.path.join(out_dir, "Master_Edge_List")
    all_edges.write.mode("overwrite").parquet(master_dir)
    n = all_edges.count()
    if n <= 5_000_000:
        d = {}
        rows = all_edges.select("edge_type", "sub_id", "obj_id").collect()
        for etype, cfg in built.items():
            d[etype] = {
                "source_labels": cfg.source_labels,
                "data_type": cfg.data_type,
                "edge_relation": cfg.edge_relation,
                "uri": list(cfg.uri),
                "delimiter": cfg.delimiter,
                "column_idx": cfg.column_idx,
                "identifier_maps": cfg.identifier_maps,
                "evidence_criteria": cfg.evidence_criteria,
                "filter_criteria": cfg.filter_criteria,
                "edge_list": sorted(
                    [r.sub_id, r.obj_id] for r in rows if r.edge_type == etype
                ),
            }
        with open(os.path.join(out_dir, "Master_Edge_List_Dict.json"), "w") as f:
            json.dump(d, f, indent=1, sort_keys=True)
    return all_edges, built


def write_outputs(out: dict, kg_dir: str, name: str, decode_owl: bool) -> None:
    """The reference's output-file contract
    (tests/test_knowledge_graph_full.py:138-189): LogicOnly / Annotations-
    Only / full .nt, integer triples + identifier map, NodeLabels, property
    graph, plus OWLNETS decode output when requested."""
    from pheknowlator_spark.sources.sinks import (
        export_property_graph,
        write_integer_triples,
        write_node_labels,
        write_ntriples,
    )

    os.makedirs(kg_dir, exist_ok=True)
    full_key = "partial_graph" if "partial_graph" in out else "full_graph"
    graph = out[full_key]

    write_ntriples(
        out["annotation_subset"], os.path.join(kg_dir, f"{name}_AnnotationsOnly.nt")
    )
    logic_key = (
        "logic_with_edges" if "logic_with_edges" in out else None
    )
    if logic_key:
        logic = out[logic_key]
    else:
        logic = (
            out["logic_subset"]
            .select("s", "p", "o", "o_is_literal", "o_lang", "o_datatype")
            .unionByName(out["constructed_edges"])
            .distinct()
        )
    write_ntriples(logic, os.path.join(kg_dir, f"{name}_LogicOnly.nt"))
    write_ntriples(graph, os.path.join(kg_dir, f"{name}.nt"))

    uri_triples = (
        graph.filter(~F.col("o_is_literal"))
        if "o_is_literal" in graph.columns
        else graph
    )
    id_map = write_integer_triples(uri_triples, kg_dir)
    if "metadata" in out:
        write_node_labels(
            out["metadata"], id_map, os.path.join(kg_dir, "NodeLabels.txt")
        )
    nodes, pg_edges = export_property_graph(graph)
    nodes.write.mode("overwrite").parquet(
        os.path.join(kg_dir, "PropertyGraph_Nodes")
    )
    pg_edges.write.mode("overwrite").parquet(
        os.path.join(kg_dir, "PropertyGraph_Edges")
    )
    if decode_owl and "owlnets" in out:
        owlnets = out["owlnets"].select(
            "s", "p", "o",
            F.lit(False).alias("o_is_literal"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("o_datatype"),
        )
        write_ntriples(owlnets, os.path.join(kg_dir, f"{name}_OWLNETS.nt"))


def run(args) -> dict:
    from pheknowlator_spark.plans.checkpoint import StageStore
    from pheknowlator_spark.plans.full_build import (
        full_build,
        load_relation_maps,
        partial_build,
        post_closure_build,
    )
    from pheknowlator_spark.session import get_spark
    from pheknowlator_spark.sources.rdfxml import read_rdfxml
    from pheknowlator_spark.sources.sinks import read_ntriples

    spark = args.spark or get_spark(app_name="run_kg_build")
    os.makedirs(args.out, exist_ok=True)

    edges, _built = derive_master_edges(
        spark, args.res, args.edg, args.maps, args.out,
        map_delimiter=args.map_delimiter,
    )

    inverse = None
    if args.rel:
        inv_path = os.path.join(args.rel_data, "INVERSE_RELATIONS.txt")
        lbl_path = os.path.join(args.rel_data, "RELATIONS_LABELS.txt")
        inverse, _labels = load_relation_maps(spark, inv_path, lbl_path)

    subclass_map = load_subclass_map(spark, args.sub)
    store = StageStore(spark, os.path.join(args.out, "stages"),
                       format=args.format)
    # reference build token: gets_build_type().lower().split()[0] →
    # 'partial' / 'full' / 'post-closure' (knowledge_graph.py:78)
    name = kg_filename(args.kg_version, args.kg, args.app, args.rel, args.owl)

    if args.kg == "partial":
        out = partial_build(
            spark, store, load_ontologies(spark, args.onts), edges,
            subclass_map=subclass_map, inverse_relations=inverse,
            approach=args.app,
        )
    elif args.kg == "post-closure":
        closed = (
            read_ntriples(spark, args.closed)
            if args.closed.endswith(".nt")
            else read_rdfxml(spark, args.closed)
        )
        out = post_closure_build(
            spark, store, closed,
            approach=args.app, decode_owl=args.owl,
            filename=name + ".owl", kg_version=args.kg_version,
        )
    else:
        out = full_build(
            spark, store, load_ontologies(spark, args.onts), edges,
            subclass_map=subclass_map, inverse_relations=inverse,
            approach=args.app, decode_owl=args.owl,
            filename=name + ".owl", kg_version=args.kg_version,
        )

    write_outputs(out, args.out, name, args.owl)
    manifest = store.manifest()
    print(json.dumps({"name": name, "stages": manifest["stages"]}))
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="PySpark-native PheKnowLator build matrix "
        "(reference Main.py parity; downloads prestaged per SURVEY §2.1)"
    )
    p.add_argument("--res", required=True, help="resource_info.txt path")
    p.add_argument("--edg", required=True,
                   help="dir of prestaged edge-data files (<edge_type>_*)")
    p.add_argument("--onts", help="dir of parsed ontology .owl/.nt files")
    p.add_argument("--maps", help="dir holding identifier-map TSVs "
                                  "(config paths re-anchored by basename)")
    p.add_argument("--rel-data", help="dir with INVERSE_RELATIONS.txt / "
                                      "RELATIONS_LABELS.txt")
    p.add_argument("--sub", help="subclass construction map (.pkl dict or "
                                 "2-col TSV)")
    p.add_argument("--app", required=True, choices=["subclass", "instance"])
    p.add_argument("--kg", required=True,
                   choices=["partial", "full", "post-closure"])
    p.add_argument("--rel", required=True, type=yes_no,
                   help="yes/no: add inverse relations")
    p.add_argument("--owl", required=True, type=yes_no,
                   help="yes/no: decode OWL semantics (OWL-NETS)")
    p.add_argument("--nde", type=yes_no, default=True,
                   help="yes/no: node metadata (harvested from the merged "
                        "ontology; kept for Main.py flag parity)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--closed", help="reasoner-closed graph for post-closure")
    p.add_argument("--kg-version", default="v3.1.2")
    p.add_argument("--map-delimiter", default=None,
                   help="delimiter of packed multi-target mapping cells")
    p.add_argument("--format", default="parquet",
                   help="StageStore DataSource (parquet|orc|iceberg)")
    p.set_defaults(spark=None)
    return p


def main() -> None:
    parser = build_parser()
    args = parser.parse_args()
    # conditionally-required args: fail fast with a usage message instead
    # of a mid-build TypeError/AttributeError on a None path
    if args.kg == "post-closure" and not args.closed:
        parser.error("--closed is required for --kg post-closure")
    if args.kg != "post-closure" and not args.onts:
        parser.error("--onts is required for partial/full builds")
    if args.rel and not args.rel_data:
        parser.error("--rel yes requires --rel-data")
    run(args)


if __name__ == "__main__":
    main()
