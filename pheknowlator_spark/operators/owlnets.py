"""OWL-NETS abstraction decoding (N1-N12).

Re-expresses the reference's OWL-NETS 2.0 algorithm
(pkt_kg/owlnets.py:321-713) over the triple DataFrame:

1. **Root selection (N1)** — decode roots are all non-anonymous owl:Class
   subjects plus qualifying owl:Axiom nodes (annotatedSource/Target typed
   as Class, owlnets.py:793-799). Pure filters/joins.
2. **BNode-forest assignment (J7)** — every anonymous node is attached to
   the root(s) that reach it, by iterative frontier-expansion joins
   (bounded by OWL class-expression depth, ≤ ~10 rounds).
3. **Per-root decode (N2-N8)** — each root's forest is a few dozen triples;
   groups are processed with ``applyInPandas`` running the recursive
   decode: subClassOf hops, union/intersection rdf:List walks, restriction
   decoding, PATO property-selection, negation/complementOf gates,
   cardinality capture, and duplicate-predicate resolution (A10). This is
   the one genuinely irregular tree-walk in the engine — vectorization
   buys nothing per tree, so batching whole forests per Arrow group is the
   right shape.
4. **Assembly (N9/N12)** — decoded triples union the plain filtered graph
   (owl_filters.filter_owl_semantics), then connectivity repair (N10) and
   optional purification (N11) via the cached subclass transitive closure.

Decode-status rows (negation / complementOf / misc / cardinality) land in a
lineage-style DataFrame instead of the reference's ``owl_nets_dict``.

BNodes are strings prefixed ``_:`` or ``bnode:``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pheknowlator_spark.functions.rdf import (
    OBO,
    OWL_AXIOM,
    OWL_CLASS,
    RDF_TYPE,
    RDFS_SUBCLASSOF,
)
from pheknowlator_spark.operators.graph_algos import (
    _cut_lineage,
    transitive_closure,
)
from pheknowlator_spark.operators.owl_filters import (
    clean_decoded_graph,
    filter_owl_semantics,
    remove_disjoint_with,
)
from pheknowlator_spark.operators.stats import mode_per_group

OWL_NS = "http://www.w3.org/2002/07/owl#"
RO_0000086 = OBO + "RO_0000086"
BFO_ROOT = OBO + "BFO_0000001"

DECODED_SCHEMA = "root string, s string, p string, o string"
STATUS_SCHEMA = "root string, status string, detail string"


def _is_bnode_str(x: str) -> bool:
    return isinstance(x, str) and (x.startswith("_:") or x.startswith("bnode:"))


def _bnode_col(col):
    return col.startswith("_:") | col.startswith("bnode:")


# ---------------------------------------------------------------------------
# N1: decode roots
# ---------------------------------------------------------------------------

def decode_roots(triples: DataFrame) -> DataFrame:
    """owl:Class URIs + qualifying owl:Axiom nodes (owlnets.py:793-799)."""
    classes = (
        triples.filter(
            (F.col("p") == RDF_TYPE)
            & (F.col("o") == OWL_CLASS)
            & (~_bnode_col(F.col("s")))
        )
        .select(F.col("s").alias("root"))
        .distinct()
    )
    axioms = (
        triples.filter((F.col("p") == RDF_TYPE) & (F.col("o") == OWL_AXIOM))
        .select(F.col("s").alias("axiom"))
        .distinct()
    )
    src = triples.filter(F.col("p") == OWL_NS + "annotatedSource").select(
        F.col("s").alias("axiom"), F.col("o").alias("src")
    )
    tgt = triples.filter(F.col("p") == OWL_NS + "annotatedTarget").select(
        F.col("s").alias("axiom"), F.col("o").alias("tgt")
    )
    # one aggregated flag dim (node → is-Class, has-any-type) joined on
    # src and tgt — replaces four separate typed-node dims/joins with two
    # joins over one shared broadcast subtree
    type_flags = (
        triples.filter(F.col("p") == RDF_TYPE)
        .groupBy(F.col("s").alias("node"))
        .agg(F.max((F.col("o") == OWL_CLASS).cast("int")).alias("__cls"))
        .withColumn("__typed", F.lit(True))
    )
    ax = (
        axioms.join(src, "axiom", "left")
        .join(tgt, "axiom", "left")
        .join(
            type_flags.select(
                F.col("node").alias("src"),
                (F.col("__cls") == 1).alias("src_cls"),
                F.col("__typed").alias("src_typed"),
            ),
            "src",
            "left",
        )
        .join(
            type_flags.select(
                F.col("node").alias("tgt"),
                (F.col("__cls") == 1).alias("tgt_cls"),
                F.col("__typed").alias("tgt_typed"),
            ),
            "tgt",
            "left",
        )
    )
    src_cls = F.coalesce("src_cls", F.lit(False))
    tgt_cls = F.coalesce("tgt_cls", F.lit(False))
    src_typed = F.coalesce("src_typed", F.lit(False))
    tgt_typed = F.coalesce("tgt_typed", F.lit(False))
    qualifying = ax.filter(
        (src_cls & tgt_cls) | (src_cls & ~tgt_typed) | (tgt_cls & ~src_typed)
    ).select(F.col("axiom").alias("root"))
    return classes.unionByName(qualifying).distinct()


# ---------------------------------------------------------------------------
# J7: BNode-forest assignment
# ---------------------------------------------------------------------------

def assign_forests(triples: DataFrame, roots: DataFrame, max_depth: int = 12) -> DataFrame:
    """Attach to each root every triple reachable from it through anonymous
    nodes (reconciles_classes / recurses_axioms, owlnets.py:227-319).

    Returns ``[root, s, p, o, o_is_literal]`` — the per-root forest,
    including the root's own out-edges. Frontier expansion is a join per
    OWL-expression depth level; forests are tiny (≤ dozens of triples), the
    number of roots is what parallelizes.
    """
    t = triples.select("s", "p", "o", "o_is_literal")
    # cut once: the base feeds both the accumulator and the first frontier
    root_edges = _cut_lineage(
        roots.join(t, roots.root == t.s, "inner").select(
            "root", "s", "p", "o", "o_is_literal"
        )
    )
    # accumulate LAZY per-level deltas and distinct ONCE at the end — the
    # old shape re-checkpointed the whole accumulated forest every level
    # (O(depth²) re-materialization; at tiny forest depth the per-level
    # job overhead dominated the entire decode)
    acc_parts = [root_edges]
    out_cols = ["root", "s", "p", "o", "o_is_literal"]
    # frontier: anonymous objects not yet expanded per root (lazy — one
    # filter/distinct over the checkpointed base)
    frontier = (
        root_edges.filter(_bnode_col(F.col("o")))
        .select("root", F.col("o").alias("node"))
        .distinct()
    )
    visited = frontier
    for _ in range(max_depth):
        # ONE lineage cut per level (reliable-checkpoint aware — executor
        # loss mid-walk on a real cluster must not recompute the whole
        # frontier chain): the checkpointed delta carries the expanded
        # triples AND a ``__new`` frontier flag (bnode object not yet
        # visited, via one left join against the union of prior deltas'
        # frontier rows) — the former second cut per level for the
        # frontier alone doubled the per-level job count while t was
        # still scanned exactly once per level either way
        # visited is exact (disjoint unions of per-level distincts) — no
        # dedup needed before the flag join
        seen = visited.select(
            "root", F.col("node").alias("o"), F.lit(True).alias("__seen")
        )
        delta = _cut_lineage(
            frontier.join(t, frontier.node == t.s, "inner")
            .select("root", "s", "p", "o", "o_is_literal")
            .join(seen, ["root", "o"], "left")
            .select(
                *out_cols,
                (
                    _bnode_col(F.col("o")) & F.col("__seen").isNull()
                ).alias("__new"),
            )
        )
        # ONE emptiness probe per level: no flagged rows covers both the
        # empty-delta and the exhausted-frontier case (an empty delta
        # union part downstream is free)
        acc_parts.append(delta.select(*out_cols))
        new_frontier = (
            delta.filter(F.col("__new"))
            .select("root", F.col("o").alias("node"))
            .distinct()
        )
        if new_frontier.isEmpty():
            break
        # successive frontiers are disjoint by the ``__new`` flag — plain
        # union keeps the visited set exact with no distinct shuffle
        visited = visited.unionByName(new_frontier)
        frontier = new_frontier
    acc = acc_parts[0]
    for part in acc_parts[1:]:
        acc = acc.unionByName(part)
    return acc.distinct()


# ---------------------------------------------------------------------------
# N2-N8: per-root decode (Python over grouped forests)
# ---------------------------------------------------------------------------

def _decode_forest(root: str, rows: list[tuple[str, str, str, bool]]):
    """Decode one root's forest. Returns (triples, status) where triples is
    a list of (s,p,o) and status a list of (status, detail).

    Faithful re-derivation of cleans_owl_encoded_entities
    (owlnets.py:621-671) over string triples.
    """
    out_triples: list[tuple[str, str, str]] = []
    status: list[tuple[str, str]] = []

    by_subject: dict[str, list[tuple[str, str, bool]]] = {}
    for s, p, o, o_lit in rows:
        by_subject.setdefault(s, []).append((p, o, bool(o_lit)))

    def local(p_uri: str) -> str:
        return p_uri.split("#")[-1]

    node = root
    root_types = {o for p, o, _ in by_subject.get(root, []) if p == RDF_TYPE}

    # --- axiom reconciliation (owlnets.py:346-352)
    if OWL_AXIOM in root_types:
        src = [o for p, o, _ in by_subject.get(root, []) if p == OWL_NS + "annotatedSource"]
        tgt = [o for p, o, _ in by_subject.get(root, []) if p == OWL_NS + "annotatedTarget"]
        tgt_lit = [
            lit for p, o, lit in by_subject.get(root, [])
            if p in (OWL_NS + "annotatedSource", OWL_NS + "annotatedTarget") and lit
        ]
        if not src or not tgt or tgt_lit:
            return out_triples, status
        src, tgt = src[0], tgt[0]
        if not _is_bnode_str(src) and not _is_bnode_str(tgt):
            out_triples.append((src, RDFS_SUBCLASSOF, tgt))
            return out_triples, [("decoded", "axiom-direct")]

        def find_uri(n1, n2):
            # finds_uri (owlnets.py:251-268): first reachable owl:Class URI
            seen, queue = set(), [n1]
            while queue:
                x = queue.pop(0)
                if x in seen:
                    continue
                seen.add(x)
                if not _is_bnode_str(x) and x != n2:
                    x_types = {o for p, o, _ in by_subject.get(x, []) if p == RDF_TYPE}
                    if OWL_CLASS in x_types:
                        return x
                for p, o, lit in by_subject.get(x, []):
                    if not lit and o != n2 and o not in seen:
                        queue.append(o)
            return n1

        node = src if not _is_bnode_str(src) else find_uri(src, tgt)

    # --- edge dictionary (owlnets.py:321-361): bnode → {local(p): o}
    edge_dict: dict[str, dict[str, str]] = {}
    cardinality = []
    forest_triples = sorted(
        (s, p, o) for s, rest in by_subject.items() for (p, o, _l) in rest
    )
    for s, p, o in forest_triples:
        if "cardinality" in p.lower():
            cardinality.append(s)
            continue
        edge_dict.setdefault(s, {})[local(p)] = o
    if cardinality:
        status.append(("cardinality", ";".join(sorted(set(cardinality)))))

    bnode_dict = {k: v for k, v in edge_dict.items() if _is_bnode_str(k)}
    if not bnode_dict and OWL_AXIOM not in root_types:
        return out_triples, status

    # --- negation / complementOf gates (owlnets.py:387-424)
    for v in bnode_dict.values():
        prop = v.get("onProperty", "")
        if any(t in prop.lower() for t in ("lacks_", "not_")):
            status.append(("negation", prop))
            return [], status
    for v in bnode_dict.values():
        if "complementOf" in v:
            status.append(("complementOf", v["complementOf"]))
            return [], status

    def returns_object_property(sub, obj, prop):
        # owlnets.py:426-451
        if prop is not None and str(prop).lower() == "none":
            prop = None
        if "PATO" in sub and "PATO" in obj and prop is None:
            return RDFS_SUBCLASSOF
        if "PATO" not in sub and "PATO" in obj:
            return RO_0000086
        if prop is not None:
            return prop
        return RDFS_SUBCLASSOF

    def parses_anonymous_axioms(edges):
        # owlnets.py:454-472
        first, rest = edges.get("first"), edges.get("rest")
        if not _is_bnode_str(first) and _is_bnode_str(rest):
            return dict(edge_dict.get(rest, {}))
        if not _is_bnode_str(first) and not _is_bnode_str(rest):
            return dict(edge_dict.get(first, {}))
        if _is_bnode_str(first) and not _is_bnode_str(rest):
            return dict(edge_dict.get(first, {}))
        return {**edge_dict.get(first, {}), **edge_dict.get(rest, {})}

    cleaned: set[tuple[str, str, str]] = set()

    def parses_constructors(edges, relation=None):
        # owlnets.py:501-540
        if "unionOf" in edges:
            batch = dict(edge_dict.get(edges["unionOf"], {}))
            keyword = "union"
        elif "intersectionOf" in edges:
            batch = dict(edge_dict.get(edges["intersectionOf"], {}))
            keyword = "intersection"
        else:
            batch, keyword = dict(edges), "other"
        local_cleaned = set()
        while batch:
            if "first" in batch and "rest" in batch and "type" not in batch:
                first, rest = batch["first"], batch["rest"]
                if not _is_bnode_str(first) and _is_bnode_str(rest):
                    prop = returns_object_property(node, first, relation)
                    if node != first:
                        if keyword == "union":
                            local_cleaned.add((first, prop, node))
                        else:
                            local_cleaned.add((node, prop, first))
                        batch = dict(edge_dict.get(rest, {}))
                    else:
                        batch = dict(edge_dict.get(rest, {}))
                elif not _is_bnode_str(first) and not _is_bnode_str(rest):
                    prop = returns_object_property(node, first, relation)
                    if keyword == "union":
                        local_cleaned.add((first, prop, node))
                    else:
                        local_cleaned.add((node, prop, first))
                    batch = None
                else:
                    batch = parses_anonymous_axioms(batch)
            else:
                break
        return local_cleaned, batch

    def parses_restrictions(edges):
        # owlnets.py:542-589
        prop_types = ["allValuesFrom", "someValuesFrom", "hasSelf", "hasValue", "onClass"]
        components = ["type", "first", "rest", "onProperty"]
        object_type = [k for k in edges if k not in components and k in prop_types]
        if not object_type:
            return None
        ot = object_type[0]
        target = edges[ot]
        local_cleaned = set()
        if not _is_bnode_str(target):
            object_node = node if ot == "hasSelf" else target
            local_cleaned.add((node, edges["onProperty"], object_node))
            if len(edges) == 3:
                return local_cleaned, None
            return local_cleaned, parses_anonymous_axioms(edges)
        axioms = dict(edge_dict.get(target, {}))
        if "unionOf" in axioms or "intersectionOf" in axioms:
            c, batch = parses_constructors(axioms, edges.get("onProperty"))
            return local_cleaned | c, batch
        return local_cleaned, axioms

    def parses_subclasses(edges):
        # owlnets.py:474-499
        sc = edges["subClassOf"]
        if not _is_bnode_str(sc):
            return {(node, RDFS_SUBCLASSOF, sc)}, {
                k: v for k, v in edges.items() if k != "subClassOf"
            }
        return set(), {
            **edge_dict.get(sc, {}),
            **{k: v for k, v in edges.items() if k != "subClassOf"},
        }

    if OWL_AXIOM in root_types and not bnode_dict:
        pass  # handled above (direct URIRef axiom)

    elements = list(edge_dict.keys())
    for element in elements:
        edges = dict(edge_dict[element])
        guard = 0
        while edges:
            guard += 1
            if guard > 200:
                status.append(("misc", "decode-loop-guard"))
                break
            if "subClassOf" in edges:
                c, edges = parses_subclasses(edges)
                cleaned |= c
            elif "intersectionOf" in edges or "unionOf" in edges:
                c, edges = parses_constructors(edges)
                cleaned |= c
            elif "type" in edges and "Restriction" in str(edges.get("type", "")):
                res = parses_restrictions(edges)
                if res is None:
                    edges = None
                else:
                    c, edges = res
                    cleaned |= c
            else:
                misc = [
                    k for k in edges
                    if k not in ("type", "first", "rest", "onProperty")
                ]
                if misc:
                    status.append(("misc", ",".join(sorted(misc))))
                edges = None

    # A10: duplicate (s,o) resolution preferring non-subClassOf
    # (verifies_cleaned_classes, owlnets.py:591-619)
    by_so: dict[tuple[str, str], list[str]] = {}
    for s, p, o in cleaned:
        by_so.setdefault((s, o), []).append(p)
    verified = set()
    for (s, o), ps in by_so.items():
        if len(ps) > 1 and RDFS_SUBCLASSOF in ps:
            others = sorted(p for p in ps if p != RDFS_SUBCLASSOF)
            verified.add((s, others[0], o))
        else:
            verified.add((s, sorted(ps)[0], o))
    out_triples.extend(sorted(verified))
    if verified:
        status.append(("decoded", str(len(verified))))
    return out_triples, status


def decode_forests(forests: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Run the per-root decode via applyInPandas grouped by root."""

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        root = key[0]
        rows = list(
            zip(pdf["s"], pdf["p"], pdf["o"], pdf["o_is_literal"])
        )
        triples, status = _decode_forest(root, rows)
        trip_rows = [(root, s, p, o, "triple") for s, p, o in triples]
        stat_rows = [(root, st, d, "", "status") for st, d in status]
        return pd.DataFrame(
            trip_rows + stat_rows, columns=["root", "a", "b", "c", "kind"]
        )

    mixed = forests.groupBy("root").applyInPandas(
        run, "root string, a string, b string, c string, kind string"
    )
    decoded = mixed.filter(F.col("kind") == "triple").select(
        "root", F.col("a").alias("s"), F.col("b").alias("p"), F.col("c").alias("o")
    )
    status = mixed.filter(F.col("kind") == "status").select(
        "root", F.col("a").alias("status"), F.col("b").alias("detail")
    )
    return decoded, status


# ---------------------------------------------------------------------------
# N10: connectivity repair
# ---------------------------------------------------------------------------

def make_graph_connected(
    triples: DataFrame,
    approach: str = "subclass",
    common_ancestor: str = BFO_ROOT,
) -> DataFrame:
    """Attach root concepts to the common ancestor
    (makes_graph_connected, owlnets.py:673-713), deterministically.

    For every node with no subClassOf-ancestors: its root is itself unless
    its neighbors have ancestors, in which case the mode (deterministic
    lexicographic tie-break — replaces the reference's random.sample,
    SURVEY §7.4 risk 2). Roots get ``rdfs:subClassOf`` (subclass) or
    ``rdf:type`` (instance) edges to the ancestor.
    """
    sub_edges = triples.filter(F.col("p") == RDFS_SUBCLASSOF).select(
        F.col("s").alias("child"), F.col("o").alias("parent")
    )
    closure = transitive_closure(sub_edges)
    nodes = (
        triples.select(F.col("s").alias("node"))
        .unionByName(triples.select(F.col("o").alias("node")))
        .distinct()
    )
    has_anc = closure.select(F.col("child").alias("node")).distinct()
    rootless = nodes.join(has_anc, "node", "left_anti")

    # neighbors' top ancestors: out-neighbors o of rootless x, take the
    # topmost ancestor of each neighbor (reference takes ancs[0], the root
    # end of the ordered ancestor list); approximate with the ancestor set
    # mode. Deterministic via mode_per_group.
    neigh = (
        rootless.join(triples.select(F.col("s").alias("node"), "o"), "node")
        .select("node", F.col("o").alias("nbr"))
    )
    nbr_ancs = neigh.join(
        closure.select(F.col("child").alias("nbr"), F.col("parent").alias("anc")),
        "nbr",
    ).select("node", "anc")
    nbr_mode = mode_per_group(nbr_ancs, "node", "anc").withColumnRenamed(
        "anc", "root"
    )
    roots = (
        rootless.join(nbr_mode, "node", "left")
        .select(F.coalesce("root", F.col("node")).alias("root"))
        .distinct()
        .filter(F.col("root") != common_ancestor)
    )
    rel = RDFS_SUBCLASSOF if approach == "subclass" else RDF_TYPE
    new_edges = roots.select(
        F.col("root").alias("s"),
        F.lit(rel).alias("p"),
        F.lit(common_ancestor).alias("o"),
    )
    return triples.select("s", "p", "o").unionByName(new_edges).distinct()


# ---------------------------------------------------------------------------
# N11: purification
# ---------------------------------------------------------------------------

def purify_graph(triples: DataFrame, approach: str = "subclass") -> DataFrame:
    """Rewrite rdf:type ↔ rdfs:subClassOf per approach and connect subjects
    to all object ancestors (purifies_graph_build, owlnets.py:715-738).

    One closure computation + join/explode replaces the reference's
    per-triple recursive ancestor walk.
    """
    org_rel = RDF_TYPE if approach == "subclass" else RDFS_SUBCLASSOF
    pure_rel = RDFS_SUBCLASSOF if org_rel == RDF_TYPE else RDF_TYPE
    t = triples.select("s", "p", "o")
    to_fix = t.filter(F.col("p") == org_rel)
    keep = t.filter(F.col("p") != org_rel)
    rewritten = to_fix.select("s", F.lit(pure_rel).alias("p"), "o")
    sub_edges = t.filter(F.col("p") == RDFS_SUBCLASSOF).select(
        F.col("s").alias("child"), F.col("o").alias("parent")
    )
    closure = transitive_closure(sub_edges)
    anc_edges = (
        to_fix.join(closure.withColumnRenamed("child", "o"), "o")
        .filter(F.col("parent").startswith("http"))
        .filter(F.col("parent") != F.col("o"))
        .select("s", F.lit(pure_rel).alias("p"), F.col("parent").alias("o"))
    )
    return keep.unionByName(rewritten).unionByName(anc_edges).distinct()


# ---------------------------------------------------------------------------
# full OWL-NETS run
# ---------------------------------------------------------------------------

def run_owlnets(
    triples: DataFrame,
    approach: str | None = "subclass",
    purify: bool = False,
) -> dict[str, DataFrame]:
    """Full pipeline (runs_owlnets, owlnets.py:775-834): disjointWith
    removal → plain-triples filter → decode → clean → connect → (purify)."""
    t = remove_disjoint_with(triples)
    plain = filter_owl_semantics(t).select("s", "p", "o")
    roots = decode_roots(t)
    forests = assign_forests(t, roots)
    decoded, status = decode_forests(forests)
    decoded_full = decoded.select(
        "s",
        "p",
        "o",
        F.lit(False).alias("o_is_literal"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(None).cast("string").alias("o_datatype"),
    )
    cleaned = clean_decoded_graph(decoded_full).select("s", "p", "o")
    # cut lineage ONCE on the combined graph: make_graph_connected reads
    # its input from four subtrees (closure base, node set, neighbor set,
    # final union) — without the cut each consumer re-ran the whole
    # applyInPandas decode + the plain-triples filter tree (~4× the decode
    # cost; at cluster scale 4 redundant scans of the decoded graph)
    combined = _cut_lineage(plain.unionByName(cleaned).distinct())
    connected = make_graph_connected(combined, approach or "subclass")
    out = {
        "owlnets": connected,
        "decode_status": status,
    }
    if purify and approach:
        out["purified"] = purify_graph(connected, approach)
    return out
