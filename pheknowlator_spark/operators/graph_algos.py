"""Iterative graph algorithms as driver-side loops over DataFrame ops.

* ``connected_components`` — A7 (kg_utils.py:402-420 networkx CC) as
  large-star/small-star min-label propagation; used for same-as
  canonicalization (north rule).
* ``transitive_closure`` — J10/N11 ancestor closure
  (kg_utils.py:373-399 recursive walk) as iterative self-join to fixpoint.
* ``assign_integer_ids`` — S13/W2 dense id assignment
  (kg_utils.py:653-699) without a single-partition window.
* ``pagerank`` — power-iteration node importance over the built KG.
* ``triangle_stats`` — per-node triangles + local clustering coefficient
  (node-iterator++ oriented wedge join).
* ``bfs_depths`` — min-hop depth from a root set (frontier BFS).

Each iteration cuts lineage (SURVEY §4: checkpoint every iteration).
``set_reliable_checkpoints(spark, dir)`` switches the cut from
``localCheckpoint`` (executor-local blocks — fast, but lost with an
executor in cluster mode) to RELIABLE ``checkpoint`` writes under a
fault-tolerant directory — required on a real multi-executor cluster,
where losing one executor mid-iteration would otherwise recompute the
whole chain. Local mode keeps the default: one JVM, no executor loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RELIABLE_CONF = "spark.pheknowlator.reliableCheckpoints"


def set_reliable_checkpoints(spark, checkpoint_dir: str | None) -> None:
    """Route iteration lineage cuts through reliable checkpoints (HDFS/
    object-store ``checkpoint_dir``); pass None to revert to
    localCheckpoint. The toggle is scoped to ``spark``'s session conf —
    concurrent sessions/threads with their own SparkSession are unaffected
    (a process-global flag would flip them all, possibly without a
    checkpoint dir set). Prefer :func:`reliable_checkpoints` for a
    guaranteed reset."""
    if checkpoint_dir is None:
        spark.conf.set(_RELIABLE_CONF, "false")
        return
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    spark.conf.set(_RELIABLE_CONF, "true")


class reliable_checkpoints:
    """Context manager: ``with reliable_checkpoints(spark, dir): ...`` —
    enables reliable iteration checkpoints for the session and always
    restores the previous mode on exit."""

    def __init__(self, spark, checkpoint_dir: str):
        self._spark = spark
        self._dir = checkpoint_dir

    def __enter__(self):
        self._prev = self._spark.conf.get(_RELIABLE_CONF, "false")
        set_reliable_checkpoints(self._spark, self._dir)
        return self._spark

    def __exit__(self, *exc):
        self._spark.conf.set(_RELIABLE_CONF, self._prev)
        return False


def _cut_lineage(df: DataFrame) -> DataFrame:
    if df.sparkSession.conf.get(_RELIABLE_CONF, "false") == "true":
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    checkpoint_every: int = 1,
    state_store=None,
    stage_prefix: str = "cc",
    on_round=None,
) -> DataFrame:
    """Min-label-propagation connected components over an undirected edge set.

    Returns ``[node, component]`` where component is the lexicographic min
    node id of the component (deterministic — replaces the reference's
    order-dependent networkx component numbering, kg_utils.py:402-420).

    Algorithm: alternate small-star / large-star style contraction via
    grouped min-neighbor joins; converges in O(log d) rounds on real graphs.
    Per-round cost: one shuffle join + one groupBy — both hash-partitioned
    on node, so at 10^12 scale rounds reuse the same partitioning.

    Restart safety: pass a ``plans.checkpoint.StageStore`` as
    ``state_store`` and each round's label table commits as stage
    ``{stage_prefix}_round_NNNN``; a rerun after a mid-iteration crash
    resumes from the last committed round (edges are re-derived — they are
    input, not state — and every round is a deterministic function of the
    previous labels, so the resumed result is identical; asserted by
    ``tests/test_misc_ops.py``'s kill/resume test). Leave it None for the
    in-memory ``localCheckpoint``/reliable-``checkpoint`` lineage cuts
    only. ``on_round(it)`` is a post-commit hook (fault injection in
    tests).
    """
    # undirected symmetric closure, self-labels
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # cut sym FIRST so the labels cut reads the checkpointed edges — the
    # former order derived labels from the still-lazy subtree and its cut
    # re-ran the whole upstream edge derivation a second time
    sym = _cut_lineage(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    labels = _cut_lineage(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    start_it = 0
    if state_store is not None:
        done = sorted(
            s for s in state_store.manifest()["stages"]
            if s.startswith(f"{stage_prefix}_round_")
        )
        if done:
            # committed round tables carry the ``__prev`` probe column —
            # resume with the label columns only
            labels = state_store.run(done[-1], lambda: labels).select(
                "node", "component"
            )
            start_it = int(done[-1].rsplit("_", 1)[-1]) + 1

    for it in range(start_it, max_iterations):
        # candidate label per node = min(own, min over neighbors' labels)
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # the previous label rides along as ``__prev`` so the convergence
        # probe below is a plain scan of the checkpointed round table —
        # the former shape re-joined the round against the previous
        # labels (one extra shuffle join + exchange per round)
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                F.col("component").alias("__prev"),
            )
        )
        # label-pointer jumping: component ← label(component) to shortcut chains
        jumped = (
            new_labels.alias("l")
            .join(
                new_labels.select(
                    F.col("node").alias("component"),
                    F.col("component").alias("parent"),
                ).alias("r"),
                "component",
                "left",
            )
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("parent", F.col("component"))).alias(
                    "component"
                ),
                "__prev",
            )
        )
        if checkpoint_every and (it % checkpoint_every == 0):
            jumped = _cut_lineage(jumped)
        if state_store is not None:
            jumped = state_store.run(
                f"{stage_prefix}_round_{it:04d}", lambda j=jumped: j
            )
        changed = (
            jumped.filter(F.col("component") != F.col("__prev"))
            .limit(1)
            .count()
        )
        labels = jumped.drop("__prev")
        if on_round is not None:
            on_round(it)
        if changed == 0:
            break
    return labels


def transitive_closure(
    edges: DataFrame,
    src: str = "child",
    dst: str = "parent",
    max_iterations: int = 30,
) -> DataFrame:
    """All (descendant, ancestor) pairs over a DAG edge set.

    Doubling closure: paths ← paths ∪ (paths ⋈ paths) each round, so depth-d
    hierarchies converge in ⌈log2 d⌉ rounds. Intended for the *ontology*
    subgraph (≤10^7 edges — SURVEY §7.4 risk 3 bounds the explosion); never
    run on the full web-derived triple set.

    Returns ``[child, parent]`` distinct pairs (excluding reflexive pairs).
    """
    paths = (
        edges.select(F.col(src).alias("child"), F.col(dst).alias("parent"))
        .filter(F.col("child") != F.col("parent"))
        .distinct()
    )
    paths = _cut_lineage(paths)
    old_count = paths.count()
    for _ in range(max_iterations):
        hops = (
            paths.alias("x")
            .join(
                paths.alias("y"), F.col("x.parent") == F.col("y.child")
            )
            .select(F.col("x.child").alias("child"), F.col("y.parent").alias("parent"))
            .filter(F.col("child") != F.col("parent"))
        )
        new_paths = paths.unionByName(hops).distinct()
        new_paths = _cut_lineage(new_paths)
        # carry the previous round's count instead of recounting the
        # checkpointed frame — one fewer job per round
        new_count = new_paths.count()
        paths = new_paths
        if new_count == old_count:
            break
        old_count = new_count
    return paths


def entity_ancestors(
    subclass_edges: DataFrame, entities: DataFrame, entity_col: str = "node"
) -> DataFrame:
    """J10: ancestors per entity via the cached closure.

    ``subclass_edges``: [child, parent] direct edges. Returns
    [node, ancestor] pairs (kg_utils.py:373-399 semantics, order-free).
    """
    closure = transitive_closure(subclass_edges)
    return (
        entities.select(F.col(entity_col).alias("node"))
        .distinct()
        .join(closure.withColumnRenamed("child", "node"), "node")
        .select("node", F.col("parent").alias("ancestor"))
    )


def assign_integer_ids(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S13: dense integer ids for every node+predicate, plus encoded triples.

    The reference assigns ids in insertion order (kg_utils.py:681-686); any
    bijection is valid because the map is materialized alongside. We order
    lexicographically for determinism and use zipWithIndex (no
    single-partition window bottleneck at 10^10 nodes).

    Returns (id_map [entity, id], int_triples [s_id, p_id, o_id]).
    Parity check: output triple count must equal input (kg_utils.py:694).
    """
    entities = (
        triples.select(F.col("s").alias("entity"))
        .unionByName(triples.select(F.col("p").alias("entity")))
        .unionByName(triples.select(F.col("o").alias("entity")))
        .distinct()
        .orderBy("entity")
    )
    id_map = (
        entities.rdd.map(lambda r: r.entity)
        .zipWithIndex()
        .toDF(["entity", "id"])
    )
    m = id_map
    int_triples = (
        triples.join(m.select(F.col("entity").alias("s"), F.col("id").alias("s_id")), "s")
        .join(m.select(F.col("entity").alias("p"), F.col("id").alias("p_id")), "p")
        .join(m.select(F.col("entity").alias("o"), F.col("id").alias("o_id")), "o")
        .select("s_id", "p_id", "o_id")
    )
    n_in, n_out = triples.count(), int_triples.count()
    if n_in != n_out:
        raise ValueError(
            f"integer-encoding lost triples: {n_in} in vs {n_out} out"
        )
    return id_map, int_triples


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 1,
    state_store=None,
    stage_prefix: str = "pr",
    on_round=None,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge set — node importance
    for the constructed KG (the reference exposes the networkx graph for
    exactly this kind of downstream analysis, kg_utils.py:423-447's
    gets_graph_statistics neighbors; here it is a first-class distributed
    operator). Returns ``[node, rank]`` with ranks summing to 1.

    Semantics (the classic formulation, fixed ``iterations`` so the result
    is a closed-form function of the input): rank⁰ = 1/N;
    rank^{k+1}(v) = (1-d)/N + d·(Σ_{u→v} rank^k(u)/outdeg(u) + D^k/N)
    where D^k is the total rank parked on dangling nodes (no out-edges),
    redistributed uniformly.

    100 TB path: out-degree weights are folded into the edge table ONCE
    before the loop (``w = 1/outdeg``), so each iteration is one
    hash-partitioned join on ``src`` + one partially-combined ``sum``
    keyed by ``dst`` — the same two-shuffle round as connected
    components, reusing the node partitioning across iterations. The
    dangling mass is a one-row broadcast (crossJoin of an aggregate), not
    a driver collect, so the whole iteration stays in one lazy plan;
    lineage is cut per round (reliable checkpoints apply, see
    :func:`set_reliable_checkpoints`).

    Restart safety mirrors :func:`connected_components`: pass a
    ``plans.checkpoint.StageStore`` as ``state_store`` and each round's
    rank table commits as ``{stage_prefix}_round_NNNN``; a rerun resumes
    from the last committed round (each round is a deterministic function
    of the previous ranks, so the resumed result is identical).
    ``on_round(it)`` is a post-commit hook (fault injection in tests).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # cut the deduplicated edge set FIRST: the node count, the weighted
    # edge cut, and the dangling-flag join below each consume it — uncut,
    # every consumer re-ran the upstream edge derivation
    e = _cut_lineage(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    weighted = e.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("__deg")).alias("__w")
    )
    weighted = _cut_lineage(weighted)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # the dangling marker rides along in the rank table: the per-round
    # dangling mass becomes a filter + aggregate over the checkpointed
    # ranks instead of an anti-join against the out-degree dim (one fewer
    # join per round), and the new ranks build from the previous round's
    # table directly instead of re-joining the node dim
    has_out = outdeg.select(
        F.col("src").alias("node"), F.lit(True).alias("__has_out")
    )
    ranks = (
        nodes.join(has_out, "node", "left")
        .select(
            "node",
            F.coalesce("__has_out", F.lit(False)).alias("__has_out"),
            F.lit(1.0 / n).alias("rank"),
        )
    )
    ranks = _cut_lineage(ranks)
    d = damping
    start_it = 0
    if state_store is not None:
        done = sorted(
            s for s in state_store.manifest()["stages"]
            if s.startswith(f"{stage_prefix}_round_")
        )
        if done:
            ranks = state_store.run(done[-1], lambda: ranks)
            start_it = int(done[-1].rsplit("_", 1)[-1]) + 1
    for it in range(start_it, iterations):
        contrib = (
            weighted.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__w")).alias("__in"))
        )
        dangling = (
            ranks.filter(~F.col("__has_out"))
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            ranks.select("node", "__has_out")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__has_out",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d)
                    * (F.coalesce("__in", F.lit(0.0)) + F.col("__dm") / n)
                ).alias("rank"),
            )
        )
        if checkpoint_every and (it % checkpoint_every == 0):
            ranks = _cut_lineage(ranks)
        if state_store is not None:
            ranks = state_store.run(
                f"{stage_prefix}_round_{it:04d}", lambda r=ranks: r
            )
        if on_round is not None:
            on_round(it)
    return ranks.select("node", "rank")


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over an
    undirected simple graph — the next two entries of the graph-statistics
    family the reference computes with networkx (kg_utils.py:473-481's
    density/degree report; triangles/clustering are the standard
    companions networkx exposes on the same graph object). Returns
    ``[node, degree, triangles, clustering_coeff]`` for every node, where
    ``clustering_coeff = 2·triangles / (degree·(degree−1))`` (0.0 when
    degree < 2).

    Node-iterator++ plan (the MapReduce-classic): canonicalize each edge
    low→high once, enumerate wedges by joining the oriented edge list
    with itself on the middle node (so every triangle ``a<b<c`` is built
    exactly once from ``(a,b)+(b,c)``), then semi-join the closing edge
    ``(a,c)``. Orienting by id bounds the wedge join at
    Σ min-degree products instead of Σ degree² — the standard skew
    defense for power-law graphs; all three shuffles are keyed on node
    ids (AQE skew-join applies). No windows, no driver state.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    triangles = wedges.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"], "semi"
    )
    tri_per_node = (
        triangles.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(tri_per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            (F.lit(2.0) * F.coalesce("triangles", F.lit(0)))
            / (F.col("degree") * (F.col("degree") - F.lit(1))),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )


def bfs_depths(
    edges: DataFrame,
    roots: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Minimum hop count from a root set along directed ``src → dst``
    edges — the "ontology depth below root" statistic (the min-hop
    companion of :func:`transitive_closure`'s reachability; the reference
    walks the same hierarchy with per-node recursion,
    kg_utils.py:373-399). Returns ``[node, depth]`` for every node
    reachable from ``roots`` (roots themselves at depth 0); unreachable
    nodes are absent.

    Frontier BFS: each round expands only the newly-discovered frontier
    (anti-join against the visited set), so total work is O(edges
    reachable) across all rounds, not O(edges × depth). Both per-round
    shuffles (the frontier join, the min-dedup of new nodes) are keyed on
    node ids; lineage is cut per round (reliable checkpoints apply,
    :func:`set_reliable_checkpoints`); the loop exits on the first empty
    frontier via a ``limit(1).count()`` probe, never collecting state.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    e = _cut_lineage(e)
    visited = (
        roots.select(F.col(roots.columns[0]).alias("node"))
        .distinct()
        .withColumn("depth", F.lit(0).cast("long"))
    )
    visited = _cut_lineage(visited)
    frontier = visited
    for it in range(1, max_iterations + 1):
        nxt = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "anti")
            .withColumn("depth", F.lit(it).cast("long"))
        )
        nxt = _cut_lineage(nxt)
        if nxt.limit(1).count() == 0:
            break
        # visited stays a LAZY union of the checkpointed per-level deltas
        # — re-cutting the whole union every level re-materialized the
        # full visited set per round (O(depth²) total work and one extra
        # eager job per level) for frames that are already checkpointed
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor link prediction over an undirected simple graph —
    KG-completion candidate generation: non-adjacent node pairs scored by
    shared neighborhood. Returns ``[a, b, common_neighbors, jaccard,
    adamic_adar]`` for every pair ``a < b`` NOT already an edge with at
    least ``min_common`` common neighbors, where ``jaccard = |N(a)∩N(b)|
    / |N(a)∪N(b)|`` and ``adamic_adar = Σ_z 1/ln(deg z)`` over the common
    neighbors ``z`` (deg z ≥ 2 by construction, so the log never hits 0;
    9-dp rounded — the only float summation).

    Plan: symmetric adjacency once, candidate pairs from the wedge join
    ``(z,a)⋈(z,b), a<b`` (each shared neighbor contributes the pair
    exactly once, so ``count(*)`` IS the common-neighbor count), degree
    dim joined on the middle node, one partially-combined aggregation per
    pair, one anti-join to drop existing edges. Hub nodes contribute
    deg² wedge pairs — the documented scale control is
    ``max_neighbor_degree``: drop super-hubs as middle nodes (standard
    practice; a celebrity node's common-neighbor signal is noise anyway),
    turning the worst case from deg_max² into threshold². AQE skew-join
    covers moderate skew when the cap is off.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .distinct()
    )
    adj = und.select(F.col("a").alias("z"), F.col("b").alias("n")).unionByName(
        und.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("degree"))
    mid = adj.select(F.col("n").alias("z"), F.col("z").alias("n")).join(
        deg, "z"
    )
    if max_neighbor_degree is not None:
        mid = mid.filter(F.col("degree") <= max_neighbor_degree)
    pairs = (
        mid.alias("x")
        .join(mid.alias("y"), "z")
        .filter(F.col("x.n") < F.col("y.n"))
        .select(
            F.col("x.n").alias("a"),
            F.col("y.n").alias("b"),
            F.col("x.degree").alias("__dz"),
        )
    )
    scored = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("__dz"))).alias("__aa"),
    )
    da = deg.select(F.col("z").alias("a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("z").alias("b"), F.col("degree").alias("__db"))
    return (
        scored.filter(F.col("common_neighbors") >= min_common)
        .join(und, ["a", "b"], "anti")
        .join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("__da") + F.col("__db") - F.col("common_neighbors"))
            ).alias("jaccard"),
            F.round("__aa", 9).alias("adamic_adar"),
        )
    )


def k_core(
    edges: DataFrame,
    k: int = 2,
    rounds: int | None = None,
    src: str = "src",
    dst: str = "dst",
    on_round=None,
) -> DataFrame:
    """k-core decomposition by iterative peeling — the standard dense-
    subgraph filter for pruning a noisy constructed KG to its reliably
    connected backbone before embedding training. The graph is treated
    as undirected (edges symmetrized + deduplicated); each round removes
    every node whose degree has fallen below ``k`` and the edges touching
    it. Returns ``[node, degree]`` for the surviving nodes with their
    within-core degree.

    ``rounds=None`` peels to the exact fixed point (the true k-core),
    using one driver-side count per round as the convergence test — the
    same bounded pattern as :func:`connected_components`. A fixed
    ``rounds=N`` runs exactly N peel rounds (a closed-form function of
    the input that a DuckDB oracle replays as N chained CTEs); once the
    core is reached further rounds are no-ops, so a fixed N ≥ the peel
    depth equals the exact core.

    100 TB plan: a round is ONE partially-combined degree aggregation
    keyed on the node + TWO left-semi hash joins (src kept, dst kept) —
    all shuffles on the node key, reused across rounds; lineage is cut
    per round (reliable checkpoints apply, see
    :func:`set_reliable_checkpoints`). Peel depth is bounded by the
    degeneracy ordering, typically tens of rounds on power-law graphs.
    ``on_round(r, edges_df)`` is a pre-checkpoint hook (plan audits /
    fault injection in tests, mirroring :func:`connected_components`).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds is not None and rounds < 1:
        raise ValueError("rounds must be >= 1 or None")
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = _cut_lineage(und)
    prev_edges = None
    r = 0
    while True:
        r += 1
        deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("__deg"))
        keep = deg.filter(F.col("__deg") >= k).select("a")
        und = (
            und.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .select("a", "b")
        )
        if on_round is not None:
            on_round(r, und)
        und = _cut_lineage(und)
        if rounds is not None:
            if r >= rounds:
                break
        else:
            n_edges = und.count()
            if n_edges == prev_edges:
                break
            prev_edges = n_edges
    return und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
