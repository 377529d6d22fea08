"""Unit tests for negative_triples and comention_wilson."""

import hashlib
import math

import pytest

from pheknowlator_spark.operators.kg_train import negative_triples
from pheknowlator_spark.webtext.pipeline import comention_wilson


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


class TestNegativeTriples:
    def test_deterministic_draw_matches_hand_computation(self, spark):
        t = spark.createDataFrame(
            [("s1", "p", "a"), ("s2", "p", "b"), ("s3", "p", "c")],
            ["s", "p", "o"],
        )
        out = negative_triples(t, k=2, pool_size=16).collect()
        # pool = all 3 objects; replay the md5 draw in Python
        pool = ["a", "b", "c"]
        for r in out:
            cands = [c for c in pool if c != r["o"]]
            expect = min(
                cands,
                key=lambda c: _md5(
                    f"{r['s']}|{r['p']}|{r['o']}|{r['neg_idx']}|{c}"
                ),
            )
            assert r["neg_o"] == expect
        # 3 positives × 2 slots
        assert len(out) == 6

    def test_negative_never_equals_positive_and_same_predicate(self, spark):
        t = spark.createDataFrame(
            [("s%d" % i, "p%d" % (i % 2), "o%d" % i) for i in range(20)],
            ["s", "p", "o"],
        )
        out = negative_triples(t, k=3, pool_size=8).collect()
        objs_by_p = {}
        for i in range(20):
            objs_by_p.setdefault("p%d" % (i % 2), set()).add("o%d" % i)
        for r in out:
            assert r["neg_o"] != r["o"]
            assert r["neg_o"] in objs_by_p[r["p"]]  # type-consistent

    def test_pool_of_one_object_yields_nothing(self, spark):
        t = spark.createDataFrame([("s1", "p", "a"), ("s2", "p", "a")], ["s", "p", "o"])
        assert negative_triples(t, k=1, pool_size=4).count() == 0

    def test_rejects_bad_params(self, spark):
        t = spark.createDataFrame([("s", "p", "o")], ["s", "p", "o"])
        with pytest.raises(ValueError):
            negative_triples(t, k=0)
        with pytest.raises(ValueError):
            negative_triples(t, pool_size=1)


class TestComentionWilson:
    def test_hand_computed_bound(self, spark):
        # A and B co-occur on 2 pages; A on 3 pages, B on 2 → n=2, k=2
        rows = [
            ("u1", "A"), ("u1", "B"),
            ("u2", "A"), ("u2", "B"),
            ("u3", "A"),
        ]
        linked = spark.createDataFrame(rows, ["url", "curie"])
        out = comention_wilson(linked, min_pages=2).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["c1"], r["c2"], r["n_pages"], r["n_trials"]) == ("A", "B", 2, 2)
        z = 1.96
        n, p = 2.0, 1.0
        lb = (p + z * z / (2 * n) - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) / (
            1 + z * z / n
        )
        assert r["wilson_lb"] == pytest.approx(lb, abs=1e-9)

    def test_low_support_pulled_below_high_support(self, spark):
        rows = []
        # X,Y co-occur 2/2; P,Q co-occur 2 of 40 shared pages
        for i in range(2):
            rows += [(f"a{i}", "X"), (f"a{i}", "Y")]
        for i in range(40):
            rows.append((f"b{i}", "P"))
            rows.append((f"c{i}", "Q"))
        rows += [("b0", "Q"), ("b1", "Q")]
        linked = spark.createDataFrame(rows, ["url", "curie"])
        out = {(r["c1"], r["c2"]): r for r in comention_wilson(linked, min_pages=2).collect()}
        assert out[("X", "Y")]["wilson_lb"] > out[("P", "Q")]["wilson_lb"]


class TestRandomWalks:
    EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]

    def test_hash_draw_matches_hand_replay(self, spark):
        from pheknowlator_spark.operators.kg_train import random_walks

        edges = spark.createDataFrame(self.EDGES, ["src", "dst"])
        rows = random_walks(edges, length=2, num_walks=2).collect()
        adj = {}
        for s, d in self.EDGES:
            adj.setdefault(s, []).append(d)
        # replay: start nodes = {a,b,c,d}, walk ∈ {0,1}
        expect = {}
        for start in sorted(adj):
            for walk in (0, 1):
                node = start
                expect[(start, walk, 0)] = node
                for t in (1, 2):
                    cands = adj.get(node)
                    if not cands:
                        break
                    node = min(
                        cands,
                        key=lambda c: _md5(f"{start}|{walk}|{t}|{c}") + "|" + c,
                    )
                    expect[(start, walk, t)] = node
        got = {(r["start"], r["walk"], r["step"]): r["node"] for r in rows}
        assert got == expect

    def test_walk_stops_at_sink(self, spark):
        from pheknowlator_spark.operators.kg_train import random_walks

        edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
        rows = random_walks(edges, length=3).collect()
        # a→b then b is a sink: steps 0 and 1 only
        assert sorted((r["step"], r["node"]) for r in rows) == [(0, "a"), (1, "b")]

    def test_rejects_bad_params(self, spark):
        from pheknowlator_spark.operators.kg_train import random_walks

        edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
        with pytest.raises(ValueError):
            random_walks(edges, length=0)
        with pytest.raises(ValueError):
            random_walks(edges, num_walks=0)


class TestKhopNeighbors:
    def test_fanout_caps_and_hash_ranking(self, spark):
        from pheknowlator_spark.operators.kg_train import khop_neighbors

        edges = spark.createDataFrame(
            [("a", f"b{i}") for i in range(5)] + [("b0", "x"), ("b0", "y")],
            ["src", "dst"],
        )
        rows = khop_neighbors(edges, fanouts=(2, 2)).collect()
        hop1 = sorted(r["child"] for r in rows if r["seed"] == "a" and r["hop"] == 1)
        expect = sorted(
            sorted(
                [f"b{i}" for i in range(5)],
                key=lambda c: _md5(f"a|1|a|{c}") + "|" + c,
            )[:2]
        )
        assert hop1 == expect
        # hop 2 only expands sampled hop-1 children
        hop2_parents = {r["parent"] for r in rows if r["seed"] == "a" and r["hop"] == 2}
        assert hop2_parents <= set(hop1)

    def test_rejects_bad_fanouts(self, spark):
        from pheknowlator_spark.operators.kg_train import khop_neighbors

        edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
        with pytest.raises(ValueError):
            khop_neighbors(edges, fanouts=())
        with pytest.raises(ValueError):
            khop_neighbors(edges, fanouts=(2, 0))


class TestVerbalizeTriples:
    def test_labels_and_local_name_fallback(self, spark):
        from pheknowlator_spark.operators.kg_train import verbalize_triples

        t = spark.createDataFrame(
            [("n1", "http://x/rel#locatedIn", "r1"), ("c9", "cites", "n1")],
            ["s", "p", "o"],
        )
        labels = spark.createDataFrame(
            [("n1", "United States"), ("r1", "America")], ["id", "label"]
        )
        got = {r["s"]: r for r in verbalize_triples(t, labels).collect()}
        assert got["n1"]["text"] == "United States locatedIn America."
        assert got["n1"]["n_tokens"] == 4
        # no label for c9 (plain id) or 'cites' (no separator): fall back whole
        assert got["c9"]["text"] == "c9 cites United States."
        assert got["c9"]["n_tokens"] == 4


class TestKCore:
    def test_exact_core_matches_fixed_rounds(self, spark):
        from pheknowlator_spark.operators.graph_algos import k_core

        # K4 on {a,b,c,d} plus a tail d-e-f that must peel away
        k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
        edges = spark.createDataFrame(k4 + [("d", "e"), ("e", "f")], ["src", "dst"])
        exact = sorted(tuple(r) for r in k_core(edges, k=3).collect())
        assert exact == [("a", 3), ("b", 3), ("c", 3), ("d", 3)]
        fixed = sorted(tuple(r) for r in k_core(edges, k=3, rounds=4).collect())
        assert fixed == exact

    def test_everything_peels_when_k_too_high(self, spark):
        from pheknowlator_spark.operators.graph_algos import k_core

        edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
        assert k_core(edges, k=2).count() == 0

    def test_rejects_bad_params(self, spark):
        from pheknowlator_spark.operators.graph_algos import k_core

        edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
        with pytest.raises(ValueError):
            k_core(edges, k=0)
        with pytest.raises(ValueError):
            k_core(edges, k=2, rounds=0)


class TestTranseEval:
    def test_hand_checkable_ranks(self, spark):
        from pheknowlator_spark.operators.kg_train import transe_eval

        # 1-D: s + r = 1.0; 'good' sits at the target, 'far' does not
        ent = spark.createDataFrame(
            [("s1", [0.0]), ("s2", [0.0]), ("good", [1.0]), ("far", [5.0])],
            ["id", "embedding"],
        )
        rel = spark.createDataFrame([("r", [1.0])], ["id", "embedding"])
        test = spark.createDataFrame(
            [("s1", "r", "good"), ("s2", "r", "far")], ["s", "p", "o"]
        )
        out = transe_eval(test, ent, rel, pool_size=8).collect()
        assert len(out) == 1
        r = out[0]
        # s1→good ranks 1, s2→far ranks 2 (good beats it)
        assert (r["p"], r["n"], r["mean_rank"]) == ("r", 2, 1.5)
        assert (r["hits_1"], r["hits_10"], r["mrr"]) == (0.5, 1.0, 0.75)

    def test_rejects_bad_params(self, spark):
        from pheknowlator_spark.operators.kg_train import transe_eval

        df = spark.createDataFrame([("a", [1.0])], ["id", "embedding"])
        t = spark.createDataFrame([("a", "r", "a")], ["s", "p", "o"])
        with pytest.raises(ValueError):
            transe_eval(t, df, df, pool_size=0)
        with pytest.raises(ValueError):
            transe_eval(t, df, df, quant=0)
