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
