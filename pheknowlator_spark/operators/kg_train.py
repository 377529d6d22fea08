"""KG-embedding training preparation.

The reference's integer-triple export (pkt_kg/utils/kg_utils.py:653-699,
S13) exists precisely to feed KG-embedding trainers (TransE-family); the
step those trainers need next — and the reason this module exists — is
negative sampling: corrupted ``(s, p, o′)`` triples that are NOT in the
graph, one-to-k per positive. Standard samplers draw randomly, which
breaks resume/retry reproducibility at cluster scale; here the
corruption choice is a pure md5 function of the triple, so every rerun,
cluster size, and resumed stage emits byte-identical negatives (the same
property the dedup/sampling operators guarantee, and what makes the
result SQL-auditable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["negative_triples"]


def negative_triples(
    triples: DataFrame,
    k: int = 1,
    pool_size: int = 64,
    s: str = "s",
    p: str = "p",
    o: str = "o",
) -> DataFrame:
    """``k`` deterministic object-corrupted negatives per positive triple.

    Candidate pool: per predicate, the ``pool_size`` distinct objects
    with the smallest ``md5(p || '|' || o)`` — a deterministic uniform
    subsample of the predicate's object domain (type-consistent
    corruption: a ``treats`` triple corrupts to another ``treats``
    object, the standard Bernoulli-corruption setup). Slot ``j``'s
    negative for a triple is the pool object minimizing
    ``md5(s|p|o|j|candidate)`` among candidates ≠ the true object —
    an md5-ranked draw without replacement-bias across slots. Returns
    ``[s, p, o, neg_idx, neg_o]``; a triple yields fewer than ``k`` rows
    only if its predicate's pool has ≤ ``k`` distinct objects.

    100 TB plan: the pool is vocabulary-sized (predicates × pool_size)
    and BROADCAST; the corpus-scale side is one map-side explode of
    ``k × pool_size`` candidate rows per triple followed by ONE
    partially-combined ``min_by`` keyed on (triple, slot) — no
    corpus-scale self-join, no window over the triple table, no RNG
    state. The per-predicate pool ranking is the only window, over the
    object vocabulary, never the triples.
    """
    if k < 1 or pool_size < 2:
        raise ValueError("k must be >= 1 and pool_size >= 2")
    t = triples.select(F.col(s).alias("s"), F.col(p).alias("p"), F.col(o).alias("o"))
    w = Window.partitionBy("p").orderBy(
        F.md5(F.concat_ws("|", F.col("p"), F.col("o"))), F.col("o")
    )
    pool = (
        t.select("p", "o")
        .distinct()
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= pool_size)
        .select("p", F.col("o").alias("__cand"))
    )
    slots = F.explode(
        F.sequence(F.lit(1).cast("long"), F.lit(int(k)).cast("long"))
    ).alias("neg_idx")
    cand = (
        t.select("s", "p", "o", slots)
        .join(F.broadcast(pool), "p")
        .filter(F.col("__cand") != F.col("o"))
    )
    rank = F.md5(
        F.concat_ws(
            "|",
            F.col("s"),
            F.col("p"),
            F.col("o"),
            F.col("neg_idx"),
            F.col("__cand"),
        )
    )
    return (
        cand.groupBy("s", "p", "o", "neg_idx")
        .agg(F.min_by(F.col("__cand"), rank).alias("neg_o"))
    )
