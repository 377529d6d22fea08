"""Training-corpus hygiene operators: benchmark-contamination checks and
deterministic stratified sampling.

These extend the document-table surface (SURVEY §2's LLM-data-pipeline
block) with the two corpus-prep steps a web-scale training pipeline runs
between dedup and tokenization: (1) drop documents that leak evaluation
data (n-gram overlap with a benchmark suite), and (2) downsample each
stratum (language / source / quality band) to a target mixture — by
fixed per-stratum fractions (:func:`stratified_sample`) or by token/
char budgets (:func:`budget_sample`) — with a deterministic hash: the
same rows survive on every run, every cluster size, and every retry,
which is what makes the sample reproducible and the job idempotently
resumable.

Scale notes (100 TB): benchmark suites are tiny relative to the corpus
(MMLU-sized: 10^4-10^5 grams), so the contamination join broadcasts the
benchmark gram set — the corpus side is one map-side explode + broadcast
hash join + partially-combined aggregation keyed by doc id; no
corpus-scale shuffle of raw grams against raw grams. Stratified sampling
is entirely map-side (a filter over a hash bucket) — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import shingles

__all__ = [
    "budget_sample",
    "contamination_check",
    "sample_bucket",
    "stratified_sample",
]


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Documents sharing any word ``n``-gram with a benchmark document.

    Returns ``[<id_col>, n_shared_grams, n_bench_docs]`` for contaminated
    docs only (no row ⇒ clean). ``n_shared_grams`` counts the distinct
    overlapping grams, ``n_bench_docs`` the distinct benchmark docs hit —
    the two numbers a decontamination policy thresholds on (single-gram
    collisions are noise at small ``n``; many grams or many suite docs is
    leakage).

    The benchmark gram set is broadcast; the corpus side never shuffles
    gram rows — only the per-doc aggregation keyed by ``id_col`` (hit
    rows only, partially combined map-side).
    """
    dg = docs.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    bg = (
        benchmark.select(
            F.col(bench_id_col).alias("__bench_id"),
            F.explode(shingles(F.col(bench_text_col), n)).alias("gram"),
        )
        .distinct()
    )
    return (
        dg.join(F.broadcast(bg), "gram")
        .groupBy(id_col)
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("__bench_id").alias("n_bench_docs"),
        )
    )


def sample_bucket(col) -> F.Column:
    """Uniform bucket in ``[0, 2^20)`` from the top 5 hex digits of md5.

    md5 (not xxhash64) so the bucket is bit-exactly reproducible in ANSI
    SQL — DuckDB: ``CAST('0x' || substring(md5(x), 1, 5) AS BIGINT)`` —
    which keeps the sampling decision auditable outside Spark. 20 bits
    gives fraction granularity of ~1e-6, enough for corpus mixtures.
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 5), 16, 10).cast(
        "long"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its id's hash
    bucket falls below ``fraction(stratum) * 2^20``.

    Unlike ``DataFrame.sampleBy`` (per-partition RNG: the surviving set
    depends on partitioning and retries), the decision is a pure function
    of the row id — reruns, resumed jobs, and different cluster sizes all
    keep exactly the same rows, so downstream artifacts are reproducible
    and the step composes with checkpoint/resume (``plans.checkpoint``).
    Map-side only: a literal-map lookup plus a filter; no shuffle, no
    driver state beyond the fractions dict.
    """
    if not fractions:
        mapping = F.lit(None).cast("double")
    else:
        mapping = F.create_map(
            *[
                F.lit(x)
                for k, v in fractions.items()
                for x in (k, float(v))
            ]
        )[F.col(strata_col)]
    frac = F.coalesce(mapping, F.lit(float(default_fraction)))
    return df.filter(
        sample_bucket(F.col(id_col)).cast("double") < frac * float(1 << 20)
    )


def budget_sample(
    df: DataFrame,
    strata_col: str,
    budgets: dict,
    weight_col: str,
    default_budget: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Downsample each stratum to ≈ a target WEIGHT budget (tokens,
    characters, bytes): fraction = min(1, budget / stratum_weight),
    applied with the same deterministic md5 bucket as
    :func:`stratified_sample` — the corpus-mixing step that turns "2:1
    English:code, 50B tokens total" into per-row keep decisions.

    Already-under-budget strata keep every row (fraction capped at 1);
    the expected surviving weight of an over-budget stratum is the
    budget (hash buckets are uniform and independent of the weight
    column). Cost: ONE partially-combined aggregation producing a
    stratum-count-sized table (broadcast back), then a map-side filter —
    the corpus is scanned twice but never shuffled. Deterministic like
    ``stratified_sample``: the surviving set is a pure function of
    (ids, stratum weights), identical across partitionings and retries.
    """
    totals = df.groupBy(strata_col).agg(
        F.sum(F.col(weight_col)).cast("double").alias("__stratum_weight")
    )
    if not budgets:
        mapping = F.lit(None).cast("double")
    else:
        mapping = F.create_map(
            *[F.lit(x) for k, v in budgets.items() for x in (k, float(v))]
        )[F.col(strata_col)]
    frac = F.least(
        F.lit(1.0),
        F.coalesce(mapping, F.lit(float(default_budget)))
        / F.greatest(F.col("__stratum_weight"), F.lit(1.0)),
    )
    dim = totals.select(F.col(strata_col), frac.alias("__frac"))
    return (
        df.join(F.broadcast(dim), strata_col)
        .filter(
            sample_bucket(F.col(id_col)).cast("double")
            < F.col("__frac") * 1048576.0
        )
        .drop("__frac")
    )
