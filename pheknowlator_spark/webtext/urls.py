"""URL canonicalization for web-corpus hygiene.

The reference keys everything on source URLs it downloads
(pkt_kg/downloads.py:106 downloads_data_from_url); a Common-Crawl-scale
corpus instead needs URL NORMALIZATION before any url-keyed dedup or
per-host aggregation — the same page is crawled as
``HTTP://Example.com:80/a?b=2&a=1#x`` and ``http://example.com/a?a=1&b=2``.
Parsing here is deliberately regexp-only (no ``parse_url``), so a SQL
oracle replays the identical extraction rules byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_urls", "latest_capture", "snapshot_diff"]

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def normalize_urls(
    df: DataFrame,
    url_col: str = "url",
    strip_www: bool = False,
) -> DataFrame:
    """Append ``norm_url`` and ``host`` columns: scheme and host
    lowercased, default port stripped (80/http, 443/https), fragment
    dropped, query parameters sorted lexicographically (empty query
    dropped), empty path normalized to ``/``. ``strip_www=True`` also
    removes a leading ``www.`` from the host. Percent-encoding is left
    untouched (normalizing it requires a character-table pass that is
    not worth an Arrow crossing here; callers needing it can chain a
    pandas UDF).

    100 TB plan: pure Column regexp/array expressions — whole-stage
    codegen, zero shuffles, zero Python; the query-param sort operates
    on the handful of ``&``-split tokens per row, never the corpus.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    is_default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(is_default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_query)
        ),
    )
    return df.withColumn("norm_url", norm).withColumn("host", host)


def latest_capture(
    df: DataFrame,
    key_col: str = "norm_url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """CDX-style capture dedup: keep exactly one row per ``key_col`` — the
    latest ``ts_col``, ties broken by the lexicographically greatest full
    row (deterministic on any partitioning). The reference keeps one file
    per source url by overwriting on re-download
    (pkt_kg/downloads.py:106); at crawl scale the same page appears once
    per crawl and the newest capture wins.

    100 TB plan: one ``max_by`` hash aggregation — map-side partial
    combine ships ONE candidate row per key per partition, never the
    capture history (vs a row_number window, which shuffles every
    capture to sort it). The ordering struct makes ties explicit instead
    of partitioning-dependent.
    """
    others = [c for c in df.columns if c != key_col]
    row = F.struct(*[F.col(c) for c in others])
    # ordering = (ts NOT NULL, ts, remaining columns in table order) —
    # the not-null flag makes a NULL ts lose under max instead of being
    # silently dropped (same pattern as dedup_exact's min_by struct);
    # field-by-field struct comparison replays in SQL as
    # ORDER BY ts DESC NULLS LAST, col1 DESC, col2 DESC, ...
    tiebreak = [c for c in others if c != ts_col]
    order = F.struct(
        F.col(ts_col).isNotNull().alias("__has_ts"),
        F.col(ts_col).alias("__ts"),
        *[F.col(c).alias(f"__t{i}") for i, c in enumerate(tiebreak)],
    )
    out = df.groupBy(key_col).agg(F.max_by(row, order).alias("__w"))
    return out.select(key_col, *[F.col(f"__w.{c}").alias(c) for c in others])


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "norm_url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Classify urls between two crawl snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, different content hash),
    ``unchanged``. The incremental-crawl planner's input — only ``added``
    + ``changed`` pages need re-extraction, which is what makes a
    10^12-document monthly refresh tractable.

    Both inputs must be one-row-per-key (run :func:`latest_capture`
    first). One shuffle: a full outer hash join on the key; the status
    column is a codegen'd CASE over the two sides' null-ness.
    """
    o = old.select(
        F.col(key_col).alias("__k"), F.col(hash_col).alias("__old_h")
    )
    n = new.select(
        F.col(key_col).alias("__k"), F.col(hash_col).alias("__new_h")
    )
    joined = o.join(n, "__k", "full_outer")
    status = (
        F.when(F.col("__old_h").isNull(), F.lit("added"))
        .when(F.col("__new_h").isNull(), F.lit("removed"))
        .when(F.col("__old_h") != F.col("__new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.col("__k").alias(key_col),
        status.alias("status"),
        F.col("__old_h").alias("old_hash"),
        F.col("__new_h").alias("new_hash"),
    )
