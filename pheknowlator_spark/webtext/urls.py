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

__all__ = ["normalize_urls"]

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
