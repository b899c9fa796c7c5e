"""URL canonicalization + URL-keyed dedup (extension surface).

Web-corpus pipelines dedup by canonical URL before any content-level
pass (Common-Crawl-style ingestion: the same page arrives under
scheme/case/port/tracking-param/fragment variants; URL dedup removes
the bulk re-crawls for free, content dedup handles the rest). The
normalization set below is the standard safe subset (RFC 3986 §6
syntax-based normalization plus the universal tracking-param strip —
the same rules the public url-normalize/w3lib libraries apply):

- scheme and host lowercased; ``www.`` prefix dropped
- default ports dropped (http:80 / https:443); others preserved
- fragment dropped
- trailing slash stripped from non-root paths
- tracking params removed (``utm_*``, ``fbclid``, ``gclid``, ``ref``)
- remaining query params SORTED (order-insensitive equality)

Everything is built-in expressions (parse_url + regexp + array ops) —
a zero-shuffle projection at scan speed; the only shuffle in
``url_dedup`` is the one keyed groupBy on the (short) canonical
string, the same cost shape as exact text dedup's md5 election.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|ref)="


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` per the module contract. NULL in →
    NULL out; an unparseable URL (no scheme/authority) yields NULL via
    try_parse_url's fail-soft null (plain parse_url THROWS under Spark 4 ANSI mode)."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.regexp_replace(
        F.lower(F.try_parse_url(url, F.lit("HOST"))), r"^www\.", ""
    )
    auth = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    raw_path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when(raw_path == "/", F.lit("")).otherwise(
        F.regexp_replace(raw_path, "/$", "")
    )
    params = F.array_sort(
        F.filter(
            F.split(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    joined = F.array_join(params, "&")
    query_part = F.when(
        joined != "", F.concat(F.lit("?"), joined)
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)


def url_dedup(df: DataFrame, *, url_col: str = "url") -> DataFrame:
    """Group rows by canonical URL: one row per canonical form with the
    duplicate count and the kept (minimum) doc_id — the URL-keyed
    keep-first election, same contract as exact_dedup's md5 election
    but keyed on the canonicalized string. Unparseable URLs (NULL
    canonical form) are excluded with a documented contract — they
    cannot be meaningfully URL-deduped and belong to content dedup."""
    canon = canonical_url(F.col(url_col))
    return (
        df.select(canon.alias("canonical_url"), "doc_id")
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )
