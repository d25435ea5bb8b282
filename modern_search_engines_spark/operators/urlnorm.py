"""URL canonicalization + canonical-URL deduplication — the very first
dedup pass of every web-crawl pipeline (CommonCrawl/CCNet dedup by URL
before touching content; the reference engine's crawler keys its
frontier and dedup on the raw URL, backend/crawler/frontier.py).

Canonical form (RFC 3986 normalization + the crawl-pipeline extras):
  * strip the fragment (``#...`` — never sent to the server);
  * lowercase scheme and host; strip leading ``www.`` labels (all of them — idempotence);
  * strip the scheme-default port (``:80`` http / ``:443`` https);
  * collapse duplicate slashes in the path and strip trailing slashes;
  * drop tracking query params (``utm_*``, ``gclid``, ``fbclid``) and
    sort the survivors byte-wise (param order is not semantic).

Everything is a pure JVM expression (regexp decomposition + array
lambdas over the query params) — canonicalization itself is map-only
and fuses into the scan. ``dedup_by_canonical_url`` adds the one
unavoidable shuffle: a groupBy on the canonical key with a
map-side-combinable ``min(struct(id))`` winner (same first-occurrence
aggregation shape as linededup/spandedup — a hot canonical URL that a
crawler fetched 10^7 times collapses per map task before the shuffle,
and there is no window over the corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# one regex splits the URL into (scheme, authority, path, query);
# regexp_extract returns '' for absent groups in both Spark and DuckDB
URL_PARTS_RE = r"^(?i)([a-z][a-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?.*$"
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid)(=.*)?$"


def canonical_url_expr(url_col: str = "url") -> Column:
    """Canonical form of ``url_col`` (NULL when the value does not parse
    as an absolute http(s)-style URL — callers decide whether unparsable
    means drop or pass-through)."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, URL_PARTS_RE, 1))
    auth = F.lower(F.regexp_extract(u, URL_PARTS_RE, 2))
    path = F.regexp_extract(u, URL_PARTS_RE, 3)
    query = F.regexp_extract(u, URL_PARTS_RE, 4)

    # ALL leading www. labels, not one — canonicalization must be a
    # fixed point (re-normalizing an already-normalized table is the
    # common operational accident; property-tested idempotent)
    host = F.regexp_replace(auth, r"^(www\.)+", "")
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")) \
            .when(scheme == "https", F.regexp_replace(host, ":443$", "")) \
            .otherwise(host)
    cpath = F.regexp_replace(F.regexp_replace(path, "/{2,}", "/"),
                             "/+$", "")
    params = F.sort_array(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    qs = F.concat_ws("&", params)
    canon = F.concat(scheme, F.lit("://"), host, cpath,
                     F.when(qs != "", F.concat(F.lit("?"), qs))
                     .otherwise(F.lit("")))
    return F.when(scheme != "", canon).otherwise(F.lit(None).cast("string"))


def dedup_by_canonical_url(df: DataFrame, url_col: str = "url",
                           id_col: str = "doc_id") -> DataFrame:
    """(id, canonical_url, keep, dup_of) — first occurrence (min id) per
    canonical URL wins; ``dup_of`` is the winner's id on losers, NULL on
    winners and on unparsable URLs (which always pass — no canonical key
    to collide on)."""
    d = df.select(F.col(id_col),
                  canonical_url_expr(url_col).alias("canonical_url"))
    winners = (d.where(F.col("canonical_url").isNotNull())
               .groupBy("canonical_url")
               .agg(F.min(id_col).alias("__w")))
    out = d.join(winners, "canonical_url", "left")
    dup_of = F.when(F.col("__w") != F.col(id_col), F.col("__w"))
    return out.select(
        id_col, "canonical_url",
        dup_of.isNull().alias("keep"),
        dup_of.cast("long").alias("dup_of"))
