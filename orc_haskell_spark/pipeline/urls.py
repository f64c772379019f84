"""URL analytics for crawl pipelines: parsing, canonicalization,
per-domain aggregation, and blocklist filtering.

All-Catalyst string expressions in the Java-regex / RE2 common subset
(no replacement backreferences — Spark spells them ``$1``, DuckDB
``\\1`` — so every rule is extract/concat/conditional instead), which
keeps an exact DuckDB twin possible for oracle checks.

100 TB shape: ``url_parts`` / ``normalize_urls`` are row-wise
projections (no shuffle); ``domain_stats`` is a partial-aggregating
groupBy on host (bounded cardinality ~1e8 domains at crawl scale, far
smaller than the row count); ``blocklist_filter`` broadcasts the
blocklist (blocklists are small dims) and anti-joins on the registered
domain, so subdomains of a blocked domain are dropped without any
suffix-scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# scheme://[userinfo@]host[:port][/path][?query][#fragment]
# (?:[^/@?#]*@)? skips userinfo: without it, 'https://evil@tracker.net'
# would parse host 'evil@tracker.net' and BYPASS a tracker.net blocklist
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#@]+)"
_PORT_RE = ("^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?"
            "[^/:?#@]+:([0-9]+)")
_PATHQ_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
_REGDOM_RE = "([^.]+\\.[^.]+)$"


def url_part_cols(url_col: str) -> list[Column]:
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    port_s = F.regexp_extract(u, _PORT_RE, 1)
    pathq = F.regexp_extract(u, _PATHQ_RE, 1)
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    query = F.regexp_extract(pathq, "\\?(.*)$", 1)
    return [
        scheme.alias("scheme"),
        host.alias("host"),
        # try_cast: an over-int32 port in one garbage URL must yield
        # null, not kill the job with an ANSI CAST_OVERFLOW
        F.when(port_s == "", F.lit(None).cast("int"))
         .otherwise(port_s.try_cast("int")).alias("port"),
        F.when(path == "", F.lit("/")).otherwise(path).alias("path"),
        F.when(query == "", F.lit(None).cast("string"))
         .otherwise(query).alias("query"),
        F.regexp_extract(host, _REGDOM_RE, 1).alias("reg_domain"),
    ]


def url_parts(df: DataFrame, url_col: str) -> DataFrame:
    """Split URLs into scheme/host/port/path/query/registered-domain
    columns (kept alongside the original). Pure projection."""
    return df.select("*", *url_part_cols(url_col))


def normalize_url_col(url_col: str) -> Column:
    """Canonical URL: fragment stripped, scheme+host lowercased,
    default ports (http:80, https:443) removed, empty path -> '/'.
    Query strings are preserved verbatim (semantics differ per site)."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    port_s = F.regexp_extract(u, _PORT_RE, 1)
    default = ((scheme == "http") & (port_s == "80")) | \
              ((scheme == "https") & (port_s == "443"))
    hostport = F.when((port_s == "") | default, host).otherwise(
        F.concat(host, F.lit(":"), port_s))
    pathq = F.regexp_extract(u, _PATHQ_RE, 1)
    # empty path -> '/', including before a query ('https://x.y?q=1'
    # and 'https://x.y/?q=1' must canonicalize identically)
    pathq = F.when(pathq == "", F.lit("/")) \
             .when(pathq.startswith("?"), F.concat(F.lit("/"), pathq)) \
             .otherwise(pathq)
    # a string with no scheme://host is not an absolute URL: pass it
    # through unchanged rather than fabricating ':///' (which would
    # collide distinct garbage rows into one canonical dedup key)
    return F.when((scheme == "") | (host == ""), u).otherwise(
        F.concat(scheme, F.lit("://"), hostport, pathq))


def normalize_urls(df: DataFrame, url_col: str,
                   out_col: str | None = None) -> DataFrame:
    """Add (or replace) the canonicalized URL column. Canonical URLs
    make exact dedup catch scheme-case/port/fragment variants."""
    return df.withColumn(out_col or url_col, normalize_url_col(url_col))


def domain_stats(df: DataFrame, url_col: str,
                 size_col: str | None = None) -> DataFrame:
    """Per-host crawl statistics: page count, distinct paths, and
    (optionally) total payload bytes/chars. groupBy on host — partial
    aggregation map-side; host cardinality is orders of magnitude below
    the page count, so the shuffle is small."""
    cols = list(url_part_cols(url_col))
    aggs = [F.count("*").alias("pages"),
            F.countDistinct("path").alias("distinct_paths")]
    if size_col is not None:
        cols.append(F.col(size_col))
        aggs.append(F.sum(size_col).cast("bigint").alias("total_size"))
    return df.select(*cols).groupBy("host", "reg_domain").agg(*aggs)


def blocklist_filter(df: DataFrame, url_col: str,
                     blocked_domains: DataFrame | list[str],
                     keep_blocked: bool = False) -> DataFrame:
    """Drop rows whose registered domain is blocklisted (subdomains of
    a blocked domain are dropped too, by construction of reg_domain).
    The blocklist side is broadcast — a crawl blocklist is a small dim
    table, so the join is shuffle-free on the pages side."""
    spark = df.sparkSession
    if isinstance(blocked_domains, list):
        blocked = spark.createDataFrame(
            [(d.lower(),) for d in blocked_domains], ["reg_domain"])
    else:
        # lowercase the DataFrame path too, or a mixed-case blocklist
        # silently blocks nothing (the join key is lowercased host)
        blocked = blocked_domains.toDF("reg_domain").select(
            F.lower("reg_domain").alias("reg_domain"))
    tagged = df.withColumn(
        "_rd", F.regexp_extract(
            F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1)),
            _REGDOM_RE, 1))
    how = "semi" if keep_blocked else "anti"
    return tagged.join(F.broadcast(blocked),
                       tagged["_rd"] == blocked["reg_domain"],
                       how).drop("_rd")
