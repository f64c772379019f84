"""URL analytics (orc_haskell_spark/pipeline/urls.py): parsing and
canonicalization goldens, a DuckDB mirror (the expressions are in the
regex common subset, so an exact SQL twin must agree value-for-value),
domain aggregation, and the broadcast-anti-join blocklist plan."""

from __future__ import annotations

from orc_haskell_spark.pipeline import urls

URLS = [
    "https://crawl.example/web/42",
    "HTTP://Example.COM:80/a/b?q=1#frag",
    "https://sub.domain.co.uk/",
    "https://h:8443/p",
    "http://one.two",
    "https://x.y/path?a=1&b=2",
]


def _df(spark):
    return spark.createDataFrame([(i, u) for i, u in enumerate(URLS)],
                                 ["page_id", "url"])


def test_url_parts_golden(spark):
    got = {r.page_id: r for r in urls.url_parts(_df(spark), "url").collect()}
    r = got[1]  # HTTP://Example.COM:80/a/b?q=1#frag
    assert (r.scheme, r.host, r.port) == ("http", "example.com", 80)
    assert (r.path, r.query, r.reg_domain) == ("/a/b", "q=1",
                                               "example.com")
    assert got[0].port is None and got[0].query is None
    assert got[2].reg_domain == "co.uk"  # two-label heuristic, documented
    assert got[4].path == "/"
    assert got[5].query == "a=1&b=2"


def test_normalize_urls_golden(spark):
    got = {r.page_id: r.url
           for r in urls.normalize_urls(_df(spark), "url").collect()}
    assert got[1] == "http://example.com/a/b?q=1"   # case, :80, fragment
    assert got[3] == "https://h:8443/p"             # non-default port kept
    assert got[4] == "http://one.two/"              # empty path -> /
    assert got[0] == "https://crawl.example/web/42"


def test_normalize_passes_garbage_through(spark):
    """Non-absolute-URL strings must come back unchanged, never be
    collapsed into a fabricated ':///' canonical form."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "not a url"), (4, "https://")],
        "page_id long, url string")
    got = {r.page_id: r.url
           for r in urls.normalize_urls(df, "url").collect()}
    assert got == {1: "", 2: None, 3: "not a url", 4: "https://"}


def test_url_parts_match_duckdb_twin(spark):
    import duckdb

    sdf = urls.url_parts(_df(spark), "url").toPandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE u (page_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)",
                    [(i, x) for i, x in enumerate(URLS)])
    odf = con.execute(r"""
SELECT page_id, url,
  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
  lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
    AS host,
  CASE WHEN regexp_extract(url,
       '^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)', 1) = '' THEN NULL
       ELSE CAST(regexp_extract(url,
       '^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)', 1) AS INT)
  END AS port,
  CASE WHEN regexp_extract(regexp_extract(url,
       '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1), '^([^?]*)', 1) = ''
       THEN '/' ELSE regexp_extract(regexp_extract(url,
       '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1), '^([^?]*)', 1)
  END AS path,
  CASE WHEN regexp_extract(regexp_extract(url,
       '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1), '\?(.*)$', 1) = ''
       THEN NULL ELSE regexp_extract(regexp_extract(url,
       '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1), '\?(.*)$', 1)
  END AS query,
  regexp_extract(lower(regexp_extract(url,
       '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)), '([^.]+\.[^.]+)$', 1)
    AS reg_domain
FROM u ORDER BY page_id""").df()
    s = sdf.sort_values("page_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(s[odf.columns], odf, check_dtype=False)


def test_domain_stats(spark):
    df = spark.createDataFrame([
        (1, "https://a.example/x", 10),
        (2, "https://a.example/y", 20),
        (3, "https://a.example/y", 5),
        (4, "https://b.other/z", 7),
    ], ["page_id", "url", "n_bytes"])
    got = {r.host: r for r in
           urls.domain_stats(df, "url", "n_bytes").collect()}
    assert got["a.example"].pages == 3
    assert got["a.example"].distinct_paths == 2
    assert got["a.example"].total_size == 35
    assert got["b.other"].reg_domain == "b.other"


def test_blocklist_filter_drops_subdomains_broadcast(spark):
    df = spark.createDataFrame([
        (1, "https://ads.tracker.net/p"),
        (2, "https://tracker.net/q"),
        (3, "https://keep.example/r"),
    ], ["page_id", "url"])
    out = urls.blocklist_filter(df, "url", ["Tracker.NET"])
    assert [r.page_id for r in out.orderBy("page_id").collect()] == [3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    kept = urls.blocklist_filter(df, "url", ["tracker.net"],
                                 keep_blocked=True)
    assert [r.page_id for r in kept.orderBy("page_id").collect()] == [1, 2]
    assert "_rd" not in out.columns
