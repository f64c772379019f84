"""Ship surface: scripts/ingest_warc.py (WARC -> pages table) chained
into scripts/encode_job.py (pages -> encoded stripes) — the complete
north-rule pipeline driven through its CLIs."""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow.parquet as pq

from orc_haskell_spark import gen, iceberg, warc
from orc_haskell_spark.pipeline import extract

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH=REPO)


def _write_crawl(tmp_path, n=400):
    """Two .warc.gz files of gen pages (html non-null rows only)."""
    t = gen.pages_table(0, n)
    rows = [(u, ts, h) for u, ts, h in zip(
        t.column("url").to_pylist(),
        [int(x.timestamp() * 1e6) for x in t.column("warc_ts").to_pylist()],
        t.column("html").to_pylist()) if h is not None]
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    half = len(rows) // 2
    warc.write_warc_file(str(crawl / "a.warc.gz"), rows[:half])
    warc.write_warc_file(str(crawl / "b.warc.gz"), rows[half:])
    src = {u: (h, x) for u, h, x in zip(t.column("url").to_pylist(),
                                        t.column("html").to_pylist(),
                                        t.column("text").to_pylist())
           if h is not None}
    return crawl, src


def _run(script, *args):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, timeout=600, env=ENV, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    return r


def test_ingest_then_encode_pipeline(tmp_path):
    crawl, src = _write_crawl(tmp_path)
    pages = str(tmp_path / "pages")
    r = _run("ingest_warc.py", "--input", str(crawl), "--output", pages,
             "--partitions", "2", "--extract", "main", "--lang-id",
             "--commit-iceberg")
    assert f"ingested rows={len(src)}" in r.stdout
    assert "iceberg commit: snapshot" in r.stdout

    # the committed Iceberg table holds the input_hint schema with the
    # north rule's invariant: text == main_content(html), byte-exact
    files = iceberg.plan_files(pages)
    assert sum(f["record_count"] for f in files) == len(src)
    got = pq.read_table([f["file_path"] for f in files])
    assert got.column_names == ["url", "warc_ts", "html", "text", "lang"]
    for u, h, x in zip(got.column("url").to_pylist(),
                       got.column("html").to_pylist(),
                       got.column("text").to_pylist()):
        assert (h, x) == (src[u][0], src[u][1])
    assert set(got.column("lang").to_pylist()) <= {"en", "de", "fr", "es",
                                                   "und"}

    # re-commit of the same dir is a no-op (idempotent per part)
    snap = iceberg.commit_parquet_dir(pages, os.path.join(pages, "data"))
    assert snap is None

    # an accidental re-run into the same output fails loudly instead of
    # silently duplicating every row (--append opts in)
    r_dup = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ingest_warc.py"),
         "--input", str(crawl), "--output", pages, "--partitions", "2"],
        capture_output=True, text=True, timeout=600, env=ENV, cwd=REPO)
    assert r_dup.returncode != 0
    assert "already exists" in (r_dup.stderr + r_dup.stdout)

    # chain: encode the ingested Iceberg pages table (fused path)
    out = str(tmp_path / "encoded")
    r2 = _run("encode_job.py", "--input", pages, "--output", out,
              "--fused", "--partitions", "2")
    assert "iceberg snapshot planned:" in r2.stdout
    assert os.path.isdir(os.path.join(out, "stripes"))


def test_encoded_pipeline_output_decodes_back(tmp_path, spark):
    """WARC -> ingest CLI -> encode CLI -> decode in-process: the full
    chain reproduces every url/text byte-identically."""
    from orc_haskell_spark import engine, manifest

    crawl, src = _write_crawl(tmp_path, n=200)
    pages = str(tmp_path / "pages")
    _run("ingest_warc.py", "--input", str(crawl), "--output", pages,
         "--partitions", "2", "--commit-iceberg")
    out = str(tmp_path / "encoded")
    _run("encode_job.py", "--input", pages, "--output", out,
         "--fused", "--partitions", "2")
    enc = manifest.read_fused_encoded(spark, out)
    ingested = spark.read.parquet(os.path.join(pages, "data"))
    dec = engine.decode_table(enc, ingested.schema)
    got = {r.url: r.text for r in dec.collect()}
    assert len(got) == len(src)
    assert all(got[u] == x for u, (_h, x) in src.items())


def test_fused_ingest_matches_jvm_path(tmp_path):
    """--fused (in-worker parquet sink, zero payload crossing) writes
    exactly the rows the JVM write path writes, commits to Iceberg,
    and refuses duplicate re-runs like the default path."""
    crawl, src = _write_crawl(tmp_path, n=300)
    a = str(tmp_path / "pages_jvm")
    b = str(tmp_path / "pages_fused")
    _run("ingest_warc.py", "--input", str(crawl), "--output", a,
         "--partitions", "2")
    r = _run("ingest_warc.py", "--input", str(crawl), "--output", b,
             "--partitions", "2", "--fused", "--commit-iceberg")
    assert f"ingested rows={len(src)}" in r.stdout
    assert "iceberg commit: snapshot" in r.stdout
    ta = pq.read_table(os.path.join(a, "data"))
    tb = pq.read_table(os.path.join(b, "data"))

    def key(t):
        import datetime as dt

        def utc(x):  # Spark writes naive-UTC annotation, ours tz-aware
            return x.replace(tzinfo=dt.timezone.utc) if x.tzinfo is None \
                else x.astimezone(dt.timezone.utc)

        return sorted(zip(t.column("url").to_pylist(),
                          [utc(x) for x in t.column("warc_ts").to_pylist()],
                          t.column("html").to_pylist(),
                          t.column("text").to_pylist(),
                          t.column("lang").to_pylist()))

    assert key(ta) == key(tb)
    # duplicate re-run refused; --lang-id refused
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ingest_warc.py"),
         "--input", str(crawl), "--output", b, "--fused"],
        capture_output=True, text=True, timeout=600, env=ENV, cwd=REPO)
    assert r2.returncode != 0 and "already exists" in (
        r2.stderr + r2.stdout)
    r3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ingest_warc.py"),
         "--input", str(crawl), "--output", str(tmp_path / "x"),
         "--fused", "--lang-id"],
        capture_output=True, text=True, timeout=600, env=ENV, cwd=REPO)
    assert r3.returncode != 0 and "incompatible" in (
        r3.stderr + r3.stdout)


def test_follow_incremental_drains(tmp_path):
    """--follow twice with archives landing in between: the second run
    ingests ONLY the new batch (checkpointed watermark), parts are
    deterministic batch<id>-p<i> names, and each drain lands as one
    idempotent Iceberg append."""
    t = gen.pages_table(0, 240)
    rows = [(u, int(ts.timestamp() * 1e6), h) for u, ts, h in zip(
        t.column("url").to_pylist(), t.column("warc_ts").to_pylist(),
        t.column("html").to_pylist()) if h is not None]
    half = len(rows) // 2
    crawl = tmp_path / "landing"
    (crawl / "batch-001").mkdir(parents=True)
    warc.write_warc_file(str(crawl / "batch-001" / "a.warc.gz"),
                         rows[:half])
    pages = str(tmp_path / "pages")

    r1 = _run("ingest_warc.py", "--input", str(crawl), "--output", pages,
              "--follow", "--extract", "main", "--lang-id",
              "--commit-iceberg")
    assert f"rows={half}" in r1.stdout
    assert "iceberg commit: snapshot" in r1.stdout

    # second crawl batch lands (monotone relpath via fresh subdir)
    (crawl / "batch-002").mkdir()
    warc.write_warc_file(str(crawl / "batch-002" / "b.warc.gz"),
                         rows[half:])
    r2 = _run("ingest_warc.py", "--input", str(crawl), "--output", pages,
              "--follow", "--extract", "main", "--lang-id",
              "--commit-iceberg")
    assert f"rows={len(rows) - half}" in r2.stdout      # new rows only
    assert "iceberg commit: snapshot" in r2.stdout

    files = iceberg.plan_files(pages)
    assert sum(f["record_count"] for f in files) == len(rows)
    got = pq.read_table(os.path.join(pages, "data"))
    assert got.num_rows == len(rows)
    assert sorted(got.column("url").to_pylist()) == sorted(
        u for u, _ts, _h in rows)
    names = os.listdir(os.path.join(pages, "data"))
    assert all(n.startswith("batch") and n.endswith(".parquet")
               for n in names)

    # a third drain with nothing new ingests nothing, commits nothing
    r3 = _run("ingest_warc.py", "--input", str(crawl), "--output", pages,
              "--follow", "--commit-iceberg")
    assert "batch" not in r3.stdout      # no micro-batch fired
    assert "iceberg commit: nothing new" in r3.stdout

    # flag hygiene
    for bad in (["--follow", "--fused"], ["--follow", "--append"],
                ["--poll-interval", "1"]):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "ingest_warc.py"),
             "--input", str(crawl), "--output", pages, *bad],
            capture_output=True, text=True, timeout=120, env=ENV,
            cwd=REPO)
        assert r.returncode != 0


def test_follow_dedup_index_finds_cross_batch_near_dups(tmp_path, spark):
    """--follow --dedup-index: a page recrawled VERBATIM under a new
    url in a later batch is reported as a near-dup pair of that later
    drain; batch-1-internal pairs are reported by drain 1 only."""
    body = ("<html><body><p>" + " ".join(f"tok{i}" for i in range(60))
            + "</p></body></html>").encode()
    other = ("<html><body><p>" + " ".join(f"z{i}" for i in range(60))
             + "</p></body></html>").encode()
    crawl = tmp_path / "landing"
    (crawl / "b1").mkdir(parents=True)
    warc.write_warc_file(str(crawl / "b1" / "a.warc.gz"), [
        ("http://a.example/1", 1_700_000_000_000_000, body),
        ("http://a.example/2", 1_700_000_000_000_000, other)])
    pages = str(tmp_path / "pages")
    idx = str(tmp_path / "mh_index")
    r1 = _run("ingest_warc.py", "--input", str(crawl), "--output", pages,
              "--follow", "--extract", "main", "--dedup-index", idx)
    assert "dup_pairs=0" in r1.stdout          # no dups inside batch 1

    (crawl / "b2").mkdir()
    warc.write_warc_file(str(crawl / "b2" / "b.warc.gz"), [
        ("http://b.example/copy", 1_700_000_100_000_000, body)])
    r2 = _run("ingest_warc.py", "--input", str(crawl), "--output", pages,
              "--follow", "--extract", "main", "--dedup-index", idx)
    assert "dup_pairs=1" in r2.stdout
    got = pq.read_table(os.path.join(pages, "dup_pairs"))
    rows = sorted(zip(got.column("id_a").to_pylist(),
                      got.column("id_b").to_pylist(),
                      got.column("jacc").to_pylist()))
    assert rows == [("http://a.example/1", "http://b.example/copy", 1.0)]
    # flag hygiene: --dedup-index without --follow / without text
    for bad in (["--dedup-index", idx],
                ["--follow", "--extract", "none", "--dedup-index", idx]):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "ingest_warc.py"),
             "--input", str(crawl), "--output", pages, *bad],
            capture_output=True, text=True, timeout=120, env=ENV,
            cwd=REPO)
        assert r.returncode != 0


def test_continuous_pipeline_incremental_encode(tmp_path, spark):
    """The full continuous north-rule chain through its CLIs, twice:
    crawl batch lands -> ingest --follow (only new archives) ->
    encode_job --fused (only new splits: the ledger anti-join skips
    every split the first pass encoded) -> decoded text byte-identical
    across both batches."""
    import ast

    from orc_haskell_spark import engine, manifest

    t = gen.pages_table(3, 200)
    rows = [(u, int(ts.timestamp() * 1e6), h) for u, ts, h in zip(
        t.column("url").to_pylist(), t.column("warc_ts").to_pylist(),
        t.column("html").to_pylist()) if h is not None]
    src = {u: x for u, h, x in zip(t.column("url").to_pylist(),
                                   t.column("html").to_pylist(),
                                   t.column("text").to_pylist())
           if h is not None}
    half = len(rows) // 2
    crawl = tmp_path / "landing"
    (crawl / "batch-001").mkdir(parents=True)
    warc.write_warc_file(str(crawl / "batch-001" / "a.warc.gz"),
                         rows[:half])
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "encoded")

    def summary(r):
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("summary:")][-1]
        return ast.literal_eval(line.split("summary:", 1)[1].strip())

    _run("ingest_warc.py", "--input", str(crawl), "--output", pages,
         "--follow", "--extract", "main", "--commit-iceberg")
    s1 = summary(_run("encode_job.py", "--input", pages, "--output", out,
                      "--fused", "--partitions", "2"))
    assert s1["splits_done_before"] == 0 and s1["splits_encoded"] > 0

    (crawl / "batch-002").mkdir()
    warc.write_warc_file(str(crawl / "batch-002" / "b.warc.gz"),
                         rows[half:])
    _run("ingest_warc.py", "--input", str(crawl), "--output", pages,
         "--follow", "--extract", "main", "--commit-iceberg")
    s2 = summary(_run("encode_job.py", "--input", pages, "--output", out,
                      "--fused", "--partitions", "2"))
    # second pass: every first-pass split skipped, only new ones encoded
    assert s2["splits_done_before"] == s1["splits_encoded"]
    assert s2["splits_encoded"] > 0
    assert s2["splits_total"] == s2["splits_done_before"] \
        + s2["splits_encoded"]

    enc = manifest.read_fused_encoded(spark, out)
    ingested = spark.read.parquet(os.path.join(pages, "data"))
    dec = engine.decode_table(enc, ingested.schema)
    got = {r.url: r.text for r in dec.collect()}
    assert len(got) == len(rows)
    assert all(got[u] == src[u] for u, _ts, _h in rows)


def test_ingest_status_filter_and_lenient(tmp_path):
    crawl, src = _write_crawl(tmp_path, n=120)
    # corrupt one gzip member in file a: lenient run must survive
    import re
    p = crawl / "a.warc.gz"
    raw = bytearray(p.read_bytes())
    starts = [m.start() for m in re.finditer(b"\x1f\x8b\x08", bytes(raw))]
    raw[starts[1] + 24] ^= 0xFF
    p.write_bytes(bytes(raw))
    pages = str(tmp_path / "pages")
    r = _run("ingest_warc.py", "--input", str(crawl), "--output", pages,
             "--partitions", "2", "--extract", "none", "--lenient")
    n = int(r.stdout.split("ingested rows=")[1].split()[0])
    assert 0 < n < len(src)  # lost the corrupt member's stretch only
    t = pq.read_table(os.path.join(pages, "data"))
    assert t.column("text").null_count == t.num_rows  # --extract none
    assert set(t.column("lang").to_pylist()) == {"und"}
