"""Streaming WARC source (orc_haskell_spark/warc_stream.py): filename
watermarks as offsets, exactly-once drains across checkpoints, fused
extraction, admission control, and the documented late-file skip."""

from __future__ import annotations

import pytest

from orc_haskell_spark import warc
from orc_haskell_spark.warc_stream import WarcStreamDataSource


def _mk_warc(path, doc_ids):
    rows = [(f"https://crawl.example/web/{i}", 1_700_000_000_000_000 + i,
             (f"<html><body><main>doc {i} body text</main>"
              f"</body></html>").encode())
            for i in doc_ids]
    warc.write_warc_file(str(path), rows)


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    _mk_warc(d / "crawl-0001.warc.gz", range(0, 3))
    return d


def _drain(spark, src_dir, out, ckpt, **opts):
    reader = spark.readStream.format("warc_stream")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (reader.load(str(src_dir))
         .writeStream.format("parquet")
         .option("path", str(out)).option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_stream_exactly_once_across_drains(spark, landing, tmp_path):
    spark.dataSource.register(WarcStreamDataSource)
    out, ckpt = tmp_path / "sink", tmp_path / "ckpt"
    _drain(spark, landing, out, ckpt)
    got = spark.read.parquet(str(out))
    assert got.count() == 3
    assert set(got.columns) == {"url", "warc_ts", "status",
                                "content_type", "html"}
    # idle re-drain: no new files -> no duplicate rows
    _drain(spark, landing, out, ckpt)
    assert spark.read.parquet(str(out)).count() == 3
    # a new archive lands AFTER the first drain; same checkpoint
    _mk_warc(landing / "crawl-0002.warc.gz", range(10, 12))
    _drain(spark, landing, out, ckpt)
    got2 = spark.read.parquet(str(out))
    assert got2.count() == 5                       # exactly once
    urls = {r.url for r in got2.collect()}
    assert "https://crawl.example/web/11" in urls
    # documented limit: a file sorting BELOW the watermark is skipped
    _mk_warc(landing / "crawl-0000.warc.gz", [99])
    _drain(spark, landing, out, ckpt)
    assert spark.read.parquet(str(out)).count() == 5


def test_stream_subdirectory_batches_not_lost(spark, tmp_path):
    """Watermarks are RELATIVE PATHS: two crawl batches in fresh
    subdirectories reuse the same part basenames (write_warc restarts
    at 00000 per dir) and must both be ingested."""
    spark.dataSource.register(WarcStreamDataSource)
    land = tmp_path / "landing"
    (land / "day=01").mkdir(parents=True)
    _mk_warc(land / "day=01" / "00000.warc.gz", range(0, 2))
    out, ckpt = tmp_path / "sink", tmp_path / "ckpt"
    _drain(spark, land, out, ckpt)
    assert spark.read.parquet(str(out)).count() == 2
    (land / "day=02").mkdir()
    _mk_warc(land / "day=02" / "00000.warc.gz", range(10, 13))
    _drain(spark, land, out, ckpt)
    assert spark.read.parquet(str(out)).count() == 5


def test_stream_fused_extraction(spark, landing, tmp_path):
    spark.dataSource.register(WarcStreamDataSource)
    out, ckpt = tmp_path / "sink", tmp_path / "ckpt"
    _drain(spark, landing, out, ckpt, extract="main")
    got = spark.read.parquet(str(out))
    rows = {r.url: r.text for r in got.collect()}
    assert rows["https://crawl.example/web/1"] == "doc 1 body text"
    assert len(rows) == 3


def test_stream_admission_control_loses_nothing(spark, landing, tmp_path):
    spark.dataSource.register(WarcStreamDataSource)
    _mk_warc(landing / "crawl-0002.warc.gz", [20])
    _mk_warc(landing / "crawl-0003.warc.gz", [30])
    out, ckpt = tmp_path / "sink", tmp_path / "ckpt"
    # one file per micro-batch: availableNow still drains everything
    _drain(spark, landing, out, ckpt, max_files_per_batch="1")
    assert spark.read.parquet(str(out)).count() == 5


def test_stream_failed_batch_recovery_two_drains(spark, landing, tmp_path):
    """A torn archive fails a strict drain; the next drain (lenient)
    replays ONLY the pending batch (Spark restart semantics for Python
    sources: latestOffset is not consulted when an uncommitted batch
    exists); the drain after that resumes ingest. Exactly-once holds
    throughout."""
    spark.dataSource.register(WarcStreamDataSource)
    out, ckpt = tmp_path / "sink", tmp_path / "ckpt"
    _drain(spark, landing, out, ckpt, strict="true")
    assert spark.read.parquet(str(out)).count() == 3
    (landing / "crawl-0002.warc.gz").write_bytes(
        b"\x1f\x8b\x08\x00garbage-not-a-warc-member-at-all")
    with pytest.raises(Exception):
        _drain(spark, landing, out, ckpt, strict="true")
    _mk_warc(landing / "crawl-0003.warc.gz", [30])
    # recovery drain: completes the failed batch (garbage skipped)
    _drain(spark, landing, out, ckpt, strict="false")
    assert spark.read.parquet(str(out)).count() == 3
    # resume drain: normal ingest continues from the watermark
    _drain(spark, landing, out, ckpt, strict="false")
    got = spark.read.parquet(str(out))
    assert got.count() == 4
    assert got.filter("url like '%/30'").count() == 1


def test_stream_rejects_bad_options(spark, tmp_path):
    spark.dataSource.register(WarcStreamDataSource)
    with pytest.raises(Exception, match="extract"):
        (spark.readStream.format("warc_stream")
         .option("extract", "nope").load(str(tmp_path)).schema)


def test_crawl_to_encoded_table_end_to_end(spark, landing, tmp_path):
    """The full continuous-ingest composition: WARC archives land ->
    warc_stream (fused extraction) -> stream_encode (ledger-idempotent
    micro-batch encode) -> decode_stream; extracted text comes back
    byte-identical per url (the north rule's invariant), and a second
    archive is encoded incrementally from the same checkpoint."""
    from orc_haskell_spark import streaming

    spark.dataSource.register(WarcStreamDataSource)
    out, ckpt = str(tmp_path / "encoded"), str(tmp_path / "ckpt")
    stream = (spark.readStream.format("warc_stream")
              .option("extract", "main").load(str(landing)))
    schema = stream.schema
    q = streaming.stream_encode(stream, out, checkpoint=ckpt,
                                stripe_rows=500)
    q.awaitTermination(120)
    dec = streaming.decode_stream(spark, out, schema)
    got = {r.url: r.text for r in dec.collect()}
    assert got == {f"https://crawl.example/web/{i}": f"doc {i} body text"
                   for i in range(3)}

    _mk_warc(landing / "crawl-0002.warc.gz", [7])
    q2 = streaming.stream_encode(
        (spark.readStream.format("warc_stream")
         .option("extract", "main").load(str(landing))),
        out, checkpoint=ckpt, stripe_rows=500)
    q2.awaitTermination(120)
    dec2 = streaming.decode_stream(spark, out, schema)
    assert dec2.count() == 4                         # exactly once
    assert {r.text for r in dec2.filter("url like '%/7'").collect()} \
        == {"doc 7 body text"}
