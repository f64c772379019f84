"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio libraries, so the *decode* step is
stubbed (``NotImplementedError`` behind ``use_real_decoders``) or a
deterministic fake; everything Spark-side is real and tested — schema,
partitioning, mapInArrow batch shapes, feature vector plumbing. Swapping
in Pillow/ffmpeg later only changes the numpy kernel body.

Schema convention:
  media(id bigint, kind string in {image,audio,video},
        payload binary, meta struct<width int, height int,
        sample_rate int, duration_ms int, codec string>)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

MEDIA_DDL = ("id bigint, kind string, payload binary, "
             "meta struct<width:int, height:int, sample_rate:int, "
             "duration_ms:int, codec:string>")
FEATURE_DDL = "id bigint, kind string, dim int, feature array<float>, checksum bigint"

_FEAT_DIM = 32


def synth_media_batch(start: int, n: int) -> pa.RecordBatch:
    """Deterministic fake media rows (counter-indexed like gen.py)."""
    ids = np.arange(start, start + n, dtype=np.int64)
    kinds = np.array(["image", "audio", "video"], dtype=object)[ids % 3]
    rng_bytes = [
        (np.arange(256 + (i % 2048), dtype=np.int64) * (i * 2 + 1) % 251)
        .astype(np.uint8).tobytes() for i in ids
    ]
    metas = pa.array(
        [{"width": int(64 + i % 512), "height": int(64 + (i * 7) % 512),
          "sample_rate": 16000, "duration_ms": int(1000 + i % 9000),
          "codec": "fake"} for i in ids],
        pa.struct([("width", pa.int32()), ("height", pa.int32()),
                   ("sample_rate", pa.int32()), ("duration_ms", pa.int32()),
                   ("codec", pa.string())]))
    return pa.RecordBatch.from_arrays(
        [pa.array(ids), pa.array(kinds, pa.string()),
         pa.array(rng_bytes, pa.binary()), metas],
        names=["id", "kind", "payload", "meta"])


def media_df(spark, n_rows: int, num_partitions: int | None = None):
    def gen_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("id").to_numpy()
            if len(ids):
                yield synth_media_batch(int(ids[0]), len(ids))

    return spark.range(0, n_rows, 1, num_partitions).mapInArrow(gen_fn, MEDIA_DDL)


def decode_image(payload: bytes, meta: dict) -> np.ndarray:
    """Real image decode — STUB: no imaging library in this container.

    The production body is `PIL.Image.open(io.BytesIO(payload))`; the
    deterministic fake below keeps the pipeline testable end-to-end.
    """
    raise NotImplementedError(
        "image decoding requires Pillow/libvips; use fake_decode for tests")


def fake_decode(payload: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic fake 'pixels': tile payload bytes to width*height."""
    need = width * height
    reps = need // max(payload.size, 1) + 1
    return np.tile(payload, reps)[:need].reshape(height, width)


def extract_features(media, use_real_decoders: bool = False):
    """media DataFrame -> per-item feature vectors via mapInArrow.

    Features: 32-bin byte histogram of the decoded (fake) pixels,
    L1-normalized — a stand-in with the exact batch shape a CLIP-style
    embedder would have (binary in, fixed-dim float vector out).
    """

    def feature_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from orc_haskell_spark.codecs.strings import string_parts
        from orc_haskell_spark.engine import clamp_worker_threads

        clamp_worker_threads()
        for b in batches:
            n = b.num_rows
            if use_real_decoders:
                decode_image(b"", {})  # raises: stub
            data, lengths = string_parts(b.column("payload"))
            # vectorized per-row byte histogram: one bincount over
            # (row_id * DIM + bucket) — no per-row Python
            row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
            combined = row_of * _FEAT_DIM + (data >> np.uint8(3)).astype(np.int64)
            hist = np.bincount(combined, minlength=n * _FEAT_DIM) \
                .reshape(n, _FEAT_DIM).astype(np.float64)
            hist /= np.maximum(hist.sum(axis=1, keepdims=True), 1)
            feats = hist.astype(np.float32)
            # checksum of the (virtually tiled) pixels: payload byte sum
            # scaled by the tile repetition count
            widths = b.column("meta").field("width").to_numpy(zero_copy_only=False)
            heights = b.column("meta").field("height").to_numpy(zero_copy_only=False)
            need = widths.astype(np.int64) * heights
            sums = np.add.reduceat(
                data.astype(np.int64),
                np.concatenate(([0], np.cumsum(lengths)[:-1]))
            ) if data.size else np.zeros(n, dtype=np.int64)
            sums = np.where(lengths > 0, sums, 0)  # reduceat quirk on empties
            # exact tiled sum: full_reps * payload_sum + partial prefix sum
            csum = np.concatenate(([0], np.cumsum(data.astype(np.int64))))
            starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
            full = need // np.maximum(lengths, 1)
            rem = need % np.maximum(lengths, 1)
            checks = full * sums + (csum[starts + rem] - csum[starts])
            off = np.arange(0, (n + 1) * _FEAT_DIM, _FEAT_DIM, dtype=np.int32)
            flist = pa.ListArray.from_arrays(
                pa.array(off), pa.array(feats.ravel()), type=pa.list_(pa.float32()))
            yield pa.RecordBatch.from_arrays(
                [b.column("id"), b.column("kind"),
                 pa.array(np.full(n, _FEAT_DIM, dtype=np.int32)),
                 flist, pa.array(checks, pa.int64())],
                names=["id", "kind", "dim", "feature", "checksum"])

    return media.mapInArrow(feature_fn, FEATURE_DDL)


def frame_sample(media, every_ms: int = 1000):
    """Video frame sampling plan: one row per sampled frame timestamp.

    Real decoding is stubbed; the Spark-side explode of frame timestamps
    (the partition-heavy part) is real.
    """
    from pyspark.sql import functions as F

    return (media.filter(F.col("kind") == "video")
            .withColumn("frame_ms", F.explode(F.sequence(
                F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))))
            .select("id", "frame_ms", F.col("meta.codec").alias("codec")))
