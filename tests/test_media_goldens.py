"""The media oracles pin the lossy/float decode paths (jpeg, y4m,
mjpeg) as FROZEN GOLDENS inside the oracle SQL strings — constants no
SQL recomputes. This suite recomputes each golden driver-side from the
same fixture generator + decoders the Spark query uses, then parses
the constants back OUT of the oracle SQL, so a drift on either side
(decoder change, fixture change, or a mis-frozen constant — round 5
shipped one: jpeg 18125454 vs the reproducible 18125099) fails here
before the driver gate ever runs."""

from __future__ import annotations

import re

import numpy as np
import pytest

from orc_haskell_spark.pipeline import multimodal
from orc_haskell_spark.pipeline.jpeg import decode_jpeg
from orc_haskell_spark.pipeline.video import (decode_video_frame,
                                              video_timing)

N_ITEMS = 300  # the gate query's real_media_df(spark, 300, 4)


@pytest.fixture(scope="module")
def fixture_rows():
    b = multimodal.synth_real_media_batch(0, N_ITEMS)
    return (b.column("id").to_pylist(), b.column("kind").to_pylist(),
            b.column("payload").to_pylist(),
            [m["codec"] for m in b.column("meta").to_pylist()])


def _oracle_consts():
    import __spark_entry__ as e

    sqls = e.oracle_sql()
    dec = sqls["media_decode"]
    out = {}
    for codec in ("jpeg", "y4m", "mjpeg"):
        m = re.search(rf"'{codec}', (\d+), (\d+)", dec)
        assert m, f"frozen {codec} row missing from media_decode oracle"
        out[codec] = (int(m.group(1)), int(m.group(2)))
    frames = sqls["media_frame_sample"]
    m = re.search(r"WHEN 'y4m' THEN (\d+)\s+ELSE (\d+) END::BIGINT", frames)
    assert m, "frame checksum goldens missing"
    out["frames_checksum"] = {"y4m": int(m.group(1)),
                              "mjpeg": int(m.group(2))}
    m = re.search(r"WHEN 'y4m' THEN ([\d.]+)\s+ELSE ([\d.]+) END AS DOUBLE",
                  frames)
    assert m, "frame luma goldens missing"
    out["frames_luma"] = {"y4m": float(m.group(1)),
                          "mjpeg": float(m.group(2))}
    return out


def test_media_decode_frozen_goldens(fixture_rows):
    ids, kinds, payloads, codecs = fixture_rows
    got = {"jpeg": [0, 0], "y4m": [0, 0], "mjpeg": [0, 0]}
    for i in range(N_ITEMS):
        if kinds[i] == "image" and payloads[i][:2] == b"\xff\xd8":
            key = "jpeg"
            px = decode_jpeg(payloads[i]).ravel()
        elif kinds[i] == "video":
            key = codecs[i]
            # extract_features' real path decodes frame 0 per clip
            px = decode_video_frame(payloads[i], 0).ravel()
        else:
            continue
        got[key][0] += 1
        got[key][1] += int(px.astype(np.int64).sum())
    consts = _oracle_consts()
    for codec in ("jpeg", "y4m", "mjpeg"):
        assert tuple(got[codec]) == consts[codec], (
            f"{codec}: recomputed (items, checksum_sum)={tuple(got[codec])}"
            f" != oracle frozen {consts[codec]} — re-freeze the oracle"
            " constant or find what changed the decode path")


def test_frame_sample_frozen_goldens(fixture_rows):
    ids, kinds, payloads, codecs = fixture_rows
    sums = {"y4m": 0, "mjpeg": 0}
    lumas = {"y4m": 0.0, "mjpeg": 0.0}
    for i in range(N_ITEMS):
        if kinds[i] != "video":
            continue
        blob = payloads[i]
        nframes, uspf = video_timing(blob)
        dur_ms = nframes * uspf // 1000
        for ms in range(0, dur_ms + 1, 100):  # gate query: every_ms=100
            k = min(ms * 1000 // uspf, nframes - 1)
            px = decode_video_frame(blob, k)
            sums[codecs[i]] += int(px.astype(np.int64).sum())
            lumas[codecs[i]] += float(px[..., 0].mean())
    consts = _oracle_consts()
    assert sums == consts["frames_checksum"]
    for codec in ("y4m", "mjpeg"):
        # the oracle (and Spark query) round the luma SUM to 3 places
        assert round(lumas[codec], 3) == consts["frames_luma"][codec]
