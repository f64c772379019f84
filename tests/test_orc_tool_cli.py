"""scripts/orc_tool.py — CLI parity with the reference binary's
json/type/reencode/roundtrip commands (/root/reference/main/main.hs:
20-27), smoke-tested against a C++-written ORC file."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.orc as paorc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "orc_tool.py"),
         *args], capture_output=True, text=True, timeout=180, env=env)


def _cpp_file(tmp_path) -> tuple[str, pa.Table]:
    t = pa.table({
        "id": pa.array(range(40), pa.int64()),
        "name": pa.array([f"n{i}" for i in range(40)]),
        "tags": pa.array([[f"t{i}", f"u{i}"] for i in range(40)],
                         pa.list_(pa.string())),
        "props": pa.array([{"s": i, "d": float(i) / 2}
                           for i in range(40)],
                          pa.struct([("s", pa.int32()),
                                     ("d", pa.float64())]))})
    p = str(tmp_path / "cpp.orc")
    paorc.write_table(t, p, compression="zlib")
    return p, t


def test_type_command(tmp_path):
    p, _ = _cpp_file(tmp_path)
    r = _run("type", p)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == (
        "struct<id:bigint,name:string,tags:array<string>,"
        "props:struct<s:int,d:double>>")
    assert "rows: 40" in r.stderr and "stripes: 1" in r.stderr


def test_json_command_streams_rows(tmp_path):
    p, t = _cpp_file(tmp_path)
    r = _run("json", p)
    assert r.returncode == 0, r.stderr
    lines = [json.loads(x) for x in r.stdout.splitlines()]
    assert len(lines) == 40
    assert lines[3] == {"id": 3, "name": "n3", "tags": ["t3", "u3"],
                        "props": {"s": 3, "d": 1.5}}


def test_reencode_and_roundtrip(tmp_path):
    p, t = _cpp_file(tmp_path)
    re_p = str(tmp_path / "re.orc")
    rt_p = str(tmp_path / "rt.orc")
    r1 = _run("reencode", p, re_p, "--compression", "zstd")
    assert r1.returncode == 0, r1.stderr
    assert "1 stripe(s)" in r1.stderr and "ZSTD" in r1.stderr
    r2 = _run("roundtrip", p, rt_p, "--chunk-size", "7")
    assert r2.returncode == 0, r2.stderr
    assert "6 stripe(s)" in r2.stderr       # ceil(40/7)
    for q in (re_p, rt_p):
        got = paorc.ORCFile(q).read()
        assert got.cast(t.schema).to_pydict() == t.to_pydict()


def test_reencode_preserves_uneven_stripes(tmp_path):
    """Input stripes [3, 10] must come out as [3, 10] — not merged by
    the rechunker (writers flushing on memory pressure produce
    non-uniform non-final stripes)."""
    from orc_haskell_spark.orcfile.writer import write_orc

    t = pa.table({"v": pa.array(range(13), pa.int64())})
    p = str(tmp_path / "uneven.orc")
    write_orc(iter([t.slice(0, 3).to_batches()[0],
                    t.slice(3, 10).to_batches()[0]]),
              p, compression="NONE", rechunk=False)
    f = paorc.ORCFile(p)
    assert f.nstripes == 2
    assert [len(f.read_stripe(0)), len(f.read_stripe(1))] == [3, 10]
    out = str(tmp_path / "re.orc")
    r = _run("reencode", p, out, "--compression", "zstd")
    assert r.returncode == 0, r.stderr
    g = paorc.ORCFile(out)
    assert g.nstripes == 2
    assert [len(g.read_stripe(0)), len(g.read_stripe(1))] == [3, 10]
    assert g.read().to_pydict() == t.to_pydict()


def test_json_preserves_nested_union_tags(tmp_path):
    """Unions nested under struct/list keep their {tag, value} form
    (the to_pylist fast path would print the bare value)."""
    from orc_haskell_spark.orcfile.writer import write_orc

    tags = pa.array([0, 1, 0], pa.int8())
    offs = pa.array([0, 0, 1], pa.int32())
    u = pa.UnionArray.from_dense(
        tags, offs, [pa.array([7, 9], pa.int64()),
                     pa.array(["a"], pa.string())])
    st = pa.StructArray.from_arrays([u], names=["u"])
    batch = pa.record_batch([st], names=["s"])
    p = str(tmp_path / "nested_union.orc")
    write_orc(batch, p, compression="NONE")
    r = _run("json", p)
    assert r.returncode == 0, r.stderr
    rows = [json.loads(x) for x in r.stdout.splitlines()]
    assert rows == [{"s": {"u": {"tag": 0, "value": 7}}},
                    {"s": {"u": {"tag": 1, "value": "a"}}},
                    {"s": {"u": {"tag": 0, "value": 9}}}]


def test_json_broken_pipe_exits_zero(tmp_path):
    """orc_tool json big | head must exit 0 under pipefail semantics."""
    import pyarrow.parquet as pq

    p, _ = _cpp_file(tmp_path)
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        f"{sys.executable} {os.path.join(REPO, 'scripts', 'orc_tool.py')}"
        f" json {p} | head -1; exit ${{PIPESTATUS[0]}}",
        shell=True, executable="/bin/bash",
        capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 0, (r.returncode, r.stderr[-500:])
