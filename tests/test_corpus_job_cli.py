"""Ship surface: scripts/corpus_job.py — the training-mix builder CLI
chaining quality filter -> decontam -> dedup -> token budgets -> pack
over the real documents table."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH=REPO)
SF = "/root/testdata/sf0.01"


def _run(*args):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         *args],
        capture_output=True, text=True, timeout=900, env=ENV, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    return r


def test_full_chain_over_documents(tmp_path):
    docs = pq.read_table(os.path.join(SF, "documents.parquet"))
    # eval set: 5 real texts -> their docs must not survive decontam
    bench = docs.slice(0, 5).select(["doc_id", "text"])
    bench_path = str(tmp_path / "bench.parquet")
    pq.write_table(bench, bench_path)
    out = str(tmp_path / "out")

    r = _run("--input", os.path.join(SF, "documents.parquet"),
             "--output", out,
             "--decontam", bench_path, "--decontam-n", "8",
             "--dedup",
             "--sample-tokens", "en=3000,de=1200",
             "--pack", "128", "--pack-shard-col", "lang")
    stats = json.loads(r.stdout.split("stats: ", 1)[1].splitlines()[0])

    # counts shrink monotonically through the chain
    seq = [stats["input_rows"], stats["after_decontam"],
           stats["after_dedup"], stats["after_sample"]]
    assert seq == sorted(seq, reverse=True) and seq[-1] > 0

    mix = pq.read_table(os.path.join(out, "mix"))
    # decontaminated: the 5 seeded ids are gone
    seeded = set(bench.column("doc_id").to_pylist())
    assert not seeded & set(mix.column("doc_id").to_pylist())
    # sampled: only budgeted languages survive, within token budget
    by_lang: dict = {}
    for lang, text in zip(mix.column("lang").to_pylist(),
                          mix.column("text").to_pylist()):
        by_lang[lang] = by_lang.get(lang, 0) + len(text.split())
    assert set(by_lang) <= {"en", "de"}
    assert by_lang.get("en", 0) <= 3000 and by_lang.get("de", 0) <= 1200

    # packed: token conservation + every sequence full except per-shard
    # last
    seqs = pq.read_table(os.path.join(out, "sequences"))
    assert stats["sequence_tokens"] == stats["mix_tokens"]
    last = {}
    for sh, sid in zip(seqs.column("shard").to_pylist(),
                       seqs.column("seq_id").to_pylist()):
        last[sh] = max(last.get(sh, -1), sid)
    for sh, sid, n in zip(seqs.column("shard").to_pylist(),
                          seqs.column("seq_id").to_pylist(),
                          seqs.column("n_tokens").to_pylist()):
        assert n == 128 or sid == last[sh]

    # stats.json persisted and matches stdout
    with open(os.path.join(out, "stats.json")) as f:
        assert json.load(f) == stats

    # determinism: a second run into a fresh dir yields the same mix
    out2 = str(tmp_path / "out2")
    _run("--input", os.path.join(SF, "documents.parquet"),
         "--output", out2,
         "--decontam", bench_path, "--decontam-n", "8",
         "--dedup", "--sample-tokens", "en=3000,de=1200")
    mix2 = pq.read_table(os.path.join(out2, "mix"))
    assert sorted(mix.column("doc_id").to_pylist()) == \
        sorted(mix2.column("doc_id").to_pylist())


def test_quality_filter_and_bad_args(tmp_path):
    out = str(tmp_path / "out")
    r = _run("--input", os.path.join(SF, "documents.parquet"),
             "--output", out, "--quality-filter")
    stats = json.loads(r.stdout.split("stats: ", 1)[1].splitlines()[0])
    assert stats["after_quality"] <= stats["input_rows"]
    r_bad = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "corpus_job.py"),
         "--input", os.path.join(SF, "documents.parquet"),
         "--output", str(tmp_path / "x"), "--sample-tokens", "en=abc"],
        capture_output=True, text=True, timeout=120, env=ENV, cwd=REPO)
    assert r_bad.returncode != 0
