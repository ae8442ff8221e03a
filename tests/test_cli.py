"""CLI parity/behavior tests (python -m bwt_tpu <cmd>)."""

import os
import subprocess
import sys

import pytest

from oracle import run

CLI = [sys.executable, "-m", "bwt_tpu", "--platform", "cpu"]


def _clean_env():
    # The environment's TPU-plugin sitecustomize (on PYTHONPATH)
    # registers a PJRT tunnel in every python process and can deadlock
    # CPU-only subprocesses; strip it for deterministic CLI runs.
    env = dict(os.environ)
    parts = [p for p in env.get("PYTHONPATH", "").split(":") if p]
    env["PYTHONPATH"] = ":".join(p for p in parts if ".axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _cli(*args, **kw):
    return subprocess.run(
        CLI + [str(a) for a in args],
        capture_output=True, check=True, cwd="/root/repo",
        env=_clean_env(), timeout=300, **kw,
    )


@pytest.mark.parametrize(
    "text", ["mississippi", "banana", "AACGT", "a", "abracadabra"]
)
def test_bwt_cli_stdout_parity(text):
    want = run("bwt", text)
    got = _cli("bwt", text).stdout
    assert got == want


def test_build_index_cli_byte_parity(tmp_path):
    from bwt_tpu import codec
    from oracle import oracle

    g = codec.random_genome(5000, seed=11)
    seqfile = tmp_path / "g.txt"
    seqfile.write_text(g)
    ours = tmp_path / "ours.idx"
    ref = tmp_path / "ref.idx"
    _cli("build_index", seqfile, ours)
    subprocess.run(
        [str(oracle("build_index")), str(seqfile), str(ref)],
        check=True, capture_output=True,
    )
    assert ours.read_bytes() == ref.read_bytes()


def test_single_align_cli(tmp_path):
    import numpy as np

    from bwt_tpu import codec

    g = codec.random_genome(8000, seed=12)
    rng = np.random.default_rng(0)
    reads = []
    for _ in range(5):
        j = int(rng.integers(0, 8000 - 60))
        reads.append(g[j : j + 60])
    seqfile = tmp_path / "g.txt"
    seqfile.write_text(g)
    readfile = tmp_path / "r.txt"
    readfile.write_text("\n".join(reads) + "\n")
    res = _cli("single_align", seqfile, readfile)
    lines = res.stdout.decode().splitlines()
    assert len(lines) == 10  # pos + cigar per read
    assert b"5 of 5 reads aligned" in res.stderr


def test_gen_seq_fil_roundtrip(tmp_path):
    out = _cli("gen_seq", 500, "--seed", 7).stdout.decode()
    assert len(out) == 500 and set(out) <= set("ACGT")
    fa = tmp_path / "x.fa"
    fa.write_text(">chr1 test\n" + out[:100].lower() + "\nNNN\n")
    sq = tmp_path / "x.sq"
    _cli("fil", fa, sq)
    txt = sq.read_text()
    # fil.cc: a/c/t uppercased, g and N -> 'G'
    assert len(txt) == 103
    assert set(txt) <= set("ACGT")


def test_searchtest_cli():
    res = _cli("searchtest", "--length", 20000, "--queries", 2000, "--batch", 1024)
    assert b"Ruh roh" not in res.stdout
    assert b"0 mismatches" in res.stderr


def test_locate_and_search_reads_cli(tmp_path):
    import numpy as np

    from bwt_tpu import codec

    g = codec.random_genome(6000, seed=21)
    seqfile = tmp_path / "g.txt"
    seqfile.write_text(g)
    reads = [g[100:160], g[2000:2060], "ACGT" * 15]
    readfile = tmp_path / "r.txt"
    readfile.write_text("\n".join(reads) + "\n")
    out = _cli("locate", seqfile, readfile).stdout.decode().split()
    assert int(out[0]) == 100 and int(out[1]) == 2000
    res = _cli("search_reads", seqfile, readfile)
    assert res.stdout.decode().startswith("Beginning alignment\n")
    res = _cli("rnaseq", seqfile, readfile)
    vals = [int(x) for x in res.stdout.split()]
    assert len(vals) == 3


def test_selftest_clis(tmp_path):
    """The reference Makefile's self-test targets as subcommands:
    satest (histtest role), gaptest, filetest, index_test."""
    from bwt_tpu import codec

    res = _cli("satest", "--length", 8000)
    assert b"exact check: ok" in res.stderr
    assert b"cross-check: ok" in res.stderr

    # observational probe (the reference prints for eyeballing,
    # gaptest.c:79-116): a junction-spanning mms can legitimately
    # match beyond the planted half, so don't demand full recovery
    res = _cli("gaptest", "--length", 8000, "--queries", 2)
    assert b"halves recovered" in res.stderr
    assert res.stdout.decode().count("Second half") == 2

    g = codec.random_genome(5000, seed=31)
    seqfile = tmp_path / "g.txt"
    seqfile.write_text(g)
    res = _cli("filetest", seqfile, "--queries", 50)
    assert b"0 mismatches" in res.stderr

    idx = tmp_path / "g.idx"
    _cli("build_index", seqfile, idx)
    res = _cli("index_test", seqfile, idx, "--queries", 200)
    assert b"0 mismatches" in res.stderr
