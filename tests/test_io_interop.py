"""Index-file interop in BOTH directions (the index_test.c / filetest.c
configs): our writer vs the C writer byte-for-byte, and our reader
loading a C-written index with full query equivalence."""

import subprocess

import numpy as np

import bwt_tpu
from bwt_tpu import codec
from bwt_tpu import io as bio
from bwt_tpu.ops import search

from oracle import oracle


def test_read_c_written_index(tmp_path, rng):
    g = codec.random_genome(12000, seed=77)
    seqfile = tmp_path / "g.txt"
    seqfile.write_text(g)
    refidx = tmp_path / "ref.idx"
    subprocess.run(
        [str(oracle("build_index")), str(seqfile), str(refidx)],
        check=True, capture_output=True,
    )
    fmi = bio.read_ref_index(refidx)  # load the C binary's file
    native = bwt_tpu.build_index(g)
    assert fmi.length == native.length
    assert np.array_equal(np.asarray(fmi.buckets), np.asarray(native.buckets))
    assert np.array_equal(np.asarray(fmi.C), np.asarray(native.C))
    # locate round-trip through the loaded index (index_test.c:90-101)
    codes = codec.encode_genome(g)
    B = 50
    pats = np.zeros((B, 30), np.int32)
    starts = np.zeros((B,), np.int64)
    for b in range(B):
        j = int(rng.integers(0, len(g) - 30))
        pats[b] = codes[j : j + 30]
        starts[b] = j
    lens = np.full((B,), 30, np.int32)
    pos = np.asarray(search.locate(fmi, pats, lens))
    for b in range(B):
        assert np.array_equal(codes[pos[b] : pos[b] + 30], pats[b])


def test_truncated_index_raises_clear_error(tmp_path):
    """A short file must raise a clear ValueError at every truncation
    point (the reference detects short reads and returns NULL,
    fileio.c:57-60) instead of a bare frombuffer failure mid-parse."""
    import pytest

    g = codec.random_genome(4000, seed=7)
    fmi = bwt_tpu.build_index(g)
    p = tmp_path / "full.idx"
    bio.write_ref_index(fmi, p)
    raw = p.read_bytes()
    # cut inside each section: length, C, endloc, SA samples, BWT
    for cut in (2, 10, 26, 30, 200, len(raw) - 5):
        t = tmp_path / f"cut{cut}.idx"
        t.write_bytes(raw[:cut])
        with pytest.raises(ValueError, match="Could not read index"):
            bio.read_ref_index(t)
    # sanity: the full file still loads
    assert bio.read_ref_index(p).length == fmi.length


def test_write_read_roundtrip_tmpfile(tmp_path, rng):
    # filetest.c:16-19 — write, read back, query check
    g = codec.random_genome(6000, seed=13)
    fmi = bwt_tpu.build_index(g)
    p = tmp_path / "rt.idx"
    bio.write_ref_index(fmi, p)
    back = bio.read_ref_index(p)
    codes = codec.encode_genome(g)
    pats = np.zeros((30, 16), np.int32)
    for b in range(30):
        j = int(rng.integers(0, len(g) - 16))
        pats[b] = codes[j : j + 16]
    lens = np.full((30,), 16, np.int32)
    assert np.array_equal(
        np.asarray(search.locate(fmi, pats, lens)),
        np.asarray(search.locate(back, pats, lens)),
    )


def test_megabase_index_byte_parity(tmp_path):
    """BASELINE config 2: 1 Mbase gen_seq genome — full SA/BWT/index
    parity vs the C reference (SACA-K path) at scale."""
    g = codec.random_genome(1_000_000, seed=2024)
    seqfile = tmp_path / "mb.txt"
    seqfile.write_text(g)
    fmi = bwt_tpu.build_index(g)
    ours = tmp_path / "ours.idx"
    bio.write_ref_index(fmi, ours)
    ref = tmp_path / "ref.idx"
    subprocess.run(
        [str(oracle("build_index")), str(seqfile), str(ref)],
        check=True, capture_output=True,
    )
    assert ours.read_bytes() == ref.read_bytes()
