"""Native loader vs pure-Python codec equivalence."""

import numpy as np

from bwt_tpu import codec
from bwt_tpu import native


def test_native_lib_builds():
    assert native.available()


def test_genome_load_matches_codec(tmp_path):
    g = codec.random_genome(5000, seed=1) + "NnxY"  # junk -> 'A'
    p = tmp_path / "g.txt"
    p.write_text(g + "\n")
    got = native.load_genome(p)
    want = codec.encode_genome(g)
    assert np.array_equal(got, want)


def test_reads_load_matches_codec(tmp_path, rng):
    reads = []
    for _ in range(20):
        n = int(rng.integers(1, 80))
        reads.append(
            "".join("ACGTN"[int(c)] for c in rng.integers(0, 5, size=n))
        )
    p = tmp_path / "r.txt"
    p.write_text("\n".join(reads) + "\n")
    codes, lens = native.load_reads(p)
    assert codes.shape[0] == len(reads)
    for b, r in enumerate(reads):
        assert lens[b] == len(r)
        assert np.array_equal(codes[b, : len(r)], codec.encode_read(r))
        assert (codes[b, len(r):] == 0).all()


def test_fasta_matches_codec():
    fa = ">hdr one\nacgTNnXy\n>hdr two\nGGaa ttC\n"
    assert native.fasta_to_text(fa) == codec.fasta_to_text(fa)


def test_packers_match_codec(rng):
    codes = rng.integers(0, 4, size=1001).astype(np.uint8)
    assert np.array_equal(native.pack_words(codes), codec.pack_words(codes))
    assert np.array_equal(
        native.pack_ref_bytes(codes), codec.pack_ref_bytes(codes)
    )
