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


def test_load_fastq_matches_manual(tmp_path, rng):
    from bwt_tpu import codec, native

    seqs = []
    lines = []
    for i in range(5):
        n = int(rng.integers(5, 30))
        s = "".join("ACGTN"[int(c)] for c in rng.integers(0, 5, size=n))
        seqs.append(s)
        lines += [f"@r{i}", s, "+", "I" * n]
    p = tmp_path / "r.fq"
    p.write_text("\n".join(lines) + "\n")
    codes, lens = native.load_fastq(p)
    assert codes.shape[0] == 5
    for b, s in enumerate(seqs):
        assert lens[b] == len(s)
        assert np.array_equal(
            codes[b, : lens[b]], codec.encode_read(s).astype(np.int32)
        )
    # cross-check the record framing independently
    lines2 = p.read_text().splitlines()
    seqs2 = [lines2[i] for i in range(1, len(lines2), 4) if lines2[i]]
    assert seqs2 == seqs
