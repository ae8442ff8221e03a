import numpy as np
import pytest

from bwt_tpu import codec


def test_encode_genome_mapping():
    codes = codec.encode_genome("ACGTNX?acgt")
    # non-ACGT (incl. lowercase) -> 0, matching build_index.c:54-88
    assert list(codes) == [0, 1, 2, 3, 0, 0, 0, 0, 0, 0, 0]


def test_encode_read_mapping():
    codes = codec.encode_read("ACGTN?")
    assert list(codes) == [0, 1, 2, 3, 5, 5]


def test_revcomp():
    codes = codec.encode_read("ACGTN")
    rc = codec.revcomp(codes)
    assert list(rc) == [5, 0, 1, 2, 3]  # N,A,C,G,T


def test_ref_byte_layout_matches_getbase():
    # getbase(str, idx) = (byte[idx>>2] >> (2*(3-(idx&3)))) & 3
    codes = np.array([1, 2, 3, 0, 2], dtype=np.uint8)
    packed = codec.pack_ref_bytes(codes)
    assert packed[0] == (1 << 6) | (2 << 4) | (3 << 2) | 0
    assert packed[1] == (2 << 6)
    for i, c in enumerate(codes):
        byte = packed[i >> 2]
        assert ((byte >> (2 * (3 - (i & 3)))) & 3) == c


@pytest.mark.parametrize("n", [0, 1, 3, 4, 15, 16, 17, 63, 64, 100])
def test_pack_roundtrips(rng, n):
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    assert list(codec.unpack_ref_bytes(codec.pack_ref_bytes(codes), n)) == list(codes)
    assert list(codec.unpack_words(codec.pack_words(codes), n)) == list(codes)
    if n:
        w = codec.ref_bytes_to_words(codec.pack_ref_bytes(codes), n)
        assert list(codec.unpack_words(w, n)) == list(codes)
        b = codec.words_to_ref_bytes(codec.pack_words(codes), n)
        assert list(codec.unpack_ref_bytes(b, n)) == list(codes)


def test_word_layout_little_endian_lanes():
    codes = np.zeros(16, dtype=np.uint8)
    codes[0] = 3
    codes[5] = 2
    w = codec.pack_words(codes)[0]
    assert (w >> 0) & 3 == 3
    assert (w >> 10) & 3 == 2


def test_fasta_to_text():
    fasta = ">chr1 header\nACgtN\nTTaa\n>chr2\nCC\n"
    # fil.cc: A/C/T kept (uppercased); G and everything else -> 'G'
    assert codec.fasta_to_text(fasta) == "ACGTGTTAACC"


def test_decode():
    assert codec.decode(np.array([0, 1, 2, 3, 5])) == "ACGTN"
