import numpy as np
import pytest

from bwt_tpu.ops import suffix

from host_ref import HostFMI, random_codes
from oracle import run as oracle_run


@pytest.mark.parametrize("n", [1, 2, 5, 17, 64, 100, 257, 1000])
def test_suffix_array_matches_sorted_suffixes(rng, n):
    codes = random_codes(rng, n)
    sa = np.asarray(suffix.suffix_array(codes))
    ext = list(codes) + [-1]
    expect = sorted(range(n + 1), key=lambda i: ext[i:])
    assert sa[0] == n  # sentinel suffix first (histsortcomp.c:165-168)
    assert list(sa) == expect


def test_suffix_array_repetitive(rng):
    # worst case for prefix doubling: long runs
    codes = np.zeros(512, dtype=np.uint8)
    codes[100:200] = 1
    sa = np.asarray(suffix.suffix_array(codes))
    ext = list(codes) + [-1]
    assert list(sa) == sorted(range(len(codes) + 1), key=lambda i: ext[i:])


@pytest.mark.parametrize("n", [5, 33, 100, 400])
def test_bwt_from_sa_matches_host(rng, n):
    codes = random_codes(rng, n)
    host = HostFMI(codes)
    sa = suffix.suffix_array(codes)
    bwt, endloc = suffix.bwt_from_sa(np.asarray(codes, dtype=np.int32), sa)
    assert int(endloc) == host.endloc
    assert list(np.asarray(bwt)) == host.bwt


def test_naive_bwt_mississippi_oracle_parity():
    out = oracle_run("bwt", "mississippi").decode().strip()
    assert suffix.naive_bwt_ascii("mississippi") == out


@pytest.mark.parametrize("s", ["banana", "abracadabra", "aaaa", "x"])
def test_naive_bwt_oracle_parity(s):
    out = oracle_run("bwt", s).decode().strip()
    assert suffix.naive_bwt_ascii(s) == out


def test_verify_suffix_array_accepts_and_rejects(rng):
    from host_ref import random_codes

    codes = random_codes(rng, 300)
    sa = suffix.suffix_array(codes)
    assert bool(suffix.verify_suffix_array(codes, sa))
    bad = np.asarray(sa).copy()
    bad[[3, 7]] = bad[[7, 3]]  # swap two entries
    assert not bool(suffix.verify_suffix_array(codes, bad))
    dup = np.asarray(sa).copy()
    dup[5] = dup[6]  # not a permutation
    assert not bool(suffix.verify_suffix_array(codes, dup))
    # build_index(verify=True) end to end
    import bwt_tpu
    fmi = bwt_tpu.build_index(codes, verify=True)
    assert fmi.length == 300


def test_large_genome_path_verifies():
    """Large-genome build path (>2^22): exact O(n) verification of
    its output, incl. a repetitive genome forcing extra rounds."""
    import bwt_tpu
    rng = np.random.default_rng(9)
    n = (1 << 22) + 4097
    for codes in (
        rng.integers(0, 4, size=n).astype(np.uint8),
        np.tile(rng.integers(0, 4, size=40), n // 40 + 1)[:n].astype(np.uint8),
    ):
        sa = suffix.suffix_array(codes)
        assert bool(suffix.verify_suffix_array(codes.astype(np.int32), sa))


def test_int32_cap_guard_fires_without_allocating():
    """>2^31-base inputs must fail LOUDLY (the reference's silent
    int32 overflow, csacak.c:517) — checked with a zero-stride
    broadcast view so the test needs no RAM."""
    import bwt_tpu
    import pytest

    huge = np.broadcast_to(np.uint8(0), ((1 << 31) + 5,))
    # auto routes past the cap to the wide (int64) layout, which
    # demands x64 — still a loud pre-allocation failure without it
    with pytest.raises(ValueError, match="jax_enable_x64"):
        bwt_tpu.build_index(huge)
    # an explicit int32 request past the cap names the cap
    with pytest.raises(ValueError, match="int32 FM-index cap"):
        bwt_tpu.build_index(huge, index_dtype=np.int32)
    with pytest.raises(ValueError, match="int32 suffix-array cap"):
        suffix.suffix_array(huge)


def test_suffix_array_int64_variant_matches_int32(rng):
    """The 64-bit-clean SA variant: identical values, int64 dtype.
    Requires jax_enable_x64 (and refuses to run without it — JAX
    would silently downcast)."""
    import jax
    import pytest

    codes = random_codes(rng, 3000)
    want = np.asarray(suffix.suffix_array(codes))
    with pytest.raises(ValueError, match="jax_enable_x64"):
        suffix.suffix_array(codes, dtype=np.int64)
    with jax.enable_x64():
        got = suffix.suffix_array(codes, dtype=np.int64, device=False)
    assert got.dtype == np.int64
    assert np.array_equal(got, want.astype(np.int64))
    with pytest.raises(ValueError, match="unsupported SA dtype"):
        suffix.suffix_array(codes, dtype=np.int16)


def test_upsample16_scan_path_matches_plain():
    """The wide-input lax.scan chunking of the word upsample (the
    2^29 padding fix) must equal the plain repeat for every length
    around the chunk boundaries."""
    import jax.numpy as jnp
    from unittest import mock

    words = np.arange(1000, dtype=np.uint32)
    with mock.patch.object(suffix, "_UPSAMPLE_PLAIN_MAX", 16):
        for L in (1, 15, 16, 17, 999 * 16, 1000 * 16):
            got = np.asarray(suffix.upsample16(jnp.asarray(words), L))
            np.testing.assert_array_equal(got, np.repeat(words, 16)[:L])


def test_pack_words_device_scan_path_matches_host():
    """pack_words_device's wide-input scan chunking must reproduce the
    host packer bit-for-bit (plus the trailing zero word)."""
    import jax.numpy as jnp
    from unittest import mock

    from bwt_tpu import index as bidx

    rng = np.random.default_rng(3)
    for L in (33, 16 * 40, 16 * 40 + 7):
        codes = rng.integers(0, 4, size=L).astype(np.uint8)
        want = bidx._pack16_host(codes)
        with mock.patch.object(bidx, "_PACK_PLAIN_MAX", 2):
            got = np.asarray(bidx.pack_words_device(
                jnp.asarray(codes, jnp.int32), L))
        np.testing.assert_array_equal(got[:-1], want)
        assert got[-1] == 0


def test_make_buckets_scan_path_matches_plain():
    """make_buckets' chunked count path (wide inputs) must produce
    identical bucket rows/totals to the plain path, including the
    pad-word and tail-lane corrections, both layouts."""
    from unittest import mock

    import jax.numpy as jnp

    from bwt_tpu import index as bidx
    from bwt_tpu.ops import rank as rank_ops

    rng = np.random.default_rng(4)
    for L in (61, 64 * 9, 64 * 9 + 17, 64 * 16 - 1):
        codes = rng.integers(0, 4, size=L).astype(np.uint8)
        words = bidx.pack_words_device(jnp.asarray(codes, jnp.int32), L)
        for wide in (False, True):
            if wide:
                import jax

                if not jax.config.jax_enable_x64:
                    continue  # covered by the x64 subprocess suite
            b0, t0 = rank_ops.make_buckets(words[:-1], L, wide=wide)
            with mock.patch.object(rank_ops, "_BUCKET_PLAIN_MAX", 2):
                b1, t1 = rank_ops.make_buckets(words[:-1], L, wide=wide)
            np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
            np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
