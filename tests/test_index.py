import numpy as np
import pytest

from bwt_tpu import index as index_mod
from bwt_tpu.index import build_index

from host_ref import HostFMI, random_codes


@pytest.mark.parametrize("n", [5, 16, 31, 32, 33, 100, 500])
def test_build_index_fields(rng, n):
    codes = random_codes(rng, n)
    host = HostFMI(codes)
    fmi = build_index(codes)
    assert fmi.length == n
    assert int(fmi.endloc) == host.endloc
    assert list(np.asarray(fmi.C)) == host.C
    assert list(np.asarray(fmi.sa_samples)) == host.sa_samples
    assert list(index_mod.bwt_codes(fmi)) == host.bwt


@pytest.mark.parametrize("n", [33, 100, 500])
def test_rank_matches_host(rng, n):
    codes = random_codes(rng, n)
    host = HostFMI(codes)
    fmi = build_index(codes)
    idxs = rng.integers(0, n + 2, size=64).astype(np.int32)
    cs = rng.integers(0, 4, size=64).astype(np.int32)
    got = np.asarray(fmi.rank(cs, idxs))
    want = [host.rank(int(c), int(i)) for c, i in zip(cs, idxs)]
    assert list(got) == want


@pytest.mark.parametrize("n", [33, 100, 500])
def test_lf_matches_host(rng, n):
    codes = random_codes(rng, n)
    host = HostFMI(codes)
    fmi = build_index(codes)
    idxs = np.arange(n + 1, dtype=np.int32)
    got = np.asarray(fmi.lf(idxs))
    want = [host.lf(int(i)) for i in idxs]
    assert list(got) == want


def test_lf_walk_reconstructs_sequence(rng):
    # Walking LF from index 0 visits the text right-to-left: classic
    # FM-index inversion property.
    n = 200
    codes = random_codes(rng, n)
    fmi = build_index(codes)
    host = HostFMI(codes)
    idx = 0
    visited = []
    for _ in range(n + 1):
        visited.append(host.sa[idx])
        idx = int(fmi.lf(np.int32(idx)))
    # The LF walk is a cycle through every rotation exactly once
    assert sorted(visited) == list(range(n + 1))


def test_index_from_parts_roundtrip(rng):
    n = 300
    codes = random_codes(rng, n)
    fmi = build_index(codes)
    rebuilt = index_mod.index_from_parts(
        bwt_codes=index_mod.bwt_codes(fmi),
        sa_samples=np.asarray(fmi.sa_samples),
        C=np.asarray(fmi.C),
        endloc=int(fmi.endloc),
        length=n,
    )
    assert np.array_equal(np.asarray(rebuilt.buckets), np.asarray(fmi.buckets))
    assert np.array_equal(
        np.asarray(rebuilt.bwt_words), np.asarray(fmi.bwt_words)
    )
