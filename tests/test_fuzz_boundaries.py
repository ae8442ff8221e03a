"""Differential fuzz at layout boundaries: genome lengths around word
(16) and bucket (64) edges, 1-char genomes, single-symbol genomes,
pattern lengths 1..L — every core op vs the host golden model."""

import numpy as np
import pytest

import bwt_tpu
from bwt_tpu import index as index_mod
from bwt_tpu.ops import search

from host_ref import HostFMI


LENGTHS = [1, 2, 3, 15, 16, 17, 31, 32, 33, 63, 64, 65, 127, 128, 200]


@pytest.mark.parametrize("n", LENGTHS)
def test_boundary_genomes(rng, n):
    for codes in (
        rng.integers(0, 4, size=n).astype(np.uint8),
        np.zeros(n, np.uint8),
        np.full(n, 3, np.uint8),
    ):
        host = HostFMI(codes)
        fmi = bwt_tpu.build_index(codes)
        assert list(index_mod.bwt_codes(fmi)) == host.bwt
        assert list(np.asarray(fmi.C)) == host.C
        # rank at every (c, idx) in contract
        idxs = np.arange(n + 2, dtype=np.int32)  # 0..n+1
        for c in range(4):
            got = np.asarray(fmi.rank(np.full_like(idxs, c), idxs))
            want = [host.rank(c, int(i)) for i in idxs]
            assert list(got) == want, (n, c)
        # unc_sa everywhere
        got = np.asarray(search.unc_sa(fmi, np.arange(n + 1, dtype=np.int32)))
        assert list(got) == host.sa
        # searches of every length at random offsets
        B = min(n, 8)
        plens = [int(rng.integers(1, n + 1)) for _ in range(B)]
        L = max(plens)
        pats = np.zeros((B, L), np.int32)
        lens = np.zeros((B,), np.int32)
        plist = []
        for b, pl in enumerate(plens):
            j = int(rng.integers(0, n - pl + 1))
            p = [int(x) for x in codes[j : j + pl]]
            pats[b, :pl] = p
            lens[b] = pl
            plist.append(p)
        rs = np.asarray(search.reverse_search(fmi, pats, lens))
        loc = np.asarray(search.locate(fmi, pats, lens))
        for b, p in enumerate(plist):
            assert rs[b] == host.reverse_search(p), (n, p)
            assert loc[b] == host.locate(p), (n, p)


@pytest.mark.parametrize("n", [3, 16, 64, 65])
def test_boundary_mms(rng, n):
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    host = HostFMI(codes)
    fmi = bwt_tpu.build_index(codes)
    B = 12
    L = min(n, 10)
    pats = np.zeros((B, L), np.int32)
    lens = np.zeros((B,), np.int32)
    plist = []
    for b in range(B):
        pl = int(rng.integers(1, L + 1))
        j = int(rng.integers(0, n - pl + 1))
        p = [int(x) for x in codes[j : j + pl]]
        if pl > 1 and rng.random() < 0.4:
            p[int(rng.integers(0, pl))] = 5  # N
        if all(x == 5 for x in p):
            p[0] = 0
        pats[b, :pl] = p
        lens[b] = pl
        plist.append(p)
    m, sp, ep = map(np.asarray, search.mms(fmi, pats, lens))
    for b, p in enumerate(plist):
        assert (m[b], sp[b], ep[b]) == host.mms(p), (n, p)
