"""Seed-table search must be bit-identical to the plain path."""

import numpy as np

import bwt_tpu
from bwt_tpu.ops import search

from host_ref import random_codes


def test_seeded_matches_plain(rng):
    codes = random_codes(rng, 1200)
    fmi = bwt_tpu.build_index(codes)
    table = search.build_seed_table(fmi, k=4)
    B = 200
    pats = np.zeros((B, 24), np.int32)
    lens = np.zeros((B,), np.int32)
    for b in range(B):
        plen = int(rng.integers(4, 25))  # >= k
        if rng.random() < 0.7:
            j = int(rng.integers(0, len(codes) - plen))
            p = list(codes[j : j + plen])
        else:
            p = list(rng.integers(0, 4, size=plen))
        if rng.random() < 0.3:
            p[int(rng.integers(0, plen))] ^= 3
        pats[b, :plen] = p
        lens[b] = plen
    plain = search.backward_search(fmi, pats, lens)
    seeded = search.backward_search_seeded(fmi, table, pats, lens)
    for key in ("start", "end", "sp", "ep", "nmatched", "alive"):
        assert np.array_equal(
            np.asarray(plain[key]), np.asarray(seeded[key])
        ), key
    # wrappers route identically
    assert np.array_equal(
        np.asarray(search.locate(fmi, pats, lens)),
        np.asarray(search.locate(fmi, pats, lens, seed_table=table)),
    )
    assert np.array_equal(
        np.asarray(search.reverse_search(fmi, pats, lens)),
        np.asarray(search.reverse_search(fmi, pats, lens, seed_table=table)),
    )


def test_seeded_exact_k_lengths(rng):
    codes = random_codes(rng, 800)
    fmi = bwt_tpu.build_index(codes)
    table = search.build_seed_table(fmi, k=6)
    B = 64
    pats = np.zeros((B, 6), np.int32)
    for b in range(B):
        j = int(rng.integers(0, len(codes) - 6))
        pats[b] = codes[j : j + 6]
    lens = np.full((B,), 6, np.int32)
    plain = search.backward_search(fmi, pats, lens)
    seeded = search.backward_search_seeded(fmi, table, pats, lens)
    for key in ("start", "end", "nmatched", "alive"):
        assert np.array_equal(np.asarray(plain[key]), np.asarray(seeded[key]))
