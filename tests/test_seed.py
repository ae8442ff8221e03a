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


def test_locate_fast_matches_locate(rng):
    """Seed-and-verify locate returns the reference locate position for
    every matching read (including multi-occurrence patterns, whose
    interval order equals full-search SA order), -1 on true no-match,
    -2 only on candidate overflow."""
    from bwt_tpu.index import pack_words_device
    import jax.numpy as jnp

    # a genome with planted repeats so multi-candidate paths trigger
    base = random_codes(rng, 1500)
    rep = base[100:130]
    genome = np.concatenate([base, rep, base[400:420], rep, rep])
    fmi = bwt_tpu.build_index(genome, sa_sample_rate=4)
    table = search.build_seed_table(fmi, k=5)
    text = search.build_text_table(
        pack_words_device(jnp.asarray(genome, jnp.int32), len(genome))
    )
    B = 256
    L = 30
    pats = np.zeros((B, L), np.int32)
    lens = np.zeros((B,), np.int32)
    for b in range(B):
        plen = int(rng.integers(7, L + 1))
        if rng.random() < 0.8:
            j = int(rng.integers(0, len(genome) - plen))
            p = list(genome[j : j + plen])
        else:
            p = list(rng.integers(0, 4, size=plen))
        if rng.random() < 0.25:
            p[int(rng.integers(0, plen))] ^= 3
        pats[b, :plen] = p
        lens[b] = plen
    want = np.asarray(search.locate(fmi, pats, lens))
    counts = np.asarray(search.count_matches(fmi, pats, lens))
    got = np.asarray(
        search.locate_fast(fmi, text, pats, lens, table, max_cands=4)
    )
    checked = 0
    for b in range(B):
        if got[b] == -2:
            continue  # overflow -> caller falls back to locate
        if counts[b] > 0:
            assert got[b] == want[b], (b, got[b], want[b], counts[b])
            checked += 1
        else:
            assert got[b] == -1, (b, got[b])
    assert checked > 50
    # overflow lanes really do have > max_cands candidates
    wide = np.asarray(
        search.locate_fast(fmi, text, pats, lens, table, max_cands=16)
    )
    for b in range(B):
        if got[b] == -2 and counts[b] > 0 and wide[b] != -2:
            assert wide[b] == want[b]
