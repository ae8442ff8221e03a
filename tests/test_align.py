"""Parity tests for the alignment DP vs the reference smw.c, driven
through a test-owned C main (tests/oracle_extras/nw_main.c)."""

import numpy as np
import pytest

from bwt_tpu.ops import align
from bwt_tpu.utils.cigar import Cigar

from oracle import run


def _digits(codes):
    return "".join(str(int(c)) for c in codes)


def _ref_nw(read, genome):
    out = run("nw_main", "nw", _digits(read), _digits(genome)).decode()
    lines = out.splitlines()
    return int(lines[0]), lines[1]


def _ref_sw(read, genome):
    out = run("nw_main", "sw", _digits(read), _digits(genome)).decode()
    return out.splitlines()[1]


def _random_pair(rng, with_n=False):
    l2 = int(rng.integers(1, 40))
    genome = rng.integers(0, 4, size=l2)
    if rng.random() < 0.5:
        # related read: slice of genome with indels/mutations
        a = int(rng.integers(0, l2))
        b = int(rng.integers(a, l2)) + 1
        read = list(genome[a:b])
        for _ in range(int(rng.integers(0, 3))):
            if not read:
                break
            k = int(rng.integers(0, len(read)))
            op = rng.random()
            if op < 0.4:
                read[k] = int(read[k]) ^ 3
            elif op < 0.7:
                read.insert(k, int(rng.integers(0, 4)))
            else:
                del read[k]
    else:
        read = list(rng.integers(0, 4, size=int(rng.integers(1, 30))))
    if with_n and read and rng.random() < 0.4:
        read[int(rng.integers(0, len(read)))] = 5
    if not read:
        read = [0]
    return np.array(read), genome


@pytest.mark.parametrize("with_n", [False, True])
def test_nw_fast_matches_reference(rng, with_n):
    for _ in range(60):
        read, genome = _random_pair(rng, with_n)
        want_pos, want_cigar = _ref_nw(read, genome)
        c = Cigar()
        got_pos = align.nw_fast(read, genome, c)
        assert got_pos == want_pos
        assert c.render_ref_line().rstrip("\n") == want_cigar


@pytest.mark.parametrize("with_n", [False, True])
def test_sw_fast_matches_reference(rng, with_n):
    for _ in range(60):
        read, genome = _random_pair(rng, with_n)
        want_cigar = _ref_sw(read, genome)
        c = Cigar()
        align.sw_fast(read, genome, c)
        assert c.render_ref_line().rstrip("\n") == want_cigar


def test_nw_zero_length_read():
    c = Cigar()
    assert align.nw_fast([], [1, 2, 3], c) == 0
    assert not c


def test_batched_fill_matches_host(rng):
    B = 24
    pairs = [_random_pair(rng, with_n=True) for _ in range(B)]
    L1 = max(len(r) for r, _ in pairs)
    L2 = max(len(g) for _, g in pairs)
    reads = np.zeros((B, L1), np.int32)
    genomes = np.zeros((B, L2), np.int32)
    rl = np.zeros((B,), np.int32)
    gl = np.zeros((B,), np.int32)
    for b, (r, g) in enumerate(pairs):
        reads[b, : len(r)] = r
        genomes[b, : len(g)] = g
        rl[b], gl[b] = len(r), len(g)
    endpos, cigars = align.nw_fast_batch(reads, rl, genomes, gl)
    sw_cigars = align.sw_fast_batch(reads, rl, genomes, gl)
    for b, (r, g) in enumerate(pairs):
        c = Cigar()
        want = align.nw_fast(r, g, c)
        assert endpos[b] == want
        assert cigars[b].render() == c.render()
        c2 = Cigar()
        align.sw_fast(r, g, c2)
        assert sw_cigars[b].render() == c2.render()


def test_cigar_stack_merges_and_flips():
    s = Cigar()
    s.push("M", 3)
    s.push("M", 2)
    s.push("I", 1)
    assert s.render() == "1I5M"
    t = Cigar()
    s.flip_onto(t)
    assert t.render() == "5M1I"
    assert not s


def test_smw_naive_scores():
    # +2 match / -1 otherwise (smw.c:206-242)
    v = align.smw_naive([1, 2, 3], [1, 2, 3])
    assert v[3, 3] == 6
    v = align.smw_naive([1, 2, 3], [1, 0, 3])
    assert v[3, 3] == 3
