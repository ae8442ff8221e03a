"""Pallas wavefront DP kernel vs the XLA reference fill (interpret
mode on CPU; the compiled path runs on TPU)."""

import numpy as np

from bwt_tpu.ops import align, pallas_align
from bwt_tpu.utils.cigar import Cigar


def _batch(rng, B, L1, L2):
    reads = np.zeros((B, L1), np.int32)
    genomes = np.zeros((B, L2), np.int32)
    rl = np.zeros((B,), np.int32)
    gl = np.zeros((B,), np.int32)
    for b in range(B):
        l1 = int(rng.integers(1, L1 + 1))
        l2 = int(rng.integers(1, L2 + 1))
        reads[b, :l1] = rng.integers(0, 4, size=l1)
        if rng.random() < 0.3:
            reads[b, int(rng.integers(0, l1))] = 5
        genomes[b, :l2] = rng.integers(0, 4, size=l2)
        rl[b], gl[b] = l1, l2
    return reads, genomes, rl, gl


def test_wavefront_matches_xla_fill(rng):
    B, L1, L2 = 12, 17, 23
    reads, genomes, rl, gl = _batch(rng, B, L1, L2)
    vals_d, ptrs_d = pallas_align.dp_fill_wavefront(
        reads, genomes, interpret=True
    )
    vals_d, ptrs_d = np.asarray(vals_d), np.asarray(ptrs_d)
    want_vals, want_ptrs = align.dp_fill_batch(reads, genomes)
    want_vals, want_ptrs = np.asarray(want_vals), np.asarray(want_ptrs)
    for b in range(B):
        V = pallas_align.ptr_matrix(vals_d[b], L1, L2)
        P = pallas_align.ptr_matrix(ptrs_d[b], L1, L2)
        assert np.array_equal(V, want_vals[b]), b
        assert np.array_equal(P, want_ptrs[b]), b


def test_pallas_nw_batch_matches_host(rng):
    B, L1, L2 = 10, 14, 20
    reads, genomes, rl, gl = _batch(rng, B, L1, L2)
    endpos, cigars = pallas_align.nw_fast_batch(
        reads, rl, genomes, gl, interpret=True
    )
    for b in range(B):
        c = Cigar()
        want = align.nw_fast(reads[b, : rl[b]], genomes[b, : gl[b]], c)
        assert endpos[b] == want
        assert cigars[b].render() == c.render()


def test_wavefront_tiny_shapes(rng):
    # single pair, minimal tile — exercises NB padding and D=L1+L2+1 edges
    reads = np.array([[1, 2]], np.int32)
    genomes = np.array([[1, 2, 3]], np.int32)
    vals_d, ptrs_d = pallas_align.dp_fill_wavefront(
        reads, genomes, interpret=True
    )
    want_vals, want_ptrs = align.dp_fill_batch(reads, genomes)
    assert np.array_equal(
        pallas_align.ptr_matrix(np.asarray(vals_d)[0], 2, 3),
        np.asarray(want_vals)[0],
    )
    assert np.array_equal(
        pallas_align.ptr_matrix(np.asarray(ptrs_d)[0], 2, 3),
        np.asarray(want_ptrs)[0],
    )


def test_executor_dp_pallas_impl_matches_xla(rng):
    """The executor's DP service must give identical CIGAR runs through
    the Pallas kernel (interpret mode on CPU) and the XLA wavefront."""
    import bwt_tpu
    from bwt_tpu.models import aligner
    from bwt_tpu.models.batch_exec import BatchExecutor, QueryService
    from host_ref import random_codes

    codes = random_codes(rng, 6000)
    fmi = bwt_tpu.build_index(codes)
    reads = []
    for _ in range(8):
        j = int(rng.integers(0, 6000 - 70))
        r = list(codes[j : j + 70])
        r[int(rng.integers(0, 70))] ^= 3
        if rng.random() < 0.5:
            del r[30:32]
        reads.append(np.asarray(r, np.uint8))

    outs = []
    for impl in ("xla", "pallas_interpret"):
        svc = QueryService(fmi, codes)
        svc.dp_impl = impl
        res = aligner.align_reads(fmi, codes, reads, service=svc)
        outs.append([(p, c.render() if c else None) for p, c in res])
    assert outs[0] == outs[1]
    assert any(p for p, _ in outs[0])  # something actually aligned
