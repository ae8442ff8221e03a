"""Anti-diagonal NW/SW DP fill as a Pallas TPU kernel.

The XLA wavefront in ops/align.py (dp_fill_batch) advances one
anti-diagonal per `lax.scan` step but pays a dynamic gather + scatter
over the value/pointer matrices every step.  This kernel removes every
dynamic memory access: the grid's fastest dimension *is* the diagonal
index, so each step's output block (one diagonal) is addressed
statically through the BlockSpec index map, and the carried state —
two live value diagonals, the pointer diagonal, and a *systolic genome
register* — lives in VMEM scratch that persists across the
sequentially-executed grid steps.

    cell (i, j) on diagonal d = i+j needs (i-1,j-1) from d-2,
    (i-1,j) and (i,j-1) from d-1: one-sublane shifts of the scratch
    vectors; the genome character for cell-row i at diagonal d is
    genome[d-1-i], so each step shifts the register one sublane and
    injects genome[d-1] (delivered by the input index map) at
    sublane 0.

Layout: batch pairs ride the 128 lanes, DP rows (i = 0..L1) ride
sublanes.  Scoring and tie-breaks are identical to smw.c:26-200 /
ops.align (match 0 / mismatch -6 / gap -3 with -5 open charged off the
direction-pointer).  Outputs are per-diagonal: ``[b, d, i]`` addresses
DP cell (i, d-i).  Bit-exact with dp_fill_batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bwt_tpu.ops import align as align_ops
from bwt_tpu.utils.cigar import Cigar

NB = 128  # batch lanes per block


def _kernel(reads_ref, ginj_ref, val_ref, ptr_ref,
            prev2_s, prev1_s, pptr1_s, gdiag_s,
            *, scoring):
    MATCH, MISMATCH, GAP_OPEN, GAP_EXTEND = scoring
    L1 = reads_ref.shape[0]
    LANES = L1 + 1
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        zero = jnp.zeros((LANES, NB), jnp.int32)
        prev2_s[:, :] = zero
        prev1_s[:, :] = zero  # diagonal 0: cell (0,0) = 0
        pptr1_s[:, :] = zero
        gdiag_s[:, :] = zero
        val_ref[0, :, :] = zero
        ptr_ref[0, :, :] = zero

    @pl.when(d > 0)
    def _():
        subl = jax.lax.broadcasted_iota(jnp.int32, (LANES, NB), 0)
        rvec = jnp.concatenate(
            [jnp.zeros((1, NB), jnp.int32), reads_ref[:, :]], axis=0
        )  # rvec[i] = read[i-1]
        gdiag = jnp.concatenate(
            [ginj_ref[0, :, :], gdiag_s[:-1, :]], axis=0
        )  # inject genome[d-1] at sublane 0, shift the rest

        zrow = jnp.zeros((1, NB), jnp.int32)
        prev1 = prev1_s[:, :]
        diag = jnp.concatenate([zrow, prev2_s[:-1, :]], axis=0)
        up = jnp.concatenate([zrow, prev1[:-1, :]], axis=0)
        pup = jnp.concatenate([zrow, pptr1_s[:-1, :]], axis=0)

        match = (rvec == 5) | (rvec == gdiag)
        sdiag = diag + jnp.where(match, MATCH, MISMATCH)
        sleft = prev1 + GAP_EXTEND + jnp.where(pptr1_s[:, :] == 2, 0, GAP_OPEN)
        sup = up + GAP_EXTEND + jnp.where(pup == 1, 0, GAP_OPEN)
        v = jnp.maximum(jnp.maximum(sdiag, sleft), sup)
        p = jnp.where(v == sleft, 2, jnp.where(v == sup, 1, 0))
        # boundaries: DP row 0 (sublane 0) and column 0 (sublane d)
        v = jnp.where((subl == 0) | (subl == d), GAP_OPEN + GAP_EXTEND * d, v)
        p = jnp.where(subl == 0, 2, jnp.where(subl == d, 1, p))

        val_ref[0, :, :] = v
        ptr_ref[0, :, :] = p
        prev2_s[:, :] = prev1
        prev1_s[:, :] = v
        pptr1_s[:, :] = p
        gdiag_s[:, :] = gdiag


@functools.partial(jax.jit, static_argnames=("interpret", "scoring", "transpose"))
def dp_fill_wavefront(
    reads: jax.Array,  # (B, L1) int32 codes 0-3/5, zero-padded
    genomes: jax.Array,  # (B, L2) int32 codes 0-3, zero-padded
    *,
    interpret: bool = False,
    scoring=None,
    transpose: bool = True,
):
    """Returns (vals, ptrs), each (B, L1+L2+1, L1+1) in per-diagonal
    layout: ``[b, d, i]`` addresses DP cell (i, d-i).  ``scoring`` =
    (match, mismatch, gap_open, gap_extend); None = config defaults.
    ``transpose=False`` skips the batch-major transpose and returns the
    kernel's native ``(D, L1+1, Bp)`` arrays (Bp = B padded to 128) —
    the layout the diagonal-scan consumers stream directly."""
    if scoring is None:
        scoring = align_ops.default_scoring()
    B, L1 = reads.shape
    _, L2 = genomes.shape
    D = L1 + L2 + 1
    LANES = L1 + 1
    pad = (-B) % NB
    Bp = B + pad
    reads_t = jnp.zeros((L1, Bp), jnp.int32).at[:, :B].set(
        jnp.asarray(reads, jnp.int32).T
    )
    # ginj[d, 0] = genome column d-1 (row 0 unused); the middle
    # singleton keeps the block's trailing dims equal to the array's
    # (Mosaic's block divisibility rule)
    ginj = jnp.zeros((D, 1, Bp), jnp.int32).at[1 : L2 + 1, 0, :B].set(
        jnp.asarray(genomes, jnp.int32).T
    )
    vals, ptrs = pl.pallas_call(
        functools.partial(_kernel, scoring=scoring),
        grid=(Bp // NB, D),
        in_specs=[
            pl.BlockSpec((L1, NB), lambda b, d: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NB), lambda b, d: (d, 0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, LANES, NB), lambda b, d: (d, 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, LANES, NB), lambda b, d: (d, 0, b), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, LANES, Bp), jnp.int32),
            jax.ShapeDtypeStruct((D, LANES, Bp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((LANES, NB), jnp.int32),
            pltpu.VMEM((LANES, NB), jnp.int32),
            pltpu.VMEM((LANES, NB), jnp.int32),
            pltpu.VMEM((LANES, NB), jnp.int32),
        ],
        interpret=interpret,
    )(reads_t, ginj)
    if not transpose:
        return vals, ptrs
    return (
        jnp.transpose(vals, (2, 0, 1))[:B],
        jnp.transpose(ptrs, (2, 0, 1))[:B],
    )


def ptr_matrix(ptrs_d: np.ndarray, l1: int, l2: int) -> np.ndarray:
    """Per-diagonal pointers -> conventional (l1+1, l2+1) matrix."""
    i = np.arange(l1 + 1)[:, None]
    j = np.arange(l2 + 1)[None, :]
    return ptrs_d[i + j, i]


def nw_fast_batch(reads, read_lens, genomes, genome_lens, *, interpret=False):
    """align.nw_fast_batch with the Pallas fill: (endpos, cigars)."""
    reads = np.asarray(reads)
    genomes = np.asarray(genomes)
    read_lens = np.asarray(read_lens)
    genome_lens = np.asarray(genome_lens)
    vals, ptrs = dp_fill_wavefront(
        jnp.asarray(reads, jnp.int32), jnp.asarray(genomes, jnp.int32),
        interpret=interpret,
    )
    vals = np.asarray(vals)
    ptrs = np.asarray(ptrs)
    out, cigars = [], []
    for b in range(reads.shape[0]):
        l1, l2 = int(read_lens[b]), int(genome_lens[b])
        c = Cigar()
        if l1 == 0:
            out.append(0)
            cigars.append(c)
            continue
        # row l1 of pair b: cells (l1, j) live at [d=l1+j, i=l1]
        row = vals[b, l1 : l1 + l2 + 1, l1]
        maxloc = int(np.argmax(row))  # first max == strict > scan
        P = ptr_matrix(ptrs[b], reads.shape[1], genomes.shape[1])
        align_ops._backtrack(P, l1, maxloc, c, flip=True)
        out.append(maxloc - 1)
        cigars.append(c)
    return np.asarray(out, np.int32), cigars
