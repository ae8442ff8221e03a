"""Differential fuzz of the fused executor kernel: every opcode of
``_service_step`` must agree with the standalone (separately
parity-tested) search ops, including edge lanes — ln <= 0 (the pinned
UB behavior: the search sees 'A'), N-containing reads, empty incoming
intervals, and offset slices."""

import numpy as np
import jax.numpy as jnp

import bwt_tpu
from bwt_tpu.models import batch_exec as be
from bwt_tpu.ops import search

from host_ref import random_codes


def test_service_step_matches_standalone_ops(rng):
    codes = random_codes(rng, 3000)
    fmi = bwt_tpu.build_index(codes)

    # pattern bank: genome samples with mutations, some with N runs
    R, Lb = 32, 48
    bank = np.zeros((R, Lb), np.uint8)
    blens = np.zeros((R,), np.int32)
    for r in range(R):
        l = int(rng.integers(6, Lb + 1))
        j = int(rng.integers(0, 3000 - l))
        row = codes[j : j + l].copy()
        if rng.random() < 0.4:
            row[int(rng.integers(0, l))] ^= int(rng.integers(1, 4))
        if rng.random() < 0.3:
            k = int(rng.integers(0, l))
            row[k:] = 5  # trailing N run
        bank[r, :l] = row
        blens[r] = l
    bank_dev = jnp.asarray(bank.astype(np.int32))

    B = 64
    opc = np.zeros((B,), np.int32)
    row = np.zeros((B,), np.int32)
    off = np.zeros((B,), np.int32)
    ln = np.zeros((B,), np.int32)
    sp = np.zeros((B,), np.int32)
    ep = np.zeros((B,), np.int32)
    idx = np.zeros((B,), np.int32)
    m = fmi.length
    for k in range(B):
        o = int(rng.integers(1, 6))
        opc[k] = o
        r = int(rng.integers(0, R))
        row[k] = r
        if o in (be.OP_MMS, be.OP_BSEARCH):
            off[k] = int(rng.integers(0, max(blens[r] - 4, 1)))
            lo = -2 if o == be.OP_MMS else 1  # exercise ln <= 0 lanes
            ln[k] = int(rng.integers(lo, blens[r] - off[k] + 1))
        elif o == be.OP_CONT:
            off[k] = 0
            ln[k] = int(rng.integers(-1, blens[r] + 1))
            a = int(rng.integers(0, m))
            sp[k] = a
            ep[k] = a + int(rng.integers(0, 3))  # incl. empty intervals
        elif o == be.OP_UNC:
            idx[k] = int(rng.integers(0, m + 1))
        else:  # crank
            sp[k] = int(rng.integers(0, 4))
            idx[k] = int(rng.integers(0, m + 1))

    out = np.stack(
        [np.asarray(c) for c in be._service_step(
            fmi, bank_dev,
            *(jnp.asarray(x) for x in (opc, row, off, ln, sp, ep, idx)),
            resolve=True,
        )], axis=1,
    )

    for k in range(B):
        r = row[k]
        o = opc[k]
        if o in (be.OP_MMS, be.OP_BSEARCH):
            l = max(int(ln[k]), 0)
            pat = np.zeros((1, Lb), np.int32)
            if l > 0:
                pat[0, :l] = bank[r, off[k] : off[k] + l]
            lens1 = np.asarray([ln[k]], np.int32)
            if o == be.OP_MMS:
                want = [
                    int(np.asarray(x)[0])
                    for x in search.mms(fmi, jnp.asarray(pat), jnp.asarray(lens1))
                ]
                got = [int(out[k, be._MMS_M]), int(out[k, be._OSP]),
                       int(out[k, be._OEP])]
                assert got == want, (k, "mms", got, want)
            else:
                wref = search.backward_search(
                    fmi, jnp.asarray(pat), jnp.asarray(lens1)
                )
                assert int(out[k, be._START]) == int(np.asarray(wref["start"])[0])
                assert int(out[k, be._END]) == int(np.asarray(wref["end"])[0])
                assert int(out[k, be._NM]) == int(np.asarray(wref["nmatched"])[0])
                assert bool(out[k, be._ALIVE]) == bool(np.asarray(wref["alive"])[0])
        elif o == be.OP_CONT:
            l = max(int(ln[k]), 0)
            pat = np.zeros((1, Lb), np.int32)
            if l > 0:
                pat[0, :l] = bank[r, :l]
            want = [
                int(np.asarray(x)[0])
                for x in search.mms_continue(
                    fmi, jnp.asarray(pat), jnp.asarray([ln[k]], np.int32),
                    jnp.asarray([sp[k]]), jnp.asarray([ep[k]]),
                )
            ]
            got = [int(out[k, be._CONT_M]), int(out[k, be._OSP]),
                   int(out[k, be._OEP])]
            assert got == want, (k, "cont", got, want)
        elif o == be.OP_UNC:
            want = int(np.asarray(search.unc_sa(fmi, jnp.asarray([idx[k]])))[0])
            assert int(out[k, be._POS]) == want, (k, "unc")
        else:
            want = int(np.asarray(fmi.C)[sp[k]]) + int(
                np.asarray(fmi.rank(int(sp[k]), int(idx[k])))
            )
            assert int(out[k, be._CRANK]) == want, (k, "crank")


def test_early_exit_equivalence(rng):
    """The LF loop's early-exit predicate (all lanes dead or past eff)
    must be output-equivalent to running every step — pinned directly
    (``full_steps=True`` disables the exit), not just via driver
    parity.  The batch mixes opcodes and includes ln <= 0 lanes, empty
    incoming intervals, and an all-dead-early batch."""
    import jax

    codes = random_codes(rng, 2000)
    fmi = bwt_tpu.build_index(codes)
    R, Lb = 8, 40
    bank = np.zeros((R, Lb), np.uint8)
    blens = np.zeros((R,), np.int32)
    for r in range(R):
        l = int(rng.integers(6, Lb + 1))
        j = int(rng.integers(0, 2000 - l))
        bank[r, :l] = codes[j : j + l]
        blens[r] = l
    bank_dev = jnp.asarray(bank.astype(np.int32))

    def run(opc, row, off, ln, sp, ep, idx, full):
        f = jax.jit(
            be._service_core,
            static_argnames=("resolve", "ext", "with_crank", "full_steps"),
        )
        return [
            np.asarray(x)
            for x in f(
                fmi, bank_dev,
                *(jnp.asarray(np.asarray(a, np.int32))
                  for a in (opc, row, off, ln, sp, ep, idx)),
                resolve=True, ext=False, full_steps=full,
            )
        ]

    # mixed opcodes, incl. ln <= 0 lanes and empty incoming intervals
    B = 32
    opc = np.zeros((B,), np.int32)
    row = np.zeros((B,), np.int32)
    off = np.zeros((B,), np.int32)
    ln = np.zeros((B,), np.int32)
    sp = np.zeros((B,), np.int32)
    ep = np.zeros((B,), np.int32)
    idx = np.zeros((B,), np.int32)
    m = fmi.length
    for k in range(B):
        o = int(rng.integers(1, 6))
        opc[k] = o
        r = int(rng.integers(0, R))
        row[k] = r
        if o in (be.OP_MMS, be.OP_BSEARCH):
            off[k] = int(rng.integers(0, max(blens[r] - 4, 1)))
            ln[k] = int(rng.integers(-2, blens[r] - off[k] + 1))
        elif o == be.OP_CONT:
            ln[k] = int(rng.integers(-1, blens[r] + 1))
            a = int(rng.integers(0, m))
            sp[k] = a
            ep[k] = a + int(rng.integers(0, 3))
        elif o == be.OP_UNC:
            idx[k] = int(rng.integers(0, m + 1))
        else:
            sp[k] = int(rng.integers(0, 4))
            idx[k] = int(rng.integers(0, m + 1))
    fast = run(opc, row, off, ln, sp, ep, idx, False)
    full = run(opc, row, off, ln, sp, ep, idx, True)
    for a, b in zip(fast, full):
        assert np.array_equal(a, b)

    # all-dead-early batch: random patterns that empty within a few
    # steps (and some ln <= 0 lanes) — the early exit fires immediately
    bank2 = np.asarray(rng.integers(0, 4, size=(R, Lb)), np.uint8)
    bank2[:, ::2] = bank2[:, 1::2] ^ 1  # avoid accidental genome hits
    b2 = jnp.asarray(bank2.astype(np.int32))

    def run2(full):
        f = jax.jit(
            be._service_core,
            static_argnames=("resolve", "ext", "with_crank", "full_steps"),
        )
        opc2 = np.full((R,), be.OP_MMS, np.int32)
        opc2[0] = be.OP_BSEARCH
        ln2 = np.full((R,), Lb, np.int32)
        ln2[1] = 0
        z = np.zeros((R,), np.int32)
        return [
            np.asarray(x)
            for x in f(
                fmi, b2,
                *(jnp.asarray(a) for a in
                  (opc2, np.arange(R, dtype=np.int32), z, ln2, z, z, z)),
                resolve=False, ext=False, full_steps=full,
            )
        ]

    for a, b in zip(run2(False), run2(True)):
        assert np.array_equal(a, b)
