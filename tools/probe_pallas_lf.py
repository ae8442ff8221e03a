"""VERDICT r2 #4: probe a fused Pallas LF-step kernel with the bucket
table resident in VMEM against the XLA row-gather floor.

The raw (un-memoized) backward search costs ~22 dependent row-gathers
per 12-mer and runs at the measured XLA dynamic-gather roofline
(~270 M sustained rows/s -> 12.1 M searches/s).  The one idea left on
the table (SURVEY §7, VERDICT r2 #4) is keeping the (nb+1, 8) bucket
rows in VMEM across k fused LF steps, which a <=8 Mb genome affords
(~4 MB at 0.5 B/base).

The architectural catch, verified against jax 0.9's Mosaic lowering
(jax/_src/pallas/mosaic/lowering.py, _gather_lowering_rule): the TPU
has NO per-lane vector gather from VMEM.  ``tpu.dynamic_gather`` only
lowers register-shaped take_along_axis (table shape == indices shape
== out shape, i.e. an (8, 128)-tile permute); arbitrary row indexing
inside a kernel is scalar-core dynamic slicing, one lane at a time.
So the kernel below does what the hardware offers — a fori_loop of
scalar row loads — and this probe measures how far that lands from
the XLA gather HLO, which pipelines the same random accesses through
the vector load units.

Run (TPU):  python tools/probe_pallas_lf.py [--genome 1048576]
            [--batch 8192] [--k 12] [--repeat 3]

Result (v5e, 2026-08-20, measured, recorded in ROADMAP.md): bit-equal
to the XLA chain, but the kernel saturates the scalar core at ~7 M
row-ops/s regardless of batch, while the XLA gather HLO pipelines to
75 M at 131 k lanes (26 ms vs 54 ms at 8 k lanes; 42 ms vs 481 ms at
131 k) and ~270 M at 1 M lanes.  VMEM residency cannot pay for
lane-serial access; the XLA gather layout stays the design.
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=1_048_576)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    import jax

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bwt_tpu
    from bwt_tpu.ops import rank as rk

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=args.genome).astype(np.uint8)
    print(f"building {args.genome}-base index on "
          f"{jax.devices()[0].platform}...", flush=True)
    fmi = bwt_tpu.build_index(codes)
    np.asarray(fmi.C)
    nb = int(fmi.buckets.shape[0])
    print(f"bucket table: {nb} rows = {nb * 32 / 1e6:.2f} MB", flush=True)

    B, K = args.batch, args.k
    pats = jnp.asarray(rng.integers(0, 4, size=(B, K)).astype(np.int32))

    # ---- XLA baseline: the raw backward-search LF chain -------------
    @jax.jit
    def xla_chain(pats):
        C, ep0 = fmi.C, fmi.length + 1

        def step(t, se):
            sp, ep = se
            c = pats[:, t]
            Cc = jnp.take(C, c)
            sp2 = Cc + rk.rank(fmi.buckets, fmi.endloc, c, sp)
            ep2 = Cc + rk.rank(fmi.buckets, fmi.endloc, c, ep)
            return sp2, ep2

        sp = jnp.zeros((B,), jnp.int32)
        ep = jnp.full((B,), ep0, jnp.int32)
        return jax.lax.fori_loop(0, K, step, (sp, ep))

    # ---- Pallas kernel: VMEM-resident buckets, scalar-core rows -----
    # Per-lane state walks the same 2 rank() row loads per step; the
    # bucket table sits in VMEM for all K steps.  Row access is a
    # scalar dynamic slice (the only form Mosaic supports), so lanes
    # process serially within the grid block.
    QB = 512  # lanes per grid step

    def kernel(pats_ref, buckets_ref, c_ref, sp_ref, ep_ref, *, K, ep0,
               endloc):
        # Mosaic has no value-level dynamic_slice: every data-dependent
        # pick below is a pl.ds ref load (dim-0 only) or a one-hot
        # multiply-reduce (the ops/rank._select recipe)
        four = jnp.arange(4, dtype=jnp.int32)

        def rank_scalar(c, i):
            i = i - (i > endloc).astype(jnp.int32)
            row = buckets_ref[pl.ds(i >> 6, 1), :][0]  # (8,)
            occ = jnp.sum(jnp.where(four == c, row[:4], 0))
            words = jax.lax.bitcast_convert_type(row[4:], jnp.uint32)
            r = i & 63
            lanes = jnp.clip(r - 16 * four, 0, 16)
            shift = (2 * jnp.minimum(lanes, 15)).astype(jnp.uint32)
            mask = jnp.where(lanes >= 16, jnp.uint32(0xFFFFFFFF),
                             (jnp.uint32(1) << shift) - jnp.uint32(1))
            pat = c.astype(jnp.uint32) * jnp.uint32(0x55555555)
            x = words ^ pat
            eq = jnp.bitwise_not(x | (x >> 1)) & jnp.uint32(0x55555555)
            cnt = jax.lax.population_count(eq & mask).astype(jnp.int32)
            return occ + cnt.sum()

        def lane(j, _):
            pat_row = pats_ref[pl.ds(j, 1), :][0]
            c_row = c_ref[0, :]

            def step(t, se):
                sp, ep = se
                kk = jnp.arange(pat_row.shape[0], dtype=jnp.int32)
                c = jnp.sum(jnp.where(kk == t, pat_row, 0))
                Cc = jnp.sum(jnp.where(
                    jnp.arange(8, dtype=jnp.int32) == c, c_row, 0))
                return (Cc + rank_scalar(c, sp), Cc + rank_scalar(c, ep))

            sp, ep = jax.lax.fori_loop(
                0, K, step, (jnp.int32(0), jnp.int32(ep0)))
            sp_ref[pl.ds(j, 1), :] = sp[None, None]
            ep_ref[pl.ds(j, 1), :] = ep[None, None]
            return 0

        jax.lax.fori_loop(0, QB, lane, 0)

    @jax.jit
    def pallas_chain(pats, buckets, C):
        f = pl.pallas_call(
            functools.partial(kernel, K=K, ep0=fmi.length + 1,
                              endloc=int(fmi.endloc)),
            grid=(B // QB,),
            in_specs=[
                pl.BlockSpec((QB, K), lambda i: (i, 0)),
                pl.BlockSpec((buckets.shape[0], 8), lambda i: (0, 0)),
                pl.BlockSpec((1, 8), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((QB, 1), lambda i: (i, 0)),
                pl.BlockSpec((QB, 1), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
            ],
        )
        Cp = jnp.zeros((1, 8), jnp.int32).at[0, :5].set(C)
        sp, ep = f(pats, buckets, Cp)
        return sp[:, 0], ep[:, 0]

    def bench(fn, *a):
        out = fn(*a)
        np.asarray(out[0])  # warm + force
        best = None
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            out = fn(*a)
            np.asarray(out[0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    dt = bench(xla_chain, pats)
    gps = 2 * B * K / dt
    print(f"XLA    LF chain: {dt*1e3:8.2f} ms  "
          f"({B/dt/1e6:.2f} M searches/s, {gps/1e6:.0f} M row-gathers/s)",
          flush=True)

    try:
        dt = bench(pallas_chain, pats, fmi.buckets, fmi.C)
        gps = 2 * B * K / dt
        print(f"Pallas LF chain: {dt*1e3:8.2f} ms  "
              f"({B/dt/1e6:.2f} M searches/s, {gps/1e6:.0f} M "
              f"row-gathers/s)", flush=True)
    except Exception as e:  # Mosaic compile failures are data too
        print(f"Pallas LF chain: FAILED TO COMPILE/RUN: {e}", flush=True)

    # sanity: same results
    try:
        xs, xe = xla_chain(pats)
        ps, pe = pallas_chain(pats, fmi.buckets, fmi.C)
        ok = bool(jnp.all(xs == ps) & jnp.all(xe == pe))
        print(f"bit-equal: {ok}", flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    main()
