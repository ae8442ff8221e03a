"""Headline benchmark: exact-match backward-search throughput per chip.

The reference's query benchmark is fmitest.c:150-165 — 10 M x 12-bp
``reverse_search`` calls over 4 pthreads on a synthetic genome, with
the index built by the histogram suffix sort (fmitest.c:143-149).
Here the same workload runs as lockstep batched backward search on one
TPU chip: a genome is indexed on device (prefix-doubling SA -> BWT ->
Occ checkpoints), then batches of random 12-mers stream through the
jitted search kernel.

Prints ONE JSON line: searches/s/chip, with vs_baseline relative to
the 10 M searches/s/chip north-star target (BASELINE.json: the
reference publishes no absolute number; its harness prints raw cycle
counts at runtime).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=None, help="genome length (bases)")
    ap.add_argument("--batch", type=int, default=None, help="reads per step")
    ap.add_argument("--plen", type=int, default=12, help="pattern length (fmitest: 12)")
    ap.add_argument("--steps", type=int, default=None, help="timed steps")
    ap.add_argument(
        "--seed-k", type=int, default=None,
        help="k-mer seed-table order (default 12 on TPU / 8 elsewhere; "
        "results are bit-identical with or without the table)",
    )
    ap.add_argument("--small", action="store_true", help="force CPU-sized run")
    args = ap.parse_args()

    import pathlib

    import jax

    # Persistent compile cache: remote (tunneled) TPU compiles run
    # 30s-8min each; the cache turns every repeat into milliseconds
    # and survives across processes/rounds.
    cache = pathlib.Path(__file__).resolve().parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu" and not args.small
    # 2^25 bases ~ a human chromosome 21 (chromosome-scale); the TPU
    # sort's superlinear cost makes 50M builds 4x slower for no extra
    # benchmark signal
    glen = args.genome or ((1 << 25) if on_tpu else 1_000_000)
    batch = args.batch or (1 << 20 if on_tpu else 1 << 15)
    steps = args.steps or (10 if on_tpu else 4)

    import jax.numpy as jnp

    import bwt_tpu
    from bwt_tpu.ops import search

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=glen).astype(np.uint8)  # fmitest.c:128-129

    import sys

    print(
        f"bench: building {glen}-base index on {platform} "
        "(first-compile latency over remote links can reach minutes)...",
        file=sys.stderr, flush=True,
    )
    t0 = time.perf_counter()
    fmi = bwt_tpu.build_index(codes)
    jax.block_until_ready(fmi.bwt_words)
    build_s = time.perf_counter() - t0
    print(f"bench: index built in {build_s:.1f}s", file=sys.stderr, flush=True)

    seed_k = args.seed_k or (12 if on_tpu else 8)
    seed = search.build_seed_table(fmi, k=min(seed_k, args.plen))
    jax.block_until_ready(seed.rows)

    # random 12-mers sampled from the genome (all hit, like fmitest's
    # uniform random queries over a random genome)
    starts = rng.integers(0, glen - args.plen, size=batch)
    pats = np.stack(
        [codes[s : s + args.plen] for s in starts[: min(batch, 1 << 16)]]
    ).astype(np.int32)
    reps = (batch + pats.shape[0] - 1) // pats.shape[0]
    pats = np.tile(pats, (reps, 1))[:batch]
    lens = np.full((batch,), args.plen, np.int32)
    widen = jax.jit(lambda x: x.astype(jnp.int32))
    pats_d = widen(jnp.asarray(pats.astype(np.uint8)))  # 4x less upload
    lens_d = jnp.asarray(lens)

    counts = search.reverse_search(fmi, pats_d, lens_d, seed_table=seed)
    jax.block_until_ready(counts)  # compile + warm

    t0 = time.perf_counter()
    for _ in range(steps):
        counts = search.reverse_search(fmi, pats_d, lens_d, seed_table=seed)
    jax.block_until_ready(counts)
    dt = time.perf_counter() - t0

    sps = steps * batch / dt
    print(
        json.dumps(
            {
                "metric": "exact_backward_searches_per_sec_per_chip",
                "value": round(sps, 1),
                "unit": f"searches/s ({args.plen}bp, {glen}b genome, {platform}; build {build_s:.1f}s)",
                "vs_baseline": round(sps / 10_000_000, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
