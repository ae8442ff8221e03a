"""VERDICT r3 #10 probe: is the k12-seeded search rate dispatch-bound
(amortizable by batching several query blocks through one jit) or at
the true gather floor?

Times reverse_search with the k12 seed table at B lanes per dispatch,
vs TWO independent B-lane blocks fused in one jit, vs one 2B-lane
dispatch.  If the fused-two rate per query materially beats the single
-block rate, the tier is dispatch-latency-bound and worth restructuring;
if all three match per-query, the table row-gather itself is the floor.

Run: python tools/probe_k12_amortize.py [--genome 33554432] [--batch 1048576]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=1 << 25)
    ap.add_argument("--batch", type=int, default=1 << 20)
    ap.add_argument("--plen", type=int, default=12)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    import bwt_tpu
    from bwt_tpu.ops import search

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=args.genome).astype(np.uint8)
    fmi = bwt_tpu.build_index(codes)
    seed = search.build_seed_table(fmi, k=12)
    jax.block_until_ready(seed.rows)

    def mk(n):
        starts = rng.integers(0, args.genome - args.plen, size=n)
        pats = codes[np.add.outer(starts, np.arange(args.plen))]
        return (jnp.asarray(pats).astype(jnp.int32),
                jnp.asarray(np.full((n,), args.plen, np.int32)))

    p1, l1 = mk(args.batch)
    p2, l2 = mk(args.batch)
    pb, lb = mk(2 * args.batch)

    # NB: fmi/seed must be ARGUMENTS, not jit-closure captures — a
    # captured 400 MB seed table becomes an HLO literal and the remote
    # compile request blows the tunnel's size limit (HTTP 413)
    one = lambda p, l: search.reverse_search(fmi, p, l, seed_table=seed)

    @jax.jit
    def two(fmi_, seed_, a, la, b, lb_):
        return (search.reverse_search(fmi_, a, la, seed_table=seed_),
                search.reverse_search(fmi_, b, lb_, seed_table=seed_))

    def bench(fn, *xs, q):
        np.asarray(jax.tree_util.tree_leaves(fn(*xs))[-1][:1])
        t0 = time.perf_counter()
        out = None
        for _ in range(args.steps):
            out = fn(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[-1][:1])
        dt = (time.perf_counter() - t0) / args.steps
        return q / dt

    r1 = bench(one, p1, l1, q=args.batch)
    r2 = bench(two, fmi, seed, p1, l1, p2, l2, q=2 * args.batch)
    r3 = bench(one, pb, lb, q=2 * args.batch)
    print(f"single {args.batch}-lane dispatch: {r1/1e6:.1f} M/s")
    print(f"two blocks fused in one jit:      {r2/1e6:.1f} M/s")
    print(f"one {2*args.batch}-lane dispatch: {r3/1e6:.1f} M/s")


if __name__ == "__main__":
    main()
