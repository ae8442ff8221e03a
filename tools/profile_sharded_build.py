"""Scaling curve for the sharded (beyond-one-chip) suffix build —
VERDICT r3 #7's second half: round counts and communication volume on
the p-device mesh, so the >1-chip build story carries numbers, not
just bit-equality.

Per doubling round the distributed sort runs TWO odd-even merge-split
sorts (the (rank, rank2, idx) 3-array sort and the (sa, ranks) rerank
sort), each p neighbor-exchange steps moving the full shard per step,
plus two static ppermute shifts and one (p,)-scalar all_gather
(parallel/suffix_dist.py).  So per doubling round, per device:

    bytes moved ~ (3 + 2) arrays x p exchange steps x (m/p) elems x 4 B
                + 2 shift ppermutes x (m/p) x 4 B
    = (5 p + 2) x (m/p) x 4 B   ->  ~20 x m x 4 B / device at large p

i.e. total cross-link volume per round is ~O(m x p) x 4 B for the
exchanges — the price of a comparison-based distributed sort; the
doubling-round COUNT is the log-genome term and is what this script
measures empirically (random genomes finish in 2 rounds after the
12-char initial ranks; repeats run deeper).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/profile_sharded_build.py [--sizes 1e5,1e6,4e6]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,1000000,4000000")
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from bwt_tpu import parallel
    from bwt_tpu.ops import suffix
    from bwt_tpu.parallel import suffix_dist

    p = args.devices
    assert len(jax.devices()) >= p, (
        f"need XLA_FLAGS=--xla_force_host_platform_device_count={p}"
    )
    mesh = parallel.make_mesh(p, tp=p)
    rng = np.random.default_rng(0)

    print(f"p = {p} devices; per round: 2 merge-split sorts x {p} "
          f"exchange steps + 2 shift ppermutes + 1 scalar all_gather")
    for tok in args.sizes.split(","):
        n = int(float(tok))
        for name, codes in (
            ("random", rng.integers(0, 4, size=n).astype(np.uint8)),
            ("tandem-repeat", np.tile(
                np.array([0, 1, 2, 3, 0, 1], np.uint8), n // 6 + 1)[:n]),
        ):
            m = n + 1
            # doubling rounds: k starts at 12 (the packed initial
            # ranks) and doubles until all ranks distinct
            want = np.asarray(suffix.suffix_array(codes))
            t0 = time.perf_counter()
            got = suffix_dist.sharded_suffix_array(codes, mesh, axis="tp")
            dt = time.perf_counter() - t0
            assert np.array_equal(want, got)
            # count doubling rounds by replaying the loop in numpy:
            # initial ranks = 12-char prefix groups (sentinel-adjusted
            # tie digit makes tails unique, as ops/suffix does), then
            # sort by (rank, rank@+k) and re-rank until dense
            ext = np.concatenate([codes.astype(np.int64) + 1,
                                  np.zeros(1, np.int64)])
            key12 = np.zeros(m, np.int64)
            for c in range(12):
                nxtc = np.zeros(m, np.int64)
                nxtc[: m - c] = ext[c:]
                key12 = key12 * 5 + nxtc
            _, r = np.unique(key12, return_inverse=True)
            k, rounds = 12, 0
            while len(np.unique(r)) != m and k < 2 * m:
                r2 = np.full(m, -1, np.int64)
                r2[: m - k] = r[k:]
                order = np.lexsort((r2, r))
                pair = r[order] * (m + 2) + r2[order] + 1
                newr = np.empty(m, np.int64)
                newr[order] = np.cumsum(
                    np.concatenate([[0], (np.diff(pair) != 0)
                                    .astype(np.int64)]))
                r = newr
                k *= 2
                rounds += 1
            per_dev = m // p + 1
            vol = (5 * p + 2) * per_dev * 4 * rounds / 1e6
            print(f"  n={n:>9} {name:<14} rounds={rounds} "
                  f"wall={dt:6.2f}s  ~comm/device={vol:8.1f} MB "
                  f"(exchange-step model)")


if __name__ == "__main__":
    main()
