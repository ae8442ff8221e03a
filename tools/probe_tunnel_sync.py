"""Measure the axon tunnel's dispatch->fetch sync floor (round 5's
pivotal instrument).

Findings on this environment (2026-08-21): a warm jitted call whose
result is fetched costs ~25 ms REGARDLESS of compute size (scalar or
1M-element), and 8 chained dispatches + one fetch cost the same ~25 ms
— dispatches are free/pipelined, the FETCH SYNC is the floor.  Two
consequences that shaped the aligner work:

  * per-dispatch timing probes are fetch-polluted by ~25 ms — measure
    stage DELTAS, or dispatch everything and sync once (the device
    -floor methodology, tools/probe_device_floor.py);
  * any host-side sync in a pipeline (exact DP-bucket counts, redo
    fetches) costs its queue position, not just the transfer.

Usage: python tools/probe_tunnel_sync.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))

    @jax.jit
    def f(x):
        return x + 1

    @jax.jit
    def g(x):
        return (x * 2 + 1).sum()

    x = jnp.ones((), jnp.int32)
    y = jnp.ones((1 << 20,), jnp.int32)
    np.asarray(f(x)); np.asarray(g(y))
    for name, fn, a in (("scalar", f, x), ("1M-elem", g, y)):
        best = min(_t(fn, a) for _ in range(20))
        print(f"{name}: {best*1e3:.2f} ms")
    best = None
    for _ in range(10):
        t0 = time.perf_counter()
        z = x
        for _ in range(8):
            z = f(z)
        np.asarray(z)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"8 chained dispatches + 1 fetch: {best*1e3:.2f} ms")


def _t(fn, a):
    t0 = time.perf_counter()
    np.asarray(fn(a))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
