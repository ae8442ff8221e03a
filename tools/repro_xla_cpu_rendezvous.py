"""Reproducer/regression probe for an XLA:CPU in-process collectives
crash: data-independent programs containing psums over the same
shard_map axis can execute CONCURRENTLY per device, and since every
shard_map collective lowers with ``channel_id=1``, the runtime
rendezvous key {run_id, replica_group, op_id} cannot distinguish them —
concurrent instances collide and the process CHECK-fails or segfaults:

    F rendezvous.h:356 Check failed: state.use_count() == num_threads
      (3 vs. 2) Unexpected number of participants: all reduce
      RendezvousKey{run_id=..., global_devices=[0,1],
      num_local_participants=2, collective_op_kind=cross_module, op_id=1}

Observed on jax 0.9.0 with 8 virtual CPU devices.  The trigger needs
specific thunk-scheduling timing; the deterministic in-repo trigger was
the tp-sharded aligner automaton on N-bearing reads (the service
epilogue ran ``unc_sa`` and ``isa_window`` as data-independent loops,
each with one psum per iteration).  This script runs exactly that
workload through the public API:

  * at commit 46d864d (pre-fix) it aborts/segfaults deterministically;
  * at HEAD it passes — the fix chains every tp collective into one
    sequential data-dependency path (ops/rank.rows2 fuses paired row
    fetches, ops/search._resolve_step shares the N-resolution fetch
    with the LF step, and ops/search.walk_and_window_tp fuses the
    unc_sa walk + isa_window scan into one loop with a single variadic
    all-reduce per iteration).

Note ``lax.optimization_barrier`` does NOT order collectives here: the
CPU pipeline erases barriers before thunk emission, so they never
become edges in the thunk executor's dependency graph.  Only real data
dependencies serialize.

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/repro_xla_cpu_rendezvous.py
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    assert len(jax.devices()) >= 8, (
        "need XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    import bwt_tpu
    from bwt_tpu import codec, parallel
    from bwt_tpu.models import aligner

    g = codec.random_genome(6000, seed=21)
    fmi = bwt_tpu.build_index(g, sa_sample_rate=8)
    codes = codec.encode_genome(g)
    rng = np.random.default_rng(9)
    reads = []
    for _ in range(40):
        j = int(rng.integers(0, len(codes) - 80))
        r = codes[j : j + 80].copy()
        for _ in range(int(rng.integers(0, 3))):
            k = int(rng.integers(0, 80))
            r[k] = rng.integers(0, 6)  # incl. N (code 5) -> resolve path
        reads.append(r)

    mesh = parallel.make_mesh(8, tp=2)
    single = aligner.align_reads(fmi, g, reads, engine="device",
                                 with_strand=True)
    meshed = aligner.align_reads(fmi, g, reads, engine="device",
                                 with_strand=True, mesh=mesh)
    for k, (h, d) in enumerate(zip(single, meshed)):
        assert h[0] == d[0] and h[2] == d[2], (k, h, d)
    print("tp=2 aligner on N-bearing reads: no crash, outputs match "
          "single-device (the pre-fix formulation aborts here)")


if __name__ == "__main__":
    sys.exit(main())
