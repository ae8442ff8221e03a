"""Multi-chip / multi-host scaling over a `jax.sharding.Mesh`.

The reference's only parallelism is 4 pthreads over shared memory
(histsortcomp.c:113-155, fmitest.c:54-91).  The TPU-native design
(SURVEY.md section 2's parallelism table):

* **dp** (data parallel) — read batches shard across chips; each chip
  runs the identical lockstep backward-search program on its shard.
  This is the production axis: the FM-index of a chromosome-scale
  genome is small (~37.5% of the text bytes, README.md:12-14) and
  replicates into every chip's HBM.
* **tp** (index/tensor parallel) — for genomes whose index exceeds a
  chip's HBM, the packed-BWT words, Occ checkpoints and sampled SA
  shard along the sequence dimension; rank gathers then resolve
  through XLA-inserted collectives over ICI.
* Hit lists merge by an all-gather of per-shard position arrays; with
  batch order preserved the merged output is bit-identical to the
  single-chip run (deterministic merge).

Multi-host: call `jax.distributed.initialize()` before building the
mesh; the same `NamedSharding`s then span hosts, with XLA routing
intra-slice collectives over ICI and cross-slice over DCN.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bwt_tpu.index import FMIndex
from bwt_tpu.ops import search


def init_distributed(**kwargs) -> None:
    """Multi-host initialization: call once per host process before
    building a mesh (wraps ``jax.distributed.initialize``; no-op if
    already initialized).  After this, ``jax.devices()`` spans the
    slice and the same NamedShardings in this module place data
    across hosts, with XLA routing intra-slice collectives over ICI
    and cross-slice over DCN."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def make_mesh(n_devices: int | None = None, *, tp: int = 1, axis_names=("dp", "tp")) -> Mesh:
    """Mesh over the first ``n_devices`` devices, shaped (dp, tp)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n % tp:
        raise ValueError(f"n_devices={n} not divisible by tp={tp}")
    arr = np.array(devs[:n]).reshape(n // tp, tp)
    return Mesh(arr, axis_names)


def _index_specs(sharded: bool) -> FMIndex:
    """PartitionSpec pytree matching FMIndex's data fields."""
    if sharded:
        return dict(
            bwt_words=P("tp"),
            buckets=P("tp", None),
            sa_samples=P("tp"),
            C=P(),
            endloc=P(),
        )
    return dict(bwt_words=P(), buckets=P(), sa_samples=P(), C=P(), endloc=P())


def _place_index(fmi: FMIndex, mesh: Mesh, specs) -> FMIndex:
    return FMIndex(
        bwt_words=jax.device_put(fmi.bwt_words, NamedSharding(mesh, specs["bwt_words"])),
        buckets=jax.device_put(fmi.buckets, NamedSharding(mesh, specs["buckets"])),
        sa_samples=jax.device_put(fmi.sa_samples, NamedSharding(mesh, specs["sa_samples"])),
        C=jax.device_put(fmi.C, NamedSharding(mesh, specs["C"])),
        endloc=jax.device_put(fmi.endloc, NamedSharding(mesh, specs["endloc"])),
        length=fmi.length,
        sa_rate=fmi.sa_rate,
    )


def replicate_index(fmi: FMIndex, mesh: Mesh) -> FMIndex:
    """Replicate the index into every device's HBM (the fast path)."""
    return _place_index(fmi, mesh, _index_specs(sharded=False))


def shard_index(fmi: FMIndex, mesh: Mesh) -> FMIndex:
    """Shard the index arrays along the sequence dimension over 'tp'
    (for indexes larger than one chip's HBM).  Leading dimensions are
    zero-padded up to the tp size; the padding rows sit past every
    reachable gather index (word <= nwords, sample <= length/32)."""
    tp = mesh.shape["tp"]

    def pad(x):
        n = x.shape[0]
        extra = (-n) % tp
        if extra:
            x = jnp.concatenate(
                [x, jnp.zeros((extra,) + x.shape[1:], x.dtype)]
            )
        return x

    fmi = FMIndex(
        bwt_words=pad(fmi.bwt_words),
        buckets=pad(fmi.buckets),
        sa_samples=pad(fmi.sa_samples),
        C=fmi.C,
        endloc=fmi.endloc,
        length=fmi.length,
        sa_rate=fmi.sa_rate,
    )
    return _place_index(fmi, mesh, _index_specs(sharded=True))


def shard_patterns(patterns, lengths, mesh: Mesh):
    """Shard a read batch across 'dp' (batch must divide dp size)."""
    ps = NamedSharding(mesh, P("dp", None))
    ls = NamedSharding(mesh, P("dp"))
    return (
        jax.device_put(jnp.asarray(patterns, jnp.int32), ps),
        jax.device_put(jnp.asarray(lengths, jnp.int32), ls),
    )


def sharded_search_step(fmi: FMIndex, patterns, lengths, mesh: Mesh):
    """One full data-parallel search step under the mesh: lockstep
    backward search + LF-walk locate of every read, plus the
    cross-shard total of matched reads (a psum-style reduction XLA
    lowers onto ICI).  Returns (positions, match_counts, total_hits);
    positions/counts keep the global batch order (deterministic
    merge).
    """
    @jax.jit
    def step(fmi, patterns, lengths):
        r = search.backward_search(fmi, patterns, lengths)
        emptied_early = (~r["alive"]) & (r["nmatched"] <= lengths - 2)
        pos = search.unc_sa(fmi, r["start"])
        pos = jnp.where(emptied_early, -1, pos)
        counts = jnp.where(r["alive"], r["end"] - r["start"], 0)
        total = jnp.sum((pos >= 0).astype(jnp.int32))
        return pos, counts, total

    with mesh:
        return step(fmi, patterns, lengths)


def gather_hits(positions) -> np.ndarray:
    """All-gather the sharded hit list to the host (global batch order)."""
    return np.asarray(positions)
