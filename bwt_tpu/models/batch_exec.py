"""Batched coroutine executor: bit-exact sequential control flow per
read, device execution batched across reads.

The reference's alignment drivers (single_align.c:26-298) are
intrinsically sequential per read — nested retry loops, data-dependent
branches — exactly what a TPU cannot trace.  Rather than translating
that control flow into masked device loops (combinatorial states), each
read runs its driver as a host *generator* that yields FM-index query
requests; this scheduler collects one pending request per live read
each round, groups them by op, executes each group as a single padded
batched device call, and feeds results back.  Per-read call sequences
(and therefore outputs) are identical to running each read alone, but
every rank/LF/locate walk crosses the host→device boundary batched.

Request protocol (generator ``yield`` values):
  ("mms", pattern_codes, length)            -> (matched, sp, ep)
  ("mms_continue", pattern, length, sp, ep) -> (matched, sp, ep)
  ("unc_sa", idx)                           -> position
  ("unc_sa_range", start, end)              -> np.array positions [start,end)
  ("crank", c, idx)                         -> C[c] + rank(c, idx)
  ("bsearch", pattern, length)              -> dict of backward_search
                                               results (no N handling)

Generators terminate via ``return value`` (StopIteration).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bwt_tpu.index import FMIndex
from bwt_tpu.ops import rank as rank_ops
from bwt_tpu.ops import search


def _pow2(n: int, floor: int = 8) -> int:
    n = max(n, floor)
    return 1 << (n - 1).bit_length()


@functools.partial(jax.jit, static_argnames=())
def _crank_batch(fmi: FMIndex, c: jax.Array, idx: jax.Array) -> jax.Array:
    return search.take_c(fmi.C, c) + rank_ops.rank(
        fmi.buckets, fmi.endloc, c, idx
    )


class BatchExecutor:
    """Runs a set of request-yielding generators to completion,
    batching same-op requests across generators each round."""

    def __init__(self, fmi: FMIndex):
        self.fmi = fmi

    # -- batched device ops (padded to power-of-two shapes so jit
    #    compilations are reused across rounds) -------------------------

    def _pad_patterns(self, pats, lens):
        B = _pow2(len(pats))
        # length pads to a multiple of 16: the lockstep loop runs L
        # steps, so pow2 padding would waste up to 2x steps per call
        L = max(16, -(-max((int(l) for l in lens), default=1) // 16) * 16)
        arr = np.zeros((B, L), np.int32)
        lns = np.ones((B,), np.int32)
        for k, (p, l) in enumerate(zip(pats, lens)):
            l = int(l)
            if l > 0:
                arr[k, :l] = np.asarray(p[:l], np.int32)
            lns[k] = l  # <=0 lengths flow through masked loops untouched
        return arr, lns

    def _run_mms(self, reqs):
        pats = [r[1] for r in reqs]
        lens = [r[2] for r in reqs]
        arr, lns = self._pad_patterns(pats, lens)
        m, sp, ep = search.mms(self.fmi, jnp.asarray(arr), jnp.asarray(lns))
        m, sp, ep = np.asarray(m), np.asarray(sp), np.asarray(ep)
        return [(int(m[k]), int(sp[k]), int(ep[k])) for k in range(len(reqs))]

    def _run_mms_continue(self, reqs):
        pats = [r[1] for r in reqs]
        lens = [r[2] for r in reqs]
        arr, lns = self._pad_patterns(pats, lens)
        # dummy lanes: empty incoming interval is fine (yields -1, unused)
        sp = np.zeros((arr.shape[0],), np.int32)
        ep = np.zeros((arr.shape[0],), np.int32)
        for k, r in enumerate(reqs):
            sp[k], ep[k] = int(r[3]), int(r[4])
        m, osp, oep = search.mms_continue(
            self.fmi, jnp.asarray(arr), jnp.asarray(lns),
            jnp.asarray(sp), jnp.asarray(ep),
        )
        m, osp, oep = np.asarray(m), np.asarray(osp), np.asarray(oep)
        return [(int(m[k]), int(osp[k]), int(oep[k])) for k in range(len(reqs))]

    def _run_bsearch(self, reqs):
        pats = [r[1] for r in reqs]
        lens = [r[2] for r in reqs]
        arr, lns = self._pad_patterns(pats, lens)
        r = search.backward_search(self.fmi, jnp.asarray(arr), jnp.asarray(lns))
        r = {k: np.asarray(v) for k, v in r.items()}
        return [
            {k: (bool(v[i]) if v.dtype == bool else int(v[i])) for k, v in r.items()}
            for i in range(len(reqs))
        ]

    def _run_unc_sa_flat(self, idxs: list[int]) -> np.ndarray:
        B = _pow2(len(idxs))
        arr = np.zeros((B,), np.int32)
        arr[: len(idxs)] = idxs
        return np.asarray(search.unc_sa(self.fmi, jnp.asarray(arr)))[: len(idxs)]

    def _run_crank(self, reqs):
        B = _pow2(len(reqs))
        c = np.zeros((B,), np.int32)
        idx = np.zeros((B,), np.int32)
        for k, r in enumerate(reqs):
            c[k], idx[k] = int(r[1]), int(r[2])
        out = np.asarray(_crank_batch(self.fmi, jnp.asarray(c), jnp.asarray(idx)))
        return [int(out[k]) for k in range(len(reqs))]

    # -- scheduler -------------------------------------------------------

    def run(self, gens: list) -> list:
        """Drive all generators to completion; returns their values."""
        n = len(gens)
        results = [None] * n
        live: dict[int, object] = {}
        pending: dict[int, tuple] = {}

        def step(i, send_value):
            try:
                pending[i] = gens[i].send(send_value)
                live[i] = gens[i]
            except StopIteration as e:
                results[i] = e.value
                live.pop(i, None)
                pending.pop(i, None)

        for i in range(n):
            step(i, None)

        while live:
            by_op: dict[str, list[int]] = {}
            for i in list(live):
                by_op.setdefault(pending[i][0], []).append(i)
            replies: dict[int, object] = {}
            for op, members in by_op.items():
                reqs = [pending[i] for i in members]
                if op == "mms":
                    outs = self._run_mms(reqs)
                elif op == "mms_continue":
                    outs = self._run_mms_continue(reqs)
                elif op == "bsearch":
                    outs = self._run_bsearch(reqs)
                elif op == "crank":
                    outs = self._run_crank(reqs)
                elif op == "unc_sa":
                    flat = self._run_unc_sa_flat([int(r[1]) for r in reqs])
                    outs = [int(x) for x in flat]
                elif op == "unc_sa_range":
                    spans = [(int(r[1]), int(r[2])) for r in reqs]
                    flat_idx = [i for s, e in spans for i in range(s, e)]
                    if flat_idx:
                        flat = self._run_unc_sa_flat(flat_idx)
                    else:
                        flat = np.zeros((0,), np.int32)
                    outs, off = [], 0
                    for s, e in spans:
                        outs.append(flat[off : off + (e - s)])
                        off += e - s
                else:  # pragma: no cover
                    raise ValueError(f"unknown request op {op!r}")
                for i, out in zip(members, outs):
                    replies[i] = out
            for i, out in replies.items():
                step(i, out)
        return results
