"""Algorithm-behavior probes mirroring gaptest.c:79-116: a read made
of two 15-mers from *different* genome positions; mms must recover the
second half first (it searches suffix-first), and after consuming it,
the first half."""

import numpy as np

import bwt_tpu
from bwt_tpu.ops import search
from bwt_tpu.utils import profiling

from host_ref import random_codes


def test_mms_recovers_both_halves_of_gapped_read(rng):
    codes = random_codes(rng, 4000)
    fmi = bwt_tpu.build_index(codes)
    B = 20
    pats = np.zeros((B, 30), np.int32)
    p1 = np.zeros((B,), np.int64)
    p2 = np.zeros((B,), np.int64)
    for b in range(B):
        a = int(rng.integers(0, 3000))
        c = int(rng.integers(0, 3000))
        pats[b, :15] = codes[a : a + 15]
        pats[b, 15:] = codes[c : c + 15]
        p1[b], p2[b] = a, c
    lens = np.full((B,), 30, np.int32)
    m, sp, ep = search.mms(fmi, pats, lens)
    m, sp = np.asarray(m), np.asarray(sp)
    pos2 = np.asarray(search.unc_sa(fmi, sp))
    hits = 0
    for b in range(B):
        if m[b] == 15:  # matched exactly the second 15-mer
            if np.array_equal(codes[pos2[b] : pos2[b] + 15], pats[b, 15:]):
                hits += 1
            # now the first half via the remaining prefix
            m1, sp1, _ = search.mms(fmi, pats[b : b + 1, :15], np.array([15], np.int32))
            if int(np.asarray(m1)[0]) == 15:
                q = int(np.asarray(search.unc_sa(fmi, np.asarray(sp1)))[0])
                assert np.array_equal(codes[q : q + 15], pats[b, :15])
    assert hits >= B // 2  # random 15-mers on 4kb are usually unique


def test_phase_timers():
    ph = profiling.Phases()
    with ph("a"):
        pass
    with ph("a"):
        pass
    assert ph.counts["a"] == 2
    assert ph.seconds("a") >= 0
    assert "a" in ph.report()
    assert ph.rate("missing", 10) == 0.0
    assert ph.rate("a", 10) >= 0.0


def test_device_trace_writes_profile(tmp_path):
    """device_trace produces a real profiler artifact on CPU."""
    import jax.numpy as jnp

    from bwt_tpu.utils import profiling

    with profiling.device_trace(str(tmp_path)):
        jnp.arange(128).sum().block_until_ready()
    produced = list(tmp_path.rglob("*"))
    assert any(p.is_file() for p in produced), produced
