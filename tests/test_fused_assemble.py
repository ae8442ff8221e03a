"""The aligner's fused (device-side) phase B must be bit-identical to
the host stitch-log replay (models/aligner._assemble_logs vs
_assemble_logs_fused), including every escape path."""

import numpy as np
import pytest

import bwt_tpu
from bwt_tpu.models import aligner
from bwt_tpu.models.batch_exec import (
    _RLE_R, _dp_blocks_core, _ops_to_runs, _rle_device,
)


@pytest.fixture(scope="module")
def env():
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=120_000).astype(np.uint8)
    fmi = bwt_tpu.build_index(codes, sa_sample_rate=8)
    return codes, fmi, rng


def _mk_reads(codes, rng):
    from tools.bench_drivers import make_reads

    reads = list(make_reads(codes, 160, 80, rng))
    reads += list(rng.integers(0, 4, size=(24, 80)).astype(np.uint8))
    dbl = make_reads(codes, 48, 80, rng)
    for k in range(len(dbl)):
        dbl[k, rng.integers(0, 80, size=3)] ^= 1
    reads += list(dbl)
    nr = make_reads(codes, 16, 80, rng)
    nr[np.arange(len(nr)), rng.integers(0, 80, len(nr))] = 5
    reads += list(nr)
    reads += [r[:20] for r in make_reads(codes, 8, 80, rng)]
    return reads


def _eq(a, b):
    pa, ca, sa = a
    pb, cb, sb = b
    assert pa == pb and sa == sb
    assert (ca is None) == (cb is None)
    if ca is not None:
        assert ca.ops == cb.ops


def test_fused_matches_host_assemble(env, monkeypatch):
    codes, fmi, rng = env
    reads = _mk_reads(codes, rng)
    monkeypatch.setattr(aligner, "_FUSED_ASSEMBLE", True)
    fused = aligner.align_reads(fmi, codes, reads, with_strand=True)
    monkeypatch.setattr(aligner, "_FUSED_ASSEMBLE", False)
    host = aligner.align_reads(fmi, codes, reads, with_strand=True)
    for a, b in zip(fused, host):
        _eq(a, b)
    assert sum(1 for p, _, _ in fused if p) > len(reads) // 2


def test_fused_redo_path_matches_host(env, monkeypatch):
    """Run-width overflows in the device compose must re-compose on the
    host path (NOT the generator) and stay bit-identical: _RUNS_K=1
    forces every multi-run read through the redo branch."""
    codes, fmi, rng = env
    reads = _mk_reads(codes, rng)
    calls = []
    orig = aligner._assemble_logs

    def spy(*a, **kw):
        if kw.get("lanes") is not None:
            calls.append(len(kw["lanes"]))
        return orig(*a, **kw)

    monkeypatch.setattr(aligner, "_assemble_logs", spy)
    monkeypatch.setattr(aligner, "_RUNS_K", 1)
    monkeypatch.setattr(aligner, "_FUSED_ASSEMBLE", True)
    fused = aligner.align_reads(fmi, codes, reads, with_strand=True)
    monkeypatch.setattr(aligner, "_FUSED_ASSEMBLE", False)
    monkeypatch.setattr(aligner, "_assemble_logs", orig)
    host = aligner.align_reads(fmi, codes, reads, with_strand=True)
    for a, b in zip(fused, host):
        _eq(a, b)
    assert calls and sum(calls) > 0  # the redo branch actually ran


def test_fused_matches_host_pipelined(env, monkeypatch):
    """Chunked (pipelined) fused phase B stays order-preserving."""
    import dataclasses

    from bwt_tpu.config import DEFAULT

    codes, fmi, rng = env
    reads = _mk_reads(codes, rng)
    cfg = dataclasses.replace(DEFAULT, search_batch=64)
    monkeypatch.setattr(aligner, "_FUSED_ASSEMBLE", True)
    fused = aligner.align_reads(
        fmi, codes, reads, config=cfg, with_strand=True)
    monkeypatch.setattr(aligner, "_FUSED_ASSEMBLE", False)
    host = aligner.align_reads(
        fmi, codes, reads, config=cfg, with_strand=True)
    for a, b in zip(fused, host):
        _eq(a, b)


def test_dp_blocks_core_matches_host_decoder(rng=None):
    """Device block building (_dp_blocks_core) vs the host RLE decoder
    (_ops_to_runs) on random walk-order op rows, both flip parities."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    J, S = 64, 40
    # random runs: segments of ops 0/1/2 followed by trailing 3-padding
    ops = np.full((J, S), 3, np.int8)
    for j in range(J):
        t = 0
        while t < S and rng.random() < 0.93:
            ln = int(rng.integers(1, 6))
            ops[j, t : t + ln] = int(rng.integers(0, 3))
            t += ln
    i_res = rng.integers(0, 3, size=J).astype(np.int32)
    j_res = rng.integers(0, 3, size=J).astype(np.int32)
    flip = (np.arange(J) % 2 == 0)
    nrun, vals, counts = (np.asarray(x) for x in _rle_device(
        jnp.asarray(ops)))
    maxloc = np.zeros(J, np.int32)
    bo, bc, bl, over = (np.asarray(x) for x in _dp_blocks_core(
        jnp.asarray(maxloc), jnp.asarray(i_res), jnp.asarray(j_res),
        jnp.asarray(nrun), jnp.asarray(vals), jnp.asarray(counts),
        jnp.asarray(flip)))
    chars = "MID"
    for j in range(J):
        expect = _ops_to_runs(ops[j], int(i_res[j]), int(j_res[j]))
        if over[j]:
            assert len([x for x in ops[j] if x != 3]) and nrun[j] > _RLE_R
            continue
        got = [(chars[bo[j, q]], int(bc[j, q])) for q in range(bl[j])]
        if flip[j]:
            expect = expect[::-1]
        assert got == expect, (j, got, expect)


def test_compose_device_merge_and_overflow():
    """_compose_device: M/I singletons + job blocks concatenate in log
    order, adjacent equal ops merge (count-0 runs kept), and streams
    beyond _RUNS_K merged runs raise the overflow flag."""
    import jax.numpy as jnp

    from bwt_tpu.models.aligner import (
        _K_I, _K_M, _K_NW, _LOGN, _RUNS_K, _compose_device,
    )

    n, W = 4, _RLE_R + 2
    kinds = np.zeros((n, _LOGN), np.int8)
    glens = np.zeros((n, _LOGN), np.int16)
    lp = np.zeros(n, np.int32)
    mode = np.array([1, 1, 2, 1], np.int32)
    curpos = np.array([100, 50, 7, 900], np.int32)
    head_end = np.array([10, 0, 0, 0], np.int32)
    runs_o = np.zeros((n, _LOGN, W), np.int32)
    runs_c = np.zeros((n, _LOGN, W), np.int32)
    bl3 = np.zeros((n, _LOGN), np.int32)

    # lane 0: NW block [M2, I1] ; M 5 ; I 0  -> M2 I1 M5 I0 (0-count kept)
    kinds[0, :3] = [_K_NW, _K_M, _K_I]
    runs_o[0, 0, :2] = [0, 1]
    runs_c[0, 0, :2] = [2, 1]
    bl3[0, 0] = 2
    glens[0, 1] = 5
    glens[0, 2] = 0
    lp[0] = 3
    # lane 1: M 3 ; M 4 -> merges to M 7
    kinds[1, :2] = [_K_M, _K_M]
    glens[1, :2] = [3, 4]
    lp[1] = 2
    # lane 2: mode 2, empty log
    # lane 3: a 3-run job block + 15 alternating M/I singletons ->
    # 18 merged runs (the I-D-I block doesn't merge into the first M)
    kinds[3, 0] = _K_NW
    runs_o[3, 0, :3] = [1, 2, 1]
    runs_c[3, 0, :3] = [1, 1, 1]
    bl3[3, 0] = 3
    alt = ([_K_M, _K_I] * _LOGN)[: _LOGN - 1]
    kinds[3, 1:] = alt
    glens[3] = 1
    lp[3] = _LOGN
    assert 3 + (_LOGN - 1) > _RUNS_K  # the overflow premise

    # the packed (op+2)<<24 | count accumulator form _dp_scatter_bucket
    # writes (entries past each block length are never read)
    runs_oc = ((runs_o + 2) << 24) | runs_c
    fo, fc, nr, res, over = (np.asarray(x) for x in _compose_device(
        jnp.asarray(kinds), jnp.asarray(glens), jnp.asarray(lp),
        jnp.asarray(mode), jnp.asarray(curpos), jnp.asarray(head_end),
        jnp.asarray(runs_oc), jnp.asarray(bl3)))

    assert res.tolist() == [90, 50, 7, 900]
    assert not over[0] and nr[0] == 4
    assert fo[0, :4].tolist() == [0, 1, 0, 1]
    assert fc[0, :4].tolist() == [2, 1, 5, 0]
    assert nr[1] == 1 and fo[1, 0] == 0 and fc[1, 0] == 7
    assert nr[2] == 0
    assert over[3] and nr[3] == _RUNS_K + 1


def test_compose_device_count_overflow():
    """A merged run whose int32 count sum exceeds int16 must raise the
    overflow flag (-> host fallback) instead of wrapping in the final
    int16 cast — the host path composes in int64."""
    import jax.numpy as jnp

    from bwt_tpu.models.aligner import (
        _K_M, _K_NW, _LOGN, _compose_device,
    )

    n, W = 2, _RLE_R + 2
    kinds = np.zeros((n, _LOGN), np.int8)
    glens = np.zeros((n, _LOGN), np.int16)
    lp = np.zeros(n, np.int32)
    mode = np.ones(n, np.int32)
    curpos = np.array([500, 500], np.int32)
    head_end = np.zeros(n, np.int32)
    runs_o = np.zeros((n, _LOGN, W), np.int32)
    runs_c = np.zeros((n, _LOGN, W), np.int32)
    bl3 = np.zeros((n, _LOGN), np.int32)

    # lane 0: M 20000 ; M 15000 -> merged 35000 > 32767: overflow
    kinds[0, :2] = [_K_M, _K_M]
    glens[0, :2] = [20000, 15000]
    lp[0] = 2
    # lane 1: job block M 30000 ; M 2000 -> merged 32000: fits, exact
    kinds[1, :2] = [_K_NW, _K_M]
    runs_o[1, 0, 0] = 0
    runs_c[1, 0, 0] = 30000
    bl3[1, 0] = 1
    glens[1, 1] = 2000
    lp[1] = 2

    runs_oc = ((runs_o + 2) << 24) | runs_c
    fo, fc, nr, res, over = (np.asarray(x) for x in _compose_device(
        jnp.asarray(kinds), jnp.asarray(glens), jnp.asarray(lp),
        jnp.asarray(mode), jnp.asarray(curpos), jnp.asarray(head_end),
        jnp.asarray(runs_oc), jnp.asarray(bl3)))

    assert over[0]
    assert not over[1] and nr[1] == 1 and int(fc[1, 0]) == 32000


def test_long_reads_route_to_host_engine(env):
    """Reads past the automaton's int16 stitch-log width must not run
    on the device engine: auto demotes to host, explicit device
    raises."""
    codes, fmi, rng = env
    # an exact substring: unique full-length anchor, no DP blow-up
    long_read = codes[1000:34000].astype(np.uint8)
    assert len(long_read) > 32767
    res = aligner.align_reads(fmi, codes, [long_read])  # auto -> host
    assert len(res) == 1 and res[0][0] == 1001
    with pytest.raises(ValueError, match="int16 stitch-log"):
        aligner.align_reads(fmi, codes, [long_read], engine="device")
