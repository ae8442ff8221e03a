"""config.elastic_fallback: opt-in device-failure recovery for the
drivers.  Fault-injected: the device engine raises JaxRuntimeError
mid-call; with the flag set the driver rebuilds on the CPU backend and
re-runs the host engine (identical outputs by the engines' pinned
equivalence); without it the error propagates — test suites must see
real device bugs.
"""

import dataclasses

import numpy as np
import pytest

import jax

import bwt_tpu
from bwt_tpu import codec
from bwt_tpu.config import DEFAULT
from bwt_tpu.models import aligner, rnaseq


@pytest.fixture(scope="module")
def env():
    g = codec.random_genome(4000, seed=31)
    fmi = bwt_tpu.build_index(g, sa_sample_rate=8)
    codes = codec.encode_genome(g)
    rng = np.random.default_rng(3)
    reads = []
    for _ in range(24):
        j = int(rng.integers(0, len(codes) - 60))
        r = codes[j : j + 60].copy()
        r[int(rng.integers(0, 60))] = int(rng.integers(0, 6))
        reads.append(r)
    return g, fmi, reads


def test_align_reads_elastic_fallback(env, monkeypatch):
    g, fmi, reads = env
    want = aligner.align_reads(fmi, g, reads, engine="host",
                               with_strand=True)

    def boom(*a, **kw):
        raise jax.errors.JaxRuntimeError("injected device failure")

    monkeypatch.setattr(aligner, "_align_reads_device", boom)
    cfg = dataclasses.replace(DEFAULT, elastic_fallback=True)
    got = aligner.align_reads(fmi, g, reads, engine="device",
                              with_strand=True, config=cfg)
    for k, (h, d) in enumerate(zip(want, got)):
        assert h[0] == d[0] and h[2] == d[2], (k, h, d)
        assert (str(h[1]) == str(d[1])) if h[1] else d[1] is None

    # without the flag the failure must surface
    with pytest.raises(jax.errors.JaxRuntimeError):
        aligner.align_reads(fmi, g, reads, engine="device")


def test_rna_seq_elastic_fallback(env, monkeypatch):
    g, fmi, reads = env
    rr = [r[:50] for r in reads]
    want = rnaseq.rna_seq(fmi, rr, engine="host")

    def boom(*a, **kw):
        raise jax.errors.JaxRuntimeError("injected device failure")

    monkeypatch.setattr(rnaseq, "rna_seq_device", boom)
    cfg = dataclasses.replace(DEFAULT, elastic_fallback=True)
    got = rnaseq.rna_seq(fmi, rr, engine="device", config=cfg)
    np.testing.assert_array_equal(want, got)

    with pytest.raises(jax.errors.JaxRuntimeError):
        rnaseq.rna_seq(fmi, rr, engine="device")
