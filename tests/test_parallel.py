"""Sharding tests on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import numpy as np

import jax

import bwt_tpu
from bwt_tpu import codec, parallel
from bwt_tpu.ops import search


def _problem(batch):
    g = codec.random_genome(3000, seed=3)
    fmi = bwt_tpu.build_index(g)
    codes = codec.encode_genome(g)
    rng = np.random.default_rng(0)
    starts = rng.integers(0, 3000 - 20, size=batch)
    pats = np.stack([codes[s : s + 20] for s in starts]).astype(np.int32)
    lens = np.full((batch,), 20, np.int32)
    return fmi, pats, lens, starts


def test_replicated_dp_matches_single_device():
    assert len(jax.devices()) >= 8
    fmi, pats, lens, _ = _problem(64)
    want = np.asarray(search.locate(fmi, pats, lens))

    mesh = parallel.make_mesh(8, tp=1)
    fmi_r = parallel.replicate_index(fmi, mesh)
    p, l = parallel.shard_patterns(pats, lens, mesh)
    pos, counts, total = parallel.sharded_search_step(fmi_r, p, l, mesh)
    got = parallel.gather_hits(pos)
    assert np.array_equal(got, want)
    assert int(total) == int(np.sum(want >= 0))


def test_sharded_index_matches_replicated():
    fmi, pats, lens, _ = _problem(32)
    mesh = parallel.make_mesh(8, tp=4)
    p, l = parallel.shard_patterns(pats, lens, mesh)
    pos_r, _, _ = parallel.sharded_search_step(
        parallel.replicate_index(fmi, mesh), p, l, mesh
    )
    pos_s, _, _ = parallel.sharded_search_step(
        parallel.shard_index(fmi, mesh), p, l, mesh
    )
    assert np.array_equal(np.asarray(pos_r), np.asarray(pos_s))


def test_graft_entry_single_and_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, example_args = mod.entry()
    out = jax.jit(fn)(*example_args)
    assert np.asarray(out).shape == (64,)
    assert (np.asarray(out) >= 0).all()  # sampled substrings all locate
    mod.dryrun_multichip(8)
    mod.dryrun_multichip(4)
