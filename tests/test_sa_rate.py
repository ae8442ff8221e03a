"""Dense SA sampling: same results, shorter LF walks, exportable."""

import numpy as np

import bwt_tpu
from bwt_tpu import codec
from bwt_tpu import io as bio
from bwt_tpu.ops import search

from host_ref import HostFMI, random_codes


def test_dense_rate_matches_default(rng, tmp_path):
    codes = random_codes(rng, 900)
    fmi32 = bwt_tpu.build_index(codes)
    fmi8 = bwt_tpu.build_index(codes, sa_sample_rate=8)
    idxs = np.arange(901, dtype=np.int32)
    assert np.array_equal(
        np.asarray(search.unc_sa(fmi32, idxs)),
        np.asarray(search.unc_sa(fmi8, idxs)),
    )
    # reference-format export downsamples back to rate 32: byte parity
    p32, p8 = tmp_path / "a.idx", tmp_path / "b.idx"
    bio.write_ref_index(fmi32, p32)
    bio.write_ref_index(fmi8, p8)
    assert p32.read_bytes() == p8.read_bytes()
    # npz round-trip preserves the rate
    pn = tmp_path / "c.npz"
    bio.write_npz_index(fmi8, pn)
    back = bio.read_npz_index(pn)
    assert back.sa_rate == 8
    # inverse-SA samples survive the round trip (window queries stay fast)
    assert back.isa_samples is not None
    assert np.array_equal(
        np.asarray(back.isa_samples), np.asarray(fmi8.isa_samples)
    )
    assert np.array_equal(
        np.asarray(search.unc_sa(back, idxs)),
        np.asarray(search.unc_sa(fmi32, idxs)),
    )
