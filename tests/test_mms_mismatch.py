"""Direct differential test of the mms_mismatch hypothesis search
(single_align.c:50-160) against an independent host replay — the
integration path (align_read parity vs the C binary) covers it
end-to-end; this pins each branch, including the reference's stale
``ins_end`` reuse across the three insertion attempts."""

import numpy as np

import bwt_tpu
from bwt_tpu import codec
from bwt_tpu.models.aligner import mms_mismatch_gen
from bwt_tpu.models.batch_exec import BatchExecutor

from host_ref import HostFMI, random_codes


def host_mms_mismatch(host, genome, pattern, length, sp, ep):
    """Independent replay of single_align.c:50-160."""
    def mms_continue(pat, ln, s, e):
        return host.mms_continue(list(pat), ln, s, e)

    if length < 2:
        loc = host.unc_sa(sp)
        sub_c = int(genome[max(loc - 1, 0)])
        nsp = host.C[sub_c] + host.rank(sub_c, sp)
        return 1, nsp, nsp + 1, 0

    best_align, best_pos, skips = 0, -1, None
    for i in range(sp, ep):
        loc = host.unc_sa(i)
        sub_c = int(genome[max(loc - 1, 0)])
        sub_idx = host.C[sub_c] + host.rank(sub_c, i)
        ins_idx = sub_idx
        m, nsp, nep = mms_continue(pattern, length - 1, sub_idx, sub_idx + 1)
        sub_align, sub_idx = m + 1, nsp
        best_align, best_pos = sub_align, sub_idx
        if sub_align > 6 or sub_align == length:
            skips = 0
            break
        bleh = ins_idx
        ins_end = ins_idx + 1
        m, ins_idx, ins_end = mms_continue(pattern, length, ins_idx, ins_end)
        if m > 5 or m == length:
            skips = 1
            break
        sub_c = int(genome[max(loc - 2, 0)])
        ins_idx = host.C[sub_c] + host.rank(sub_c, bleh)
        blah = ins_idx
        m, ins_idx, ins_end = mms_continue(pattern, length, ins_idx, ins_end)
        if m > 5 or m == length:
            skips = 2
            break
        sub_c = int(genome[max(loc - 3, 0)])
        ins_idx = host.C[sub_c] + host.rank(sub_c, blah)
        m, ins_idx, ins_end = mms_continue(pattern, length, ins_idx, ins_end)
        if m > 5 or m == length:
            skips = 3
            break
        done = False
        for skip, thresh in ((1, 6), (2, 7), (3, 8)):
            m, dsp, _ = mms_continue(pattern, length - skip, i, i + 1)
            if m + skip > thresh or m + skip == length:
                best_align, best_pos, skips = m + skip, dsp, -skip
                done = True
                break
        if done:
            break
    return best_align, best_pos, best_pos + 1, skips


def test_mms_mismatch_differential(rng):
    codes = random_codes(rng, 1500)
    host = HostFMI(codes)
    fmi = bwt_tpu.build_index(codes)
    ex = BatchExecutor(fmi)
    cases = 0
    gens, wants = [], []
    for _ in range(60):
        # realistic context: run mms on a mutated read, then hypothesize
        plen = int(rng.integers(8, 25))
        j = int(rng.integers(0, 1500 - plen))
        pat = list(codes[j : j + plen])
        k = int(rng.integers(0, plen))
        pat[k] = int(pat[k]) ^ int(rng.integers(1, 4))
        m, sp, ep = host.mms(pat)
        rem = plen - m
        if rem < 1 or sp >= ep or ep - sp > 6:
            continue
        pattern = np.array(pat, np.uint8)
        row = ex.svc.add_read(pattern)
        gens.append(mms_mismatch_gen(codes, row, rem, sp, ep))
        wants.append(host_mms_mismatch(host, codes, pat, rem, sp, ep))
        cases += 1
    got = ex.run(gens)
    assert cases >= 20
    for g, w in zip(got, wants):
        assert g == w
