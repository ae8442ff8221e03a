"""Randomized parity fuzz vs the compiled C binaries — the round-4
harness that caught the tp wrap-then-fill divergence (ops/rank) and
surfaced rnaseqtest.c's N-read UB.

Modes:
  * aligner — single_align stdout byte-diffed per trial, mono AND
    pipelined/speculative chunk schedules, across substitution / indel
    / junk / planted-repeat read styles (read lengths 20-2000).
  * rnaseq  — rna_seq values vs the rnaseq_main harness (ACGT reads:
    the C binary's own search loops are UB on N codes — documented in
    models/rnaseq.py).
  * tp      — device automatons over a (dp, tp) mesh vs single-device,
    N-heavy reads, tp in {2, 4} (needs 8 virtual CPU devices).

Run:  python tools/fuzz_oracle.py --mode aligner --trials 10
      JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/fuzz_oracle.py --mode tp --trials 10
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))


def _mut_reads(gl, n, rng, style, lo=20, hi=120):
    reads = []
    for _ in range(n):
        L = int(rng.integers(lo, hi))
        j = int(rng.integers(0, len(gl) - L))
        r = list(gl[j : j + L])
        if style == "indel":
            for _ in range(int(rng.integers(1, 4))):
                p = int(rng.integers(0, len(r)))
                if rng.random() < 0.5:
                    r.insert(p, int(rng.integers(0, 4)))
                else:
                    del r[p : p + int(rng.integers(1, 3))]
            for _ in range(int(rng.integers(0, 3))):
                r[int(rng.integers(0, len(r)))] = int(rng.integers(0, 6))
        elif style == "junk":
            r = list(rng.integers(0, 4, size=L))
        else:  # subs
            for _ in range(int(rng.integers(0, 4))):
                r[int(rng.integers(0, len(r)))] = int(rng.integers(0, 6))
        reads.append("".join("ACGTNN"[c] for c in r))
    return reads


def fuzz_aligner(trials, seed0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from oracle import oracle

    import bwt_tpu
    from bwt_tpu import codec
    from bwt_tpu.config import DEFAULT
    from bwt_tpu.models import aligner

    bi, sa = oracle("build_index"), oracle("single_align")
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    for t in range(trials):
        rng = np.random.default_rng(seed0 + t)
        glen = int(rng.integers(20000, 120000))
        style = ["subs", "indel", "junk"][t % 3]
        gl = rng.integers(0, 4, size=glen).astype(np.uint8)
        if t % 4 == 3:  # plant repeats
            seg = gl[1000:1400].copy()
            for off in (5000, 9000, 15000):
                gl[off : off + 400] = seg
        g = codec.decode(gl)
        (tmp / "g.txt").write_text(g)
        subprocess.run([str(bi), str(tmp / "g.txt"), str(tmp / "g.idx")],
                       check=True, capture_output=True)
        fmi = bwt_tpu.build_index(gl, sa_sample_rate=4)
        reads = _mut_reads(gl, 300, rng, style)
        (tmp / "r.txt").write_text("\n".join(reads) + "\n")
        want = subprocess.run(
            [str(sa), str(tmp / "g.txt"), str(tmp / "g.idx"),
             str(tmp / "r.txt")], capture_output=True, check=True).stdout
        for chunk in (512, 64):  # mono and pipelined+speculative
            cfg = dataclasses.replace(DEFAULT, search_batch=chunk)
            got = aligner.format_ref_output(aligner.align_reads(
                fmi, g, reads, engine="device", config=cfg)).encode()
            if got != want:
                fails += 1
                print(f"MISMATCH t={t} style={style} chunk={chunk}")
        print(f"trial {t:2d} style={style:<6} glen={glen:>7}: "
              f"{'OK' if not fails else 'FAIL'}", flush=True)
    return fails


def fuzz_rnaseq(trials, seed0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from oracle import oracle

    import bwt_tpu
    from bwt_tpu import codec
    from bwt_tpu.config import DEFAULT
    from bwt_tpu.models import rnaseq

    rb = oracle("rnaseq_main")
    tmp = pathlib.Path(tempfile.mkdtemp())
    fails = 0
    for t in range(trials):
        rng = np.random.default_rng(seed0 + t)
        glen = int(rng.integers(20000, 90000))
        gl = rng.integers(0, 4, size=glen).astype(np.uint8)
        g = codec.decode(gl)
        (tmp / "g.txt").write_text(g)
        fmi = bwt_tpu.build_index(gl, sa_sample_rate=4)
        reads = []
        for _ in range(300):
            L = int(rng.integers(35, 90))
            j = int(rng.integers(0, glen - L))
            r = list(gl[j : j + L])
            for _ in range(int(rng.integers(0, 4))):
                p = int(rng.integers(0, len(r)))
                if rng.random() < 0.3 and len(r) > 45:
                    del r[p : p + 2]
                else:
                    r[p] = int(rng.integers(0, 4))  # ACGT: C UB on N
            reads.append("".join("ACGT"[c] for c in r))
        (tmp / "r.txt").write_text("\n".join(reads) + "\n")
        out = subprocess.run([str(rb), str(tmp / "g.txt"),
                              str(tmp / "r.txt")],
                             capture_output=True, check=True).stdout
        want = [int(x) for x in out.decode()
                .replace("Should be right?", " ").split()]
        for chunk in (512, 64):
            cfg = dataclasses.replace(DEFAULT, search_batch=chunk)
            got = list(rnaseq.rna_seq(fmi, reads, engine="device",
                                      config=cfg))
            if got != want:
                fails += 1
                print(f"MISMATCH t={t} chunk={chunk}")
        print(f"trial {t}: OK" if not fails else f"trial {t}: FAIL",
              flush=True)
    return fails


def fuzz_tp(trials, seed0):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import bwt_tpu
    from bwt_tpu import codec, parallel
    from bwt_tpu.models import aligner, exact, rnaseq

    assert len(jax.devices()) >= 8, (
        "needs XLA_FLAGS=--xla_force_host_platform_device_count=8")
    fails = 0
    for t in range(trials):
        rng = np.random.default_rng(seed0 + t)
        glen = int(rng.integers(3000, 12000))
        g = codec.random_genome(glen, seed=int(rng.integers(1e6)))
        fmi = bwt_tpu.build_index(
            g, sa_sample_rate=int(rng.choice([4, 8])))
        codes = codec.encode_genome(g)
        n = int(rng.integers(16, 64))
        L = int(rng.integers(40, 100))
        reads = []
        for _ in range(n):
            j = int(rng.integers(0, glen - L))
            r = codes[j : j + L].copy()
            for _ in range(int(rng.integers(0, 5))):
                r[int(rng.integers(0, L))] = int(rng.integers(0, 6))
            reads.append(r)
        tp = int(rng.choice([2, 4]))
        mesh = parallel.make_mesh(8, tp=tp)
        single = aligner.align_reads(fmi, g, reads, engine="device",
                                     with_strand=True)
        meshed = aligner.align_reads(fmi, g, reads, engine="device",
                                     with_strand=True, mesh=mesh)
        ok = all(a[0] == b[0] and str(a[1]) == str(b[1]) and a[2] == b[2]
                 for a, b in zip(single, meshed))
        rr = [r[:40] for r in reads]
        ok &= bool(np.array_equal(
            rnaseq.rna_seq(fmi, rr, engine="device"),
            rnaseq.rna_seq(fmi, rr, engine="device", mesh=mesh)))
        sr = [r[:45] for r in reads]
        a_, b_ = exact.search_reads(fmi, sr), exact.search_reads(
            fmi, sr, mesh=mesh)
        ok &= all(np.array_equal(a_[k], b_[k]) for k in a_)
        if not ok:
            fails += 1
            print(f"MISMATCH t={t} tp={tp}")
        print(f"trial {t}: tp={tp} glen={glen} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
    return fails


def fuzz_search(trials, seed0):
    """anchor_scan (the search_reads core) vs an independent host
    replay of the anchor loop — the C binary's ASCII UB makes it
    unusable as an oracle here (search_reads.c:102-118), so host_ref
    is the spec.  Styles cover the round-5 rework's paths: N runs
    (gather-free trailing_n), junk reads (deferred unc_sa nmatch==0),
    mixed lengths (non-fast-path encode + dynamic trip MMS bounds)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from host_ref import HostFMI

    import bwt_tpu
    from bwt_tpu import codec
    from bwt_tpu.models import exact

    fails = 0
    for t in range(trials):
        rng = np.random.default_rng(seed0 + t)
        glen = int(rng.integers(2000, 20000))
        g = codec.random_genome(glen, seed=int(rng.integers(1e6)))
        codes = codec.encode_genome(g)
        host = HostFMI(codes)
        fmi = bwt_tpu.build_index(codes,
                                  sa_sample_rate=int(rng.choice([4, 32])))
        n = int(rng.integers(20, 60))
        Lmax = int(rng.integers(30, 160))
        reads, lens = [], []
        for _ in range(n):
            L = Lmax if rng.random() < 0.5 else int(rng.integers(22, Lmax + 1))
            j = int(rng.integers(0, glen - L))
            r = list(codes[j : j + L])
            style = int(rng.integers(0, 4))
            if style == 1:
                # subs from the read alphabet (0-3 + N=5; code 4 is
                # the '.' separator — encode_read never emits it)
                for _ in range(int(rng.integers(1, 5))):
                    r[int(rng.integers(0, L))] = int(
                        rng.choice([0, 1, 2, 3, 5]))
            elif style == 2:  # trailing + inner N runs
                for k in range(int(rng.integers(1, min(8, L)))):
                    r[L - 1 - k] = 5
                r[int(rng.integers(0, L))] = 5
            elif style == 3:
                r = [int(x) for x in rng.integers(0, 4, L)]
            reads.append(r)
            lens.append(L)
        pat = np.zeros((n, max(lens)), np.int32)
        for b, r in enumerate(reads):
            pat[b, : len(r)] = r
        nm, pos = map(np.asarray, exact.anchor_scan(fmi, pat,
                                                    np.asarray(lens, np.int32)))
        ok = True
        for b, r in enumerate(reads):
            ln, cnt, p = lens[b], 0, -1
            while ln > 20:
                m, sp, _ep = host.mms(r[:ln])
                if m >= 20:
                    cnt += 1
                    p = host.unc_sa(sp)
                    ln -= m
                else:
                    ln -= 1
            if (nm[b], pos[b]) != (cnt, p):
                ok = False
                print(f"MISMATCH t={t} b={b}: got ({nm[b]}, {pos[b]}) "
                      f"want ({cnt}, {p})")
        fails += not ok
        print(f"trial {t}: glen={glen} n={n} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
    return fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["aligner", "rnaseq", "tp", "search"],
                    default="aligner")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--seed", type=int, default=1000)
    args = ap.parse_args()
    fails = {"aligner": fuzz_aligner, "rnaseq": fuzz_rnaseq,
             "tp": fuzz_tp, "search": fuzz_search}[args.mode](
        args.trials, args.seed)
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
