"""A/B the device-automaton refinements on the real TPU.

Measures, on a 1 Mb genome / 32 k mutated reads (and optionally a
134 Mb genome), warm best-of-N for:

  * single_align / rnaseq device engine, two-stage live-lane
    compaction ON (default thresholds) vs OFF
  * the chunk-pipelined configuration (search_batch = reads/2)

Designed to be parked detached during an axon outage: it probes the
backend in bounded subprocesses (the outage mode otherwise eats ~27
minutes per client before raising) and only proceeds once a probe
claims the TPU.  One JSON line per measurement goes to stdout; a final
summary JSON is written to --out.

Usage: setsid nohup python tools/ab_automaton.py --out /tmp/ab.json \
           > /tmp/ab.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.bench_drivers import make_reads  # noqa: E402


def wait_for_tpu(max_wait_s: float) -> bool:
    """Outage-safe wait: loop bench.py's _probe_backend (the one
    shared probe/retry implementation) until it reports a TPU."""
    from bench import _probe_backend

    t_end = time.monotonic() + max_wait_s
    while time.monotonic() < t_end:
        plat = _probe_backend(
            deadline_s=max(60.0, min(1500.0, t_end - time.monotonic()))
        )
        if plat == "tpu":
            return True
        print(f"probe round: platform={plat!r}; retrying", flush=True)
        # _probe_backend can return fast (env short-circuit, or jax
        # falling back to its cpu platform) — don't busy-spin
        time.sleep(min(90.0, max(0.0, t_end - time.monotonic())))
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ab_automaton.json")
    ap.add_argument("--genome", type=int, default=1_000_000)
    ap.add_argument("--reads", type=int, default=32768)
    ap.add_argument("--big", type=int, default=134_000_000,
                    help="chromosome-scale genome size (0 = skip)")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--max-wait-hours", type=float, default=10.0)
    args = ap.parse_args()

    if not wait_for_tpu(args.max_wait_hours * 3600):
        print("TPU never came back; giving up", flush=True)
        pathlib.Path(args.out).write_text(json.dumps({"error": "no-tpu"}))
        return 1

    import jax

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import dataclasses

    import jax.numpy as jnp

    import bwt_tpu
    from bwt_tpu.config import DEFAULT
    from bwt_tpu.models import aligner, rnaseq
    from bwt_tpu.models.batch_exec import QueryService

    results: dict[str, float] = {}

    def record(key, n, fn):
        best = None
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[key] = round(n / best, 1)
        print(json.dumps({key: results[key], "best_s": round(best, 3)}),
              flush=True)

    def sweep(glen, tag, reads_n):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 4, size=glen).astype(np.uint8)
        print(f"building {glen}-base rate-8 index...", flush=True)
        t0 = time.perf_counter()
        fmi = bwt_tpu.build_index(codes, sa_sample_rate=8)
        np.asarray(fmi.C)
        print(f"built in {time.perf_counter() - t0:.1f}s", flush=True)
        genome_dev = jax.jit(lambda g: g.astype(jnp.int32))(
            jnp.asarray(codes))
        areads = make_reads(codes, reads_n, 80, rng)
        rreads = make_reads(codes, reads_n, 50, rng)

        # phase-split: automaton dispatch+fetch (A) vs log replay (B)
        # for the mono single_align case, compaction on
        aligner._COMPACT_AT = 4096
        cfgm = dataclasses.replace(DEFAULT, search_batch=reads_n)
        svc = QueryService(fmi, genome_dev, cfgm)
        codes_list = [np.asarray(r, np.uint8) for r in areads]
        for rep in range(args.repeat):
            t0 = time.perf_counter()
            out = aligner._align_chunk_dispatch(
                fmi, len(codes), codes_list, cfgm.anchor_len, None, svc)
            np.asarray(out[0])  # fetch mode only: ~pure device time
            t1 = time.perf_counter()
            out = [np.asarray(x) for x in jax.device_get(list(out[:11]))]
            t2 = time.perf_counter()
            res, fb = aligner._assemble_logs(svc, reads_n, *out)
            t3 = time.perf_counter()
            print(json.dumps({
                f"sa_{tag}_dev_s": round(t1 - t0, 3),
                f"sa_{tag}_logfetch_s": round(t2 - t1, 3),
                f"sa_{tag}_phaseB_s": round(t3 - t2, 3),
                "fallback_lanes": len(fb), "rep": rep,
            }), flush=True)
            if rep == args.repeat - 1:
                results[f"sa_{tag}_dev_s"] = round(t1 - t0, 3)
                results[f"sa_{tag}_logfetch_s"] = round(t2 - t1, 3)
                results[f"sa_{tag}_phaseB_s"] = round(t3 - t2, 3)

        for compact_on in (True, False):
            aligner._COMPACT_AT = 4096 if compact_on else (1 << 30)
            rnaseq._COMPACT_AT = 4096 if compact_on else (1 << 30)
            suff = "c1" if compact_on else "c0"
            # single chunk (isolates compaction from pipelining)
            cfg1 = dataclasses.replace(DEFAULT, search_batch=reads_n)
            record(
                f"sa_{tag}_{suff}_mono", reads_n,
                lambda: aligner.align_reads(
                    fmi, codes, list(areads), config=cfg1,
                    service=QueryService(fmi, genome_dev, cfg1)),
            )
            record(
                f"rna_{tag}_{suff}_mono", reads_n,
                lambda: rnaseq.rna_seq(
                    fmi, list(rreads), config=cfg1,
                    service=QueryService(fmi, config=cfg1)),
            )
            # chunked pipelines (phase B overlaps the next chunk's
            # automaton; deeper pipelines expose less phase-B tail)
            for depth in (2, 4):
                cfgd = dataclasses.replace(
                    DEFAULT, search_batch=reads_n // depth)
                record(
                    f"sa_{tag}_{suff}_pipe{depth}", reads_n,
                    lambda cfgd=cfgd: aligner.align_reads(
                        fmi, codes, list(areads), config=cfgd,
                        service=QueryService(fmi, genome_dev, cfgd)),
                )
                if depth == 2:
                    record(
                        f"rna_{tag}_{suff}_pipe2", reads_n,
                        lambda cfgd=cfgd: rnaseq.rna_seq(
                            fmi, list(rreads), config=cfgd,
                            service=QueryService(fmi, config=cfgd)),
                    )

    sweep(args.genome, "1m", args.reads)
    if args.big:
        sweep(args.big, "134m", args.reads)

    pathlib.Path(args.out).write_text(json.dumps(results, indent=1))
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
