"""Configuration layer.

The reference hardcodes every tunable as a magic constant (SURVEY.md
section 5): rank checkpoint blocksize 16 (seqindex.c:182), SA sample
rate 32 (seqindex.c:173-176), anchor lengths 12 / 20
(single_align.c:483, search_reads.c:115), NW/SW scoring -5/-3/-6
(smw.c:41-54), MMS cutoffs 14/10 (rnaseqtest.c:197,219), pair window
10 kb (search_reads.c:154), pthread-spawn threshold 10 M
(histsortcomp.c:170), 64 KiB max read buffer (single_align.c:369).
This dataclass exposes them all; defaults reproduce the reference
bit-exactly, and the parity-sensitive ones are marked — changing those
departs from reference-equivalent output.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Config:
    # --- index layout (parity-sensitive: serialized format + rank math)
    sa_sample_rate: int = 32       # seqindex.c:173-176; build_index default
    rank_blocksize: int = 16       # seqindex.c:182 (== bases per uint32 word);
    # structural: the packed-word layout fixes this at 16 — build_index
    # validates and rejects any other value

    # --- alignment drivers
    anchor_len: int = 12           # single_align.c:483
    min_anchor: int = 20           # search_reads.c:115,119
    pair_window: int = 10_000      # search_reads.c:154
    chain_thresh: int = 10         # single_align.c:482 (align_read)
    max_read_len: int = 65_536     # single_align.c:369 (256*256 buffer)

    # --- DP scoring (parity-sensitive vs smw.c:41-54)
    match: int = 0
    mismatch: int = -6
    gap_open: int = -5
    gap_extend: int = -3

    # --- spliced alignment (rnaseqtest.c)
    rnaseq_anchor_cutoff: int = 14  # rnaseqtest.c:197
    rnaseq_cont_cutoff: int = 10    # rnaseqtest.c:219

    # --- execution
    search_batch: int = 1 << 15     # reads per lockstep device step
    automaton_seed_k: int = 12      # seed-table depth for the device
    # automatons' mms/bsearch rounds: each round's first k backward
    # -search steps resolve from one (4^k, 6)-row table gather instead
    # of k x 2 rank gathers (bit-exact — the table stores the full
    # search state incl. emptied-early, ops/search.SeedTable).  0
    # disables.  The table is built lazily once per QueryService (k is
    # clamped to 6 off-TPU: a 4^12-row build is a TPU-sized job).
    gen_seq_default_len: int = 100_000  # gen_seq.c:17
    spec_depth: int = 1             # speculative retry-chain batching
    # (batch_exec "par" protocol) for the aligner's anchor hunt: how
    # many deterministic ln-3 retries issue per round.  Outputs are
    # identical at any value >= 1; higher trades wasted device lanes
    # for fewer host<->device round trips.  Measured on v5e: the
    # anchor usually hits on the first try, so speculation only burns
    # lanes — 1 is best (the curgap-loop fusion is separate and always
    # on).  No reference analog (the C drivers are sequential).
    rnaseq_spec_depth: int = 24     # same knob for rna_seq's len-1
    # retry chains (anchor hunt + gap re-anchor), whose chains run up
    # to ~35 sequential rounds; measured best ~24 on v5e (7.4k ->
    # 14.3k reads/s at 1 Mb/16k reads).  Depths 4-24 measure within
    # tunnel variance at 134 Mb (20.7-22.7k reads/s warm); unlike the
    # aligner's curgap lanes, each speculative retry here shortens the
    # pattern by 1, so deep chunks cost little extra device work.
    isa_spec_depth: int = 1         # speculative chunk size for the
    # aligner's backward-extension curgap loop on the inverse-SA path
    # (single_align.c:224-247's curgap=1..9): each chunk of gap
    # hypotheses issues as one "par" round; replies are consumed in
    # the sequential loop's order, so outputs are identical at any
    # value in [1, 9].  Each speculative lane runs a near-full-length
    # LF loop, and on substitution-dominated reads curgap=1 is
    # accepted almost always, so deeper chunks mostly burn device
    # lanes.  Measured on v5e @32 k mutated reads: depth 1 = 9.6 k
    # reads/s @1 Mb / 7.3 k @134 Mb vs depth 9 = 7.5 k / 5.4 k — the
    # executor is device-bound, not round-trip-bound, at both scales.
    # Indel-heavy read sets may prefer 2-3.
    elastic_fallback: bool = False  # opt-in device-failure recovery
    # for the drivers (align_reads / rna_seq): if the accelerator
    # errors mid-run (backend outage, lost claim — see CLAUDE.md's
    # axon notes), rebuild the index from the host-resident genome on
    # the CPU backend and re-run the whole call there (the genome IS
    # the checkpoint, matching the reference's index-file-is-the
    # -checkpoint stance; device-side FMIndex buffers are unreachable
    # once the backend dies).  Off by default so test suites surface
    # real device bugs instead of silently absorbing them.

    @property
    def dp_scoring(self) -> tuple[int, int, int, int]:
        """(match, mismatch, gap_open, gap_extend) — the single source
        of truth consumed by every DP fill (ops.align.dp_fill,
        dp_fill_batch, ops.pallas_align.dp_fill_wavefront and the
        executor's DP service)."""
        return (self.match, self.mismatch, self.gap_open, self.gap_extend)


DEFAULT = Config()
