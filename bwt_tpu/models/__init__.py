"""Alignment strategy drivers ("model families") built on the FM-index
core: exact anchored search (search_reads.c), anchored seed-and-extend
alignment (single_align.c), and spliced/RNA-seq alignment
(rnaseqtest.c) — each re-architected as host-orchestrated pipelines
over batched device primitives."""

from bwt_tpu.models.exact import search_reads, anchor_scan
from bwt_tpu.models.aligner import align_reads, align_read_anchored

__all__ = [
    "search_reads",
    "anchor_scan",
    "align_reads",
    "align_read_anchored",
]
