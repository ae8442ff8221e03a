"""Minimal SAM emission for the aligner's results.

The reference prints bare ``position\\n CIGAR`` pairs
(single_align.c:484-503); modern pipelines want SAM.  This renders the
same alignments as single-end SAM records: FLAG 0 (forward) / 16
(reverse-complement) / 4 (unmapped), 1-based POS, MAPQ 255
(unavailable), the aligner's CIGAR, and SEQ in *reference orientation*
(reverse hits emit the reverse complement, as the SAM spec requires —
that is the sequence the CIGAR was computed against).  No quality
track (the drivers never read one): QUAL '*'.
"""

from __future__ import annotations

import numpy as np

from bwt_tpu import codec

_COMP = str.maketrans("ACGTN", "TGCAN")


def sam_header(ref_name: str, ref_len: int, program: str = "bwt_tpu") -> str:
    return (
        "@HD\tVN:1.6\tSO:unknown\n"
        f"@SQ\tSN:{ref_name}\tLN:{ref_len}\n"
        f"@PG\tID:{program}\tPN:{program}\n"
    )


def sam_record(
    name: str,
    read,
    pos_1based: int,
    cigar,
    reverse: bool,
    ref_name: str,
) -> str:
    """One alignment line.  ``pos_1based == 0`` emits an unmapped
    record (FLAG 4)."""
    if isinstance(read, str):
        seq = read
        if pos_1based and reverse:
            seq = seq.translate(_COMP)[::-1]
    else:
        codes = np.asarray(read, np.uint8)
        if pos_1based and reverse:
            codes = codec.revcomp(codes)
        seq = codec.decode(codes)
    if pos_1based:
        flag = 16 if reverse else 0
        cig = cigar.render() if cigar is not None and cigar else "*"
        return (
            f"{name}\t{flag}\t{ref_name}\t{pos_1based}\t255\t{cig}"
            f"\t*\t0\t0\t{seq}\t*\n"
        )
    return f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq}\t*\n"


def format_sam(results, reads, *, ref_name: str, ref_len: int, names=None) -> str:
    """Render ``align_reads(..., with_strand=True)`` results as SAM."""
    out = [sam_header(ref_name, ref_len)]
    for i, ((pos, cig, rev), read) in enumerate(zip(results, reads)):
        name = names[i] if names else f"read{i}"
        out.append(sam_record(name, read, pos, cig, rev, ref_name))
    return "".join(out)
