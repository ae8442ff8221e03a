"""Spliced / RNA-seq alignment prototype — the rnaseqtest.c model family.

Re-implements the reference's maximum-mappable-suffix splice chaining
(``mms_search`` rnaseqtest.c:43-68, position-aware ``mms_continue``
:75-127, ``mms_gap`` :131-160, ``rna_seq`` driver :172-243) as host
generators over batched device backward-search, preserving the
reference's return-value quirks:

  * break-path positions are ``unc_sa(start_of_empty_interval) + 1``
    while full-match positions are ``unc_sa(start)`` with no +1
    (rnaseqtest.c:55 vs :67);
  * ``*len_p`` on the break path is ``len - i + 1`` with ``i`` one
    below the failing character (= chars_matched + 3);
  * the driver's reported position is the *first* anchor's — later
    continuations never update it (``genpos = mmspos`` only,
    rnaseqtest.c:189-241).

The reference's debug prints (rnaseqtest.c:113, :117) are not
reproduced; patterns are assumed N-free like the reference's
self-benchmark (codes 0-3).
"""

from __future__ import annotations

import numpy as np

from bwt_tpu import codec
from bwt_tpu.index import FMIndex
from bwt_tpu.models.batch_exec import BatchExecutor


def _eval_mms_search(r: dict, length: int, cutoff: int):
    """Pure post-processing of one mms_search bsearch reply
    (rnaseqtest.c:43-68); shared by the sequential generator and the
    speculative retry chain in :func:`rna_seq_gen`."""
    if r["alive"] or r["nmatched"] >= length - 1:
        return r["pos"], length
    len_p = r["nmatched"] + 3
    if r["nmatched"] + 2 > cutoff:
        return r["pos"] + 1, len_p
    return -1, len_p


def _eval_mms_gap(r: dict, length: int):
    """Pure post-processing of one mms_gap bsearch reply
    (rnaseqtest.c:131-160)."""
    if r["alive"] or r["nmatched"] >= length - 1:
        return r["pos"], length
    return -1, r["nmatched"] + 3


def mms_search_gen(row: int, length: int, cutoff: int):
    """Returns (pos, len_p) per rnaseqtest.c:43-68.  ``row`` is the
    read's bank handle; the search covers its length-prefix.

    The reference checks emptiness at the TOP of its loop
    (rnaseqtest.c:51), so an interval emptied by the final character
    exits the loop normally and takes the full-match path — returning
    ``unc_sa(start)`` of the empty interval.  ``nmatched >= length-1``
    captures exactly that case.  Both paths read the service's fused
    ``pos`` (= unc_sa of the final interval start) — one round, not
    two."""
    r = yield ("bsearch", row, 0, length)
    return _eval_mms_search(r, length, cutoff)


def mms_gap_gen(row: int, length: int, cutoff: int, lastpos: int):
    """Returns (pos, len_p) per rnaseqtest.c:131-160.  Note the
    reference's break-path candidate scan (rnaseqtest.c:146-151)
    iterates ``for (j = start; j < end; ...)`` over the *empty*
    interval that triggered the break — it never executes, so any
    break returns -1; only a full match yields a position.  As in
    :func:`mms_search_gen`, emptied-by-the-final-character counts as a
    full match (top-of-loop check, rnaseqtest.c:144)."""
    r = yield ("bsearch", row, 0, length)
    return _eval_mms_gap(r, length)


def mms_continue_gen(row: int, length: int, cutoff: int, lastpos: int,
                     use_isa: bool = False):
    """Position-aware continuation (rnaseqtest.c:75-127): at the loop
    iteration where ``len - i == cutoff`` (i.e. after cutoff-1 matched
    characters), scan the current interval for a match within 6 nt
    upstream of ``lastpos`` and, if found, narrow the interval to it
    before continuing.  ``use_isa`` answers the scan with one
    inverse-SA window query (identical narrowing; see
    ops.search.isa_window)."""
    if length < cutoff:
        # the checkpoint is unreachable; behavior collapses to mms_gap
        return (yield from mms_gap_gen(row, length, cutoff, lastpos))
    # Phase 1: the cutoff-1 characters before the checkpoint
    # (the slice pattern[length-cutoff+1 : length] of the prefix).
    # With isa_samples the checkpoint scan is answered IN the same
    # dispatch (fused inverse-SA window, batch_exec OP_BEXT): the
    # minimal in-interval row among positions
    # [lastpos - cutoff - 6, lastpos) == the first entry the
    # reference's SA-row scan accepts (rnaseqtest.c:110-121).
    fuse = use_isa and cutoff + 6 <= 32
    if fuse:
        r = yield ("bsearch_ext", row, length - cutoff + 1, cutoff - 1,
                   lastpos - cutoff - 6, cutoff + 6)
    else:
        r = yield ("bsearch", row, length - cutoff + 1, cutoff - 1)
    if not r["alive"]:
        # Emptied before the checkpoint: len - i <= cutoff at the
        # break, so the acceptance test (rnaseqtest.c:86) always fails.
        return -1, r["nmatched"] + 3
    # Checkpoint (len - i == cutoff): scan current matches.  Without
    # the fused window, fetch the candidate walk lazily in
    # geometrically growing chunks — the scan almost always narrows
    # within the first few entries while the interval width grows
    # linearly with genome size; chunking preserves the exact scan
    # order.
    start, end = r["start"], r["end"]
    if fuse:
        if r["wrow"] >= 0:
            start, end = r["wrow"], r["wrow"] + 1
    else:
        base, w = start, 32
        narrowed = False
        while base < end and not narrowed:
            hi = min(end, base + w)
            poss = yield ("unc_sa_range", base, hi)
            for k, p in enumerate(np.asarray(poss)):
                pos = int(p)
                if pos < lastpos and lastpos - (pos + cutoff) <= 6:
                    start, end = base + k, base + k + 1
                    narrowed = True
                    break
            base, w = hi, w * 4
    # Phase 2: the remaining prefix pattern[:length-cutoff+1].  The
    # full-match path triggers whenever every top-of-loop emptiness
    # check passed — including an interval emptied by the very last
    # character (rnaseqtest.c:84-103), which reads unc_sa() of the
    # EMPTY final interval.
    l2 = length - cutoff + 1
    r = yield ("mms_continue_full", row, 0, l2, start, end)
    if r["alive"] or r["nmatched"] >= l2 - 1:
        return r["pos"], length
    # Break: the candidate scan is over the empty interval (see
    # mms_gap_gen) — always -1.  len - i + 1 == (cutoff-1) + m + 3.
    return -1, cutoff + r["matched"] + 2


def rna_seq_gen(row: int, length: int, anchor_cutoff: int = 14,
                cont_cutoff: int = 10, use_isa: bool = False,
                spec: int = 1):
    """The rna_seq driver (rnaseqtest.c:172-243).  Returns the first
    anchor's genome position (the value the reference printf's).
    Cutoffs default to the reference's hardcoded 14 / 10
    (rnaseqtest.c:197, :219).

    ``spec``: speculative depth for the two length-decrement retry
    loops (rnaseqtest.c:198-201 anchor hunt, :227-236 gap re-anchor).
    Each retry's request is ``bsearch`` of a deterministically shorter
    prefix, so up to ``spec`` of them issue as one batch_exec "par"
    round; replies are consumed in sequential order and the unused
    tail discarded — outputs identical at any depth."""
    i = length
    mmspos, mmslen = yield from mms_search_gen(row, i, anchor_cutoff)
    while mmspos == -1 and i > anchor_cutoff:
        lens = []
        j = i
        while j > anchor_cutoff and len(lens) < spec:
            j -= 1
            lens.append(j)
        if len(lens) == 1:
            replies = [(yield ("bsearch", row, 0, lens[0]))]
        else:
            replies = yield ("par", [("bsearch", row, 0, l) for l in lens])
        for l, r in zip(lens, replies):
            i = l
            mmspos, mmslen = _eval_mms_search(r, l, anchor_cutoff)
            if mmspos != -1:
                break
    i -= mmslen
    while i > 18:
        genpos = mmspos
        i -= 3
        nextpos, mmslen = yield from mms_continue_gen(
            row, i, cont_cutoff, genpos, use_isa
        )
        if nextpos != -1:
            i -= mmslen
        else:
            while i > anchor_cutoff:
                lens = []
                j = i
                while j > anchor_cutoff and len(lens) < spec:
                    j -= 1
                    lens.append(j)
                if len(lens) == 1:
                    replies = [(yield ("bsearch", row, 0, lens[0]))]
                else:
                    replies = yield (
                        "par", [("bsearch", row, 0, l) for l in lens]
                    )
                done = False
                for l, r in zip(lens, replies):
                    i = l
                    nextpos, mmslen = _eval_mms_gap(r, l)
                    if nextpos != -1:
                        i -= mmslen
                        done = True
                        break
                if done:
                    break
    return mmspos


def rna_seq(fmi: FMIndex, reads, *, config=None, service=None):
    """Batched spliced-alignment driver: returns the anchor position
    per read (np.int32 array).  Pass a reusable
    :class:`~bwt_tpu.models.batch_exec.QueryService` to amortize
    device state across calls."""
    from bwt_tpu.config import DEFAULT
    from bwt_tpu.models.batch_exec import QueryService

    cfg = config or DEFAULT
    svc = service if service is not None else QueryService(fmi)
    svc.reset_reads()
    gens = []
    for r in reads:
        p = (
            codec.encode_read(r)
            if isinstance(r, (str, bytes))
            else np.asarray(r, np.uint8)
        )
        row = svc.add_read(p)
        gens.append(
            rna_seq_gen(
                row, len(p), cfg.rnaseq_anchor_cutoff,
                cfg.rnaseq_cont_cutoff, fmi.isa_samples is not None,
                cfg.rnaseq_spec_depth,
            )
        )
    out = BatchExecutor(svc).run(gens)
    return np.asarray(out, np.int32)
