"""Offline result-analysis tools (process_results/ equivalents).

The reference ships two ad-hoc C++ one-offs with no Makefile entry
(SURVEY.md L8): a position-list differ (process_results/differ.cc) and
a hit-frequency histogram for repeat-region analysis
(process_results/proc_indices.cc).  Same behavior here, as library
functions + CLI subcommands.
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path


def _ints(path) -> list[int]:
    return [int(t) for t in Path(path).read_text().split()]


def diff_positions(file1, file2) -> list[tuple[int, int, int]]:
    """Line-by-line diff of two position files (differ.cc): returns
    (1-based line, pos1, pos2) for every disagreeing pair, stopping at
    the shorter file."""
    a, b = _ints(file1), _ints(file2)
    out = []
    for i, (x, y) in enumerate(zip(a, b), start=1):
        if x != y:
            out.append((i, x, y))
    return out


def hit_histogram(path, *, min_count: int = 10, gap: int = 1000):
    """Frequency histogram of hit indices (proc_indices.cc): indices
    appearing more than ``min_count`` times, grouped into clusters
    whenever consecutive reported indices are more than ``gap`` apart.
    Returns a list of clusters, each a list of (index, count)."""
    counts = Counter(_ints(path))
    clusters: list[list[tuple[int, int]]] = []
    last = 0
    for idx in sorted(counts):
        n = counts[idx]
        if n > min_count:
            if not clusters or idx - last > gap:
                clusters.append([])
            clusters[-1].append((idx, n))
            last = idx
    return clusters


def format_histogram(clusters) -> str:
    """proc_indices.cc output shape: blank line between clusters,
    ``index<TAB>count`` rows."""
    out = []
    for i, cluster in enumerate(clusters):
        if i:
            out.append("")
        out.extend(f"{idx}\t{n}" for idx, n in cluster)
    return "\n".join(out) + ("\n" if out else "")
