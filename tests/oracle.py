"""Golden-oracle harness: compile and run the C reference binaries.

The reference sources at /root/reference are the ground truth for
bit-exact parity (SA, BWT bytes, index files, locate positions).  We
compile them out-of-tree into .oracle/bin (the reference dir is
read-only) and shell out to them from parity tests.  No reference code
is copied into this repo.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

REF = Path("/root/reference")
EXTRAS = Path(__file__).resolve().parent / "oracle_extras"
BIN = Path(__file__).resolve().parent.parent / ".oracle" / "bin"

_LINK = {
    # test-owned harness mains (in tests/oracle_extras) linking
    # reference objects — marked with a leading "@"
    "nw_main": ["@nw_main.c", "smw.c", "stack.c"],
    # reference sources carrying their own main() get it renamed away
    # with a per-file "!" flag so the harness main links cleanly
    "align_main": [
        "@align_main.c", "single_align.c!-Dmain=ref_single_align_main",
        "seqindex.c", "histsortcomp.c", "csacak.c", "fileio.c",
        "smw.c", "stack.c",
    ],
    "rnaseq_main": [
        "@rnaseq_main.c", "rnaseqtest.c!-Dmain=ref_rnaseq_main",
        "seqindex.c", "histsortcomp.c", "csacak.c", "smw.c", "stack.c",
    ],
    # target -> sources (mirrors Makefile:32-69 link lines)
    "bwt": ["bwt.c"],
    "build_index": [
        "build_index.c", "histsortcomp.c", "csacak.c", "fileio.c", "seqindex.c",
    ],
    "index_test": [
        "index_test.c", "fileio.c", "seqindex.c", "csacak.c", "histsortcomp.c",
    ],
    "searchtest": ["searchtest.c", "histsortcomp.c", "seqindex.c", "csacak.c"],
    "histcomptest": ["histsortcomp.c", "histsortcomptest.c", "csacak.c"],
    "single_align": [
        "histsortcomp.c", "csacak.c", "single_align.c", "fileio.c",
        "seqindex.c", "smw.c", "stack.c",
    ],
    "search_reads": [
        "histsortcomp.c", "seqindex.c", "csacak.c", "search_reads.c", "fileio.c",
    ],
    "gaptest": ["gaptest.c", "histsortcomp.c", "seqindex.c", "csacak.c"],
}


def oracle(target: str) -> Path:
    """Compile (once) and return the path of a reference binary."""
    BIN.mkdir(parents=True, exist_ok=True)
    out = BIN / target
    if not out.exists():
        base = ["gcc", "-pthread", "-std=gnu99", "-O2", "-m64", "-I", str(REF)]
        objs = []
        for spec in _LINK[target]:
            src, _, flags = spec.partition("!")
            path = str(EXTRAS / src[1:]) if src.startswith("@") else str(REF / src)
            obj = str(BIN / f"{target}__{Path(src.lstrip('@')).stem}.o")
            cmd = base + ([flags] if flags else []) + ["-c", "-o", obj, path]
            subprocess.run(cmd, check=True, capture_output=True)
            objs.append(obj)
        subprocess.run(
            base + ["-o", str(out), *objs, "-lm"],
            check=True, capture_output=True,
        )
    return out


def run(target: str, *args: str, input: bytes | None = None) -> bytes:
    exe = oracle(target)
    res = subprocess.run(
        [str(exe), *[str(a) for a in args]],
        input=input, capture_output=True, check=True,
    )
    return res.stdout
