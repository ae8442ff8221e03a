"""ctypes binding for the native loader (loader.cc), with transparent
pure-Python fallback.

The shared object is compiled on first use with g++ -O3 into the
package directory; if no toolchain is available every entry point
falls back to the equivalent bwt_tpu.codec / numpy path, so the
package works identically (only slower) without a compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

from bwt_tpu import codec

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "_libbwtio.so"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", str(_SO), str(_DIR / "loader.cc")],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        stale = (
            _SO.exists()
            and _SO.stat().st_mtime < (_DIR / "loader.cc").stat().st_mtime
        )
        if (not _SO.exists() or stale) and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.bwt_genome_size.restype = ctypes.c_longlong
        lib.bwt_genome_size.argtypes = [ctypes.c_char_p]
        lib.bwt_genome_load.restype = ctypes.c_longlong
        lib.bwt_genome_load.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_longlong,
        ]
        lib.bwt_reads_scan.restype = ctypes.c_int
        lib.bwt_reads_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.bwt_reads_load.restype = ctypes.c_int
        lib.bwt_reads_load.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_longlong,
        ]
        lib.bwt_fastq_scan.restype = ctypes.c_int
        lib.bwt_fastq_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.bwt_fastq_load.restype = ctypes.c_int
        lib.bwt_fastq_load.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_longlong,
        ]
        lib.bwt_fasta_to_text.restype = ctypes.c_longlong
        lib.bwt_fasta_to_text.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.bwt_pack_words.restype = None
        lib.bwt_pack_words.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.bwt_pack_ref_bytes.restype = None
        lib.bwt_pack_ref_bytes.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _lib() is not None


def load_genome(path) -> np.ndarray:
    """Genome text file -> uint8 codes (non-ACGT -> 0), trailing
    newlines stripped."""
    lib = _lib()
    path = str(path)
    if lib is None:
        return codec.encode_genome(open(path).read().rstrip("\n"))
    n = lib.bwt_genome_size(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty(n, np.uint8)
    if n and lib.bwt_genome_load(path.encode(), out.ctypes.data, n) != n:
        raise IOError(f"short read: {path}")
    return out


def load_reads(path, pad_to: int | None = None):
    """Reads file (one read per line) -> (codes (B, L) int32 0-padded,
    lengths (B,) int32).  Non-ACGT -> 5 ('N')."""
    lib = _lib()
    path = str(path)
    if lib is None:
        reads = [ln for ln in open(path).read().splitlines() if ln]
        L = pad_to or max((len(r) for r in reads), default=1)
        out = np.zeros((len(reads), L), np.uint8)
        lens = np.zeros((len(reads),), np.int32)
        for b, r in enumerate(reads):
            enc = codec.encode_read(r)[:L]
            out[b, : len(enc)] = enc
            lens[b] = len(r)
        return out.astype(np.int32), lens
    n = ctypes.c_longlong()
    mx = ctypes.c_longlong()
    if lib.bwt_reads_scan(path.encode(), ctypes.byref(n), ctypes.byref(mx)) != 0:
        raise FileNotFoundError(path)
    B, L = n.value, max(pad_to or 0, mx.value, 1)
    codes = np.zeros((B, L), np.uint8)
    lens = np.zeros((B,), np.int32)
    if B and lib.bwt_reads_load(
        path.encode(), codes.ctypes.data, lens.ctypes.data, B, L
    ) != 0:
        raise IOError(f"reads changed while loading: {path}")
    return codes.astype(np.int32), lens


def load_fastq(path, pad_to: int | None = None):
    """FastQ file (4-line records) -> (codes (B, L) int32 0-padded,
    lengths (B,) int32).  Sequence lines only; non-ACGT -> 5 ('N')."""
    lib = _lib()
    path = str(path)
    if lib is None:
        lines = open(path).read().splitlines()
        seqs = [lines[i] for i in range(1, len(lines), 4) if lines[i]]
        # same widening rule as the native path: never truncate
        L = max(pad_to or 0, max((len(s) for s in seqs), default=1), 1)
        out = np.zeros((len(seqs), L), np.uint8)
        lens = np.zeros((len(seqs),), np.int32)
        for b, s in enumerate(seqs):
            enc = codec.encode_read(s)[:L]
            out[b, : len(enc)] = enc
            lens[b] = len(s)
        return out.astype(np.int32), lens
    n = ctypes.c_longlong()
    mx = ctypes.c_longlong()
    if lib.bwt_fastq_scan(path.encode(), ctypes.byref(n), ctypes.byref(mx)) != 0:
        raise FileNotFoundError(path)
    B, L = n.value, max(pad_to or 0, mx.value, 1)
    out = np.zeros((B, L), np.uint8)
    lens = np.zeros((B,), np.int32)
    if B and lib.bwt_fastq_load(
        path.encode(), out.ctypes.data, lens.ctypes.data, B, L
    ) != 0:
        raise IOError(f"FastQ changed while loading: {path}")
    return out.astype(np.int32), lens


def fasta_to_text(fasta: str) -> str:
    """FastA -> plain sequence text (fil.cc semantics)."""
    lib = _lib()
    if lib is None:
        return codec.fasta_to_text(fasta)
    raw = fasta.encode()
    m = lib.bwt_fasta_to_text(raw, len(raw), None)
    out = ctypes.create_string_buffer(m)
    lib.bwt_fasta_to_text(raw, len(raw), out)
    return out.raw[:m].decode()


def pack_words(codes) -> np.ndarray:
    codes = np.ascontiguousarray(codes, np.uint8)
    lib = _lib()
    if lib is None:
        return codec.pack_words(codes)
    out = np.empty((len(codes) + 15) // 16, np.uint32)
    lib.bwt_pack_words(codes.ctypes.data, len(codes), out.ctypes.data)
    return out


def pack_ref_bytes(codes) -> np.ndarray:
    codes = np.ascontiguousarray(codes, np.uint8)
    lib = _lib()
    if lib is None:
        return codec.pack_ref_bytes(codes)
    out = np.empty((len(codes) + 3) // 4, np.uint8)
    lib.bwt_pack_ref_bytes(codes.ctypes.data, len(codes), out.ctypes.data)
    return out
