"""Occ/rank queries as vectorized popcounts over 2-bit packed words.

Replaces the reference's 1 KiB byte->base-count lookup table and per-byte
accumulation loop (seqindex.c:91-138) with a register-only computation
the VPU vectorizes across thousands of queries:

    word ^ (c * 0x55555555)      -> 2-bit lanes; 0 where lane == c
    ~(x | x>>1) & 0x55555555     -> one bit per matching lane
    & ((1 << 2r) - 1)            -> keep the first r lanes
    population_count             -> partial in-word rank

A checkpoint row per 16-base word (`occ[w, c]` = count of `c` in
``bwt[0:16w]``) matches the reference's blocksize-16 rank index
(seqindex.c:23-87) both in semantics and in memory footprint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LANES = jnp.uint32(0x55555555)


def eq_mask(words: jax.Array, c: jax.Array) -> jax.Array:
    """One bit (at lane position 2j) per 2-bit lane of ``words`` equal to ``c``.

    ``words`` uint32 (any shape), ``c`` broadcastable int in 0..3.
    """
    pat = c.astype(jnp.uint32) * _LANES
    x = words ^ pat
    return jnp.bitwise_not(x | (x >> 1)) & _LANES


def word_count(words: jax.Array, c: jax.Array) -> jax.Array:
    """Count of symbol ``c`` in each full 16-lane word."""
    return jax.lax.population_count(eq_mask(words, c)).astype(jnp.int32)


def word_rank(words: jax.Array, c: jax.Array, r: jax.Array) -> jax.Array:
    """Count of ``c`` among the first ``r`` lanes (r in 0..15) of each word."""
    mask = (jnp.uint32(1) << (2 * r.astype(jnp.uint32))) - jnp.uint32(1)
    return jax.lax.population_count(eq_mask(words, c) & mask).astype(jnp.int32)


def raw_rank(
    bwt_words: jax.Array,
    occ: jax.Array,
    c: jax.Array,
    idx: jax.Array,
) -> jax.Array:
    """rank of ``c`` in the compact BWT prefix ``bwt[0:idx]``.

    ``idx`` addresses the *compact* BWT (sentinel already removed);
    the endloc adjustment lives in :func:`rank`.  Shapes broadcast:
    `c`, `idx` may be any (equal) shape.
    """
    w = (idx >> 4).astype(jnp.int32)
    r = (idx & 15).astype(jnp.int32)
    words = jnp.take(bwt_words, w)
    base = jnp.take(occ.reshape(-1), w * 4 + c.astype(jnp.int32))
    return base + word_rank(words, c, r)


def rank(
    bwt_words: jax.Array,
    occ: jax.Array,
    endloc: jax.Array,
    c: jax.Array,
    idx: jax.Array,
) -> jax.Array:
    """FM-index rank with sentinel skipping.

    Mirrors ``rank`` (seqindex.c:221-225): positions past the BWT
    sentinel location shift down one because the stored BWT omits the
    sentinel.
    """
    idx = idx - (idx > endloc).astype(idx.dtype)
    return raw_rank(bwt_words, occ, c, idx)


def bwt_char(bwt_words: jax.Array, endloc: jax.Array, idx: jax.Array) -> jax.Array:
    """Character of the (sentinel-full) BWT at ``idx`` (idx != endloc).

    Mirrors ``getbase(fmi->bwt, idx - (idx > fmi->endloc))``
    (seqindex.c:217-218).
    """
    i = idx - (idx > endloc).astype(idx.dtype)
    word = jnp.take(bwt_words, (i >> 4).astype(jnp.int32))
    return ((word >> (2 * (i & 15)).astype(jnp.uint32)) & 3).astype(jnp.int32)


def lf(
    bwt_words: jax.Array,
    occ: jax.Array,
    C: jax.Array,
    endloc: jax.Array,
    idx: jax.Array,
) -> jax.Array:
    """LF-mapping (seqindex.c:214-219): ``lf(endloc) == 0``."""
    c = bwt_char(bwt_words, endloc, idx)
    stepped = jnp.take(C, c) + rank(bwt_words, occ, endloc, c, idx)
    return jnp.where(idx == endloc, jnp.zeros_like(stepped), stepped)
