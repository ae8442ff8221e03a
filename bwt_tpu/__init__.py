"""bwt_tpu — a TPU-native FM-index sequence-search engine.

A brand-new JAX / XLA / Pallas framework with the capabilities of the C
reference `yichizhng/bwt`: 2-bit nucleotide codecs, massively-parallel
suffix-array construction (prefix doubling on device), BWT derivation,
an FM-index whose rank/Occ queries run as vectorized popcount-over-packed
words, batched backward search / locate over thousands of reads per step,
and seed-and-extend alignment with DP stitching and CIGAR output.

Scales over a `jax.sharding.Mesh`: index replicated (or sharded) per
device, read batches data-parallel, hit lists merged with collectives.
"""

__version__ = "0.1.0"

from bwt_tpu import codec
from bwt_tpu.index import FMIndex, build_index
from bwt_tpu.ops.rank import rank as fm_rank

__all__ = [
    "codec",
    "FMIndex",
    "build_index",
    "fm_rank",
]
