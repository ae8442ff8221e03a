from bwt_tpu.utils.cigar import Cigar

__all__ = ["Cigar"]
