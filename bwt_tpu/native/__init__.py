from bwt_tpu.native.loader import (
    available,
    load_genome,
    load_reads,
    load_fastq,
    fasta_to_text,
    pack_words,
    pack_ref_bytes,
)

__all__ = [
    "available",
    "load_genome",
    "load_reads",
    "load_fastq",
    "fasta_to_text",
    "pack_words",
    "pack_ref_bytes",
]
