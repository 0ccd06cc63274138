from pepr_tpu.io.fasta import (SequenceSet, read_fasta, write_fasta,
                               taxon_from_title, pack_padded)

__all__ = ["SequenceSet", "read_fasta", "write_fasta", "taxon_from_title",
           "pack_padded"]
