from pepr_tpu.data.blosum62 import BLOSUM62, blosum62_matrix
from pepr_tpu.data.wag import WAG_RATES, WAG_FREQS, wag_rate_matrix

__all__ = ["BLOSUM62", "blosum62_matrix", "WAG_RATES", "WAG_FREQS",
           "wag_rate_matrix"]
