from .dna import revcomp, revcomp_bytes, encode_seq, decode_seq
from .params import handy_parameter, split_csv
