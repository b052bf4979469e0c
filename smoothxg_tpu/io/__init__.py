from .gfa import read_gfa, write_gfa
