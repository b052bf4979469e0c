"""Compressed in-RAM block graph cache with sampling policy.

Equivalent capability to the reference's zstd block codec + load policy
(reference: src/zstdutil.cpp, src/utils.cpp:78-99 save/get_block_graph and
the sample-rate decompress-on-demand policy at src/main.cpp:616-651: keep
all decompressed below 6M blocks, every 2nd below 12M, every 4th above).

zlib is used instead of zstd (no zstd module in the image); the API is the
policy, not the codec. At current scales the pipeline holds block graphs
uncompressed; this cache exists for pod-scale runs where millions of block
graphs must be memory-bounded.
"""
from __future__ import annotations

import pickle
import zlib


def compress_block(obj) -> bytes:
    return zlib.compress(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL), 1)


def decompress_block(blob: bytes):
    return pickle.loads(zlib.decompress(blob))


def sample_rate_for(block_count: int) -> int:
    """0 = keep all decompressed; else keep every `rate`-th decompressed
    (reference: src/main.cpp:616)."""
    if block_count > 12_000_000:
        return 4
    if block_count > 6_000_000:
        return 2
    return 0


class BlockGraphCache:
    """Holds every block graph compressed; keeps a sampled subset hot."""

    def __init__(self, block_count: int, sample_rate: int | None = None):
        self.blobs: list[bytes | None] = [None] * block_count
        self.hot: dict[int, object] = {}
        self.rate = sample_rate_for(block_count) if sample_rate is None else sample_rate

    def put(self, block_id: int, graph) -> None:
        self.blobs[block_id] = compress_block(graph)
        if self.rate == 0 or block_id % self.rate == 0:
            self.hot[block_id] = graph

    def get(self, block_id: int):
        g = self.hot.get(block_id)
        if g is not None:
            return g
        return decompress_block(self.blobs[block_id])
