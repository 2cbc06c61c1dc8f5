from .codebook import Codebook, build_codebook, extract_ranges
from .matcher import SearchResult, search, solve_so
from .encoder import (EncodeResult, encode_plane, encode_batch,
                      encode_batch_stacked, encode_stats)

__all__ = [
    "Codebook",
    "build_codebook",
    "extract_ranges",
    "SearchResult",
    "search",
    "solve_so",
    "EncodeResult",
    "encode_plane",
    "encode_batch",
    "encode_batch_stacked",
    "encode_stats",
]
