from .mesh import make_mesh, DATA_AXIS, SEARCH_AXIS
from .sharded import encode_batch_sharded, decode_batch_sharded

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "SEARCH_AXIS",
    "encode_batch_sharded",
    "decode_batch_sharded",
]
