from .quantize import quantize, dequantize, DEFAULT_S_BITS, DEFAULT_O_BITS
from .bitstream import pack_result, unpack_result
from .container import pack_container, unpack_container, is_container

__all__ = [
    "quantize",
    "dequantize",
    "DEFAULT_S_BITS",
    "DEFAULT_O_BITS",
    "pack_result",
    "unpack_result",
    "pack_container",
    "unpack_container",
    "is_container",
]
