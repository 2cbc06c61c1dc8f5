from .quantize import quantize, dequantize, DEFAULT_S_BITS, DEFAULT_O_BITS
from .bitstream import pack_result, unpack_result

__all__ = [
    "quantize",
    "dequantize",
    "DEFAULT_S_BITS",
    "DEFAULT_O_BITS",
    "pack_result",
    "unpack_result",
]
