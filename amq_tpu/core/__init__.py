from . import bitpack, pseudo, quantize  # noqa: F401
from .quantize import QuantizedTensor, dequantize, dequantize_kn  # noqa: F401
