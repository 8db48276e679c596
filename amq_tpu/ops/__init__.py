from . import quant_matmul  # noqa: F401
from .quant_matmul import quant_matmul as fused_quant_matmul  # noqa: F401
