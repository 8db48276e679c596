from . import api, awq, calib, gptq, owq  # noqa: F401
from .api import get_quantized_params  # noqa: F401
