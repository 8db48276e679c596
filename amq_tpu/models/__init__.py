from . import config, linear, llama, transform  # noqa: F401
from .config import LINEAR_NAMES, ModelConfig, get_config  # noqa: F401
from .linear import DenseLinear, ProxySwitch, QuantLinear, apply_linear  # noqa: F401
from .llama import KVCache, forward, init_params  # noqa: F401
from .transform import build_switch_model, quantize_model, set_arch, uniform_arch  # noqa: F401
