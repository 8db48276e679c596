"""Block-wise calibration propagation (the Catcher, functionally).

The reference captures block-0 inputs by raising from a wrapper module
(quantization/gptq.py:60-79, awq_utils/pre_quant.py:109-126) and then
propagates hidden states block by block on one device.  Functionally that
is just: embed once, then fold each decoder layer over the hidden states,
optionally collecting each linear site's input activations (via the
``captures`` hook in :func:`amq_tpu.models.llama.decoder_layer`).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig


def embed_inputs(params: Dict[str, Any], cfg: ModelConfig,
                 tokens: jnp.ndarray, compute_dtype=jnp.float32):
    """Token embedding + shared rope/mask for a full-sequence pass."""
    B, S = tokens.shape
    x = params["embed"][tokens].astype(compute_dtype)
    positions = jnp.arange(S, dtype=jnp.int32)[None, :]
    cos, sin = llama.rope_cos_sin(cfg, positions, dtype=compute_dtype)
    mask = llama._causal_mask(S, S, jnp.int32(0), cfg.sliding_window)
    return x, cos, sin, mask


@partial(jax.jit, static_argnames=("cfg", "capture", "compute_dtype"))
def run_block(layer_params, cfg: ModelConfig, x, cos, sin, mask,
              capture: bool = False, compute_dtype=jnp.float32):
    """One decoder block; returns (out_hidden, captures dict or {})."""
    caps: Dict[str, jnp.ndarray] = {} if capture else None
    out, _ = llama.decoder_layer(layer_params, cfg, x, cos, sin, mask,
                                 compute_dtype, captures=caps)
    return out, (caps or {})


def accumulate_hessians(captures: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Per-site ``X^T X`` over all tokens (un-normalized, fp32)."""
    out = {}
    for name, x in captures.items():
        xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        out[name] = jnp.dot(xf.T, xf, preferred_element_type=jnp.float32)
    return out


def layer_to_host(layer: Dict[str, Any]) -> Dict[str, Any]:
    """Move a block's fake-quant DenseLinear weights to host memory — at
    7B+ the quantized output pytree (13.5 GB bf16) cannot accumulate on
    device next to the calibration activations/Hessians.  Norms/biases
    (tiny, usually already host refs from the input pytree) pass through."""
    from ..models.linear import DenseLinear, OWQLinear

    cpu = jax.devices("cpu")[0]
    out = {}
    for k, v in layer.items():
        if isinstance(v, DenseLinear):
            out[k] = DenseLinear(weight=jax.device_put(v.weight, cpu),
                                 bias=v.bias)
        elif isinstance(v, OWQLinear):
            out[k] = jax.tree.map(lambda a: jax.device_put(a, cpu), v)
        else:
            out[k] = v
    return out
