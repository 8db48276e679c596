"""Low-rank adapters over quantized linears (HQQ PEFT parity).

The reference vendors HQQ's ``HQQLinearLoRA`` (hqq/core/peft.py: adapter
forward ``y = W_q(x) + (x @ A) @ B`` plus merge utilities); AMQ's main
path never trains, so this module provides the inference-relevant pieces:
adapter application on :class:`QuantLinear` params and weight merging
(dequantize -> add -> requantize).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.linear import QuantLinear, apply_linear
from . import quantize as qcore


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LoRAAdapter:
    A: jnp.ndarray          # [in, r]
    B: jnp.ndarray          # [r, out]
    scaling: float = dataclasses.field(default=1.0,
                                       metadata=dict(static=True))


def init_adapter(key: jax.Array, in_features: int, out_features: int,
                 rank: int = 8, scaling: float = 1.0,
                 dtype=jnp.float32) -> LoRAAdapter:
    ka, _ = jax.random.split(key)
    A = jax.random.normal(ka, (in_features, rank), dtype) / jnp.sqrt(rank)
    B = jnp.zeros((rank, out_features), dtype)
    return LoRAAdapter(A=A, B=B, scaling=scaling)


def apply_lora_linear(p: QuantLinear, adapter: Optional[LoRAAdapter],
                      x: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    y = apply_linear(p, x, compute_dtype)
    if adapter is not None:
        lo = jnp.dot(x.astype(compute_dtype), adapter.A.astype(compute_dtype))
        lo = jnp.dot(lo, adapter.B.astype(compute_dtype))
        y = y + adapter.scaling * lo.astype(y.dtype)
    return y


def merge_adapter(p: QuantLinear, adapter: LoRAAdapter) -> QuantLinear:
    """Fold the adapter into the packed weight (peft.py merge path):
    dequantize, add scaling * (A @ B)^T, requantize at the same config."""
    W = qcore.dequantize(p.qt)                     # [out, in]
    delta = (adapter.A @ adapter.B).T * adapter.scaling
    qt = qcore.quantize(W + delta.astype(W.dtype), nbits=p.qt.nbits,
                        group_size=p.qt.group_size,
                        superblock=p.qt.superblock or None)
    return QuantLinear(qt=qt, bias=p.bias)
