"""Linear-layer application over interchangeable weight representations.

The reference swaps ``nn.Linear``-like modules in and out of a live torch
model (evaluator.py:71-81 setsubattr; hqq backend patching).  TPU-native,
a "linear layer" is just a pytree leaf bundle, and *which representation it
is* decides how the jitted forward applies it:

* dense ``jnp.ndarray`` ``[out, in]`` — plain matmul,
* :class:`~amq_tpu.core.quantize.QuantizedTensor` — dequantize-then-matmul
  (XLA path) or the fused Pallas kernel (ops.quant_matmul),
* :class:`ProxySwitch` — all three per-bit proxy quantizations stacked, with
  a *traced* integer selector: ``lax.switch`` picks the branch at runtime,
  so evaluating a new mixed-bit architecture never retraces (the reference
  re-stitches module references per arch instead, evaluator.py:71-81).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..core.quantize import QuantizedTensor, dequantize_kn


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseLinear:
    weight: jnp.ndarray  # [out, in]
    bias: Optional[jnp.ndarray] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantLinear:
    qt: QuantizedTensor
    bias: Optional[jnp.ndarray] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ProxySwitch:
    """Per-bit proxy quantizations of one linear + a traced selector index.

    ``select`` indexes into ``proxies`` (ordered by ``bits_range``); it is a
    scalar int32 array so a whole architecture is just a vector of these —
    swapping architectures is a new input, not a new program.
    """

    proxies: Sequence[QuantLinear]
    select: jnp.ndarray  # scalar int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OWQLinear:
    """One linear in OWQ packed serving form (quantization/owq.OWQPacked:
    fused dequant-GEMV over the compacted non-outlier columns + a dense
    bf16 tail matmul over the fp outlier columns).  The reference ships
    QEFT kernels for this contract but never compiles them
    (ft/quantization_new/gemv/gemv_cuda_qeft.cu:392 absent from
    ft/setup.py) — upstream OWQ is eval-only; here it serves."""

    packed: "object"           # quantization.owq.OWQPacked (registered pytree)
    bias: Optional[jnp.ndarray] = None


LinearParams = Union[DenseLinear, QuantLinear, OWQLinear, ProxySwitch]

# Optional fused-kernel implementation for QuantLinear application.  The
# serving engine installs the Pallas dequant-matmul here (trace-time
# dispatch: the flag is read while tracing, so each jitted program bakes
# in one path).  None -> XLA dequantize-then-matmul.
_KERNEL_IMPL = None


class kernel_linears:
    """Context manager routing QuantLinear matmuls through ``impl``."""

    def __init__(self, impl):
        self.impl = impl

    def __enter__(self):
        global _KERNEL_IMPL
        self._old = _KERNEL_IMPL
        _KERNEL_IMPL = self.impl
        return self

    def __exit__(self, *exc):
        global _KERNEL_IMPL
        _KERNEL_IMPL = self._old
        return False


def _matmul(x: jnp.ndarray, wt: jnp.ndarray, bias, compute_dtype) -> jnp.ndarray:
    y = jnp.dot(x.astype(compute_dtype), wt.astype(compute_dtype),
                preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(compute_dtype)


def apply_linear(p: LinearParams, x: jnp.ndarray,
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """``x @ W.T (+ b)`` for any weight representation. x: [..., in]."""
    if isinstance(p, DenseLinear):
        return _matmul(x, p.weight.T, p.bias, compute_dtype)
    if isinstance(p, QuantLinear):
        if _KERNEL_IMPL is not None:
            return _KERNEL_IMPL(p, x, compute_dtype)
        wt = dequantize_kn(p.qt, dtype=compute_dtype)  # [in, out]
        return _matmul(x, wt, p.bias, compute_dtype)
    if isinstance(p, OWQLinear):
        from ..quantization.owq import owq_matmul
        y = owq_matmul(x, p.packed, out_dtype=compute_dtype,
                       use_kernel=_KERNEL_IMPL is not None)
        if p.bias is not None:
            y = y + p.bias.astype(y.dtype)
        return y
    if isinstance(p, ProxySwitch):
        branches = [
            (lambda q: lambda: apply_linear(q, x, compute_dtype))(q)
            for q in p.proxies
        ]
        return jax.lax.switch(p.select, branches)
    raise TypeError(f"unsupported linear params: {type(p)}")
