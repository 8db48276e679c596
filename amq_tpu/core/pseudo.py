"""Simulated (fake) quantizers used by the PTQ algorithms.

jnp re-expressions of:

* ``pseudo_quantize_tensor`` — AWQ's group-wise asymmetric min/max
  fake-quant (awq_utils/quantizer.py:61-105),
* the GPTQ ``Quantizer`` min/max + optional MSE-grid parameter search
  (quantization/gptq.py:323-439),
* the elementwise ``quantize`` helper (quantization/gptq.py:12-16).

All operate on ``[out, in]`` weights and return fake-quantized weights of
the same shape/dtype, matching the reference's numerics in float32.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_bit", "group_size"))
def pseudo_quantize(w: jnp.ndarray, n_bit: int, group_size: int = 128) -> jnp.ndarray:
    """AWQ group-wise asymmetric fake-quant (awq_utils/quantizer.py:61-105).

    ``scales = clamp(max-min, 1e-5) / (2^b - 1)``;
    ``zeros = clamp(-round(min/scales), 0, 2^b - 1)``.
    """
    org_shape = w.shape
    g = group_size if group_size > 0 else org_shape[-1]
    wg = w.astype(jnp.float32).reshape(-1, g)
    max_val = wg.max(axis=1, keepdims=True)
    min_val = wg.min(axis=1, keepdims=True)
    max_int = 2**n_bit - 1
    scales = jnp.maximum(max_val - min_val, 1e-5) / max_int
    zeros = jnp.clip(-jnp.round(min_val / scales), 0, max_int)
    q = jnp.clip(jnp.round(wg / scales) + zeros, 0, max_int)
    return ((q - zeros) * scales).reshape(org_shape).astype(w.dtype)


def quantize_affine(x: jnp.ndarray, scale: jnp.ndarray, zero: jnp.ndarray,
                    maxq) -> jnp.ndarray:
    """GPTQ's fake-quant primitive (gptq.py:12-16): ``s*(clip(round(x/s)+z)-z)``."""
    q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


class MinMaxParams(NamedTuple):
    scale: jnp.ndarray
    zero: jnp.ndarray


@partial(jax.jit, static_argnames=("bits", "sym", "mse", "grid", "maxshrink", "norm"))
def find_params_minmax(
    x: jnp.ndarray,
    bits: int,
    sym: bool = False,
    mse: bool = False,
    grid: int = 100,
    maxshrink: float = 0.8,
    norm: float = 2.4,
) -> MinMaxParams:
    """Per-row (out-channel) quant params (gptq.py Quantizer.find_params:358-430).

    ``x`` is ``[rows, cols]``; returns scale/zero of shape ``[rows, 1]``.
    """
    maxq = 2**bits - 1
    x = x.astype(jnp.float32)
    xmin = jnp.minimum(x.min(axis=1), 0.0)
    xmax = jnp.maximum(x.max(axis=1), 0.0)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    both_zero = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(both_zero, -1.0, xmin)
    xmax = jnp.where(both_zero, 1.0, xmax)

    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)

    if mse:
        def body(i, carry):
            best, scale_c, zero_c = carry
            p = 1 - i.astype(jnp.float32) / grid
            xmin1 = p * xmin
            xmax1 = p * xmax
            scale1 = (xmax1 - xmin1) / maxq
            zero1 = jnp.round(-xmin1 / scale1) if not sym else zero
            q = quantize_affine(x, scale1[:, None], zero1[:, None], maxq)
            err = jnp.sum(jnp.abs(q - x) ** norm, axis=1)
            take = err < best
            return (jnp.where(take, err, best),
                    jnp.where(take, scale1, scale_c),
                    jnp.where(take, zero1, zero_c))

        init = (jnp.full((x.shape[0],), jnp.inf, jnp.float32), scale, zero)
        _, scale, zero = jax.lax.fori_loop(0, int(maxshrink * grid), body, init)

    return MinMaxParams(scale=scale[:, None], zero=zero[:, None])
