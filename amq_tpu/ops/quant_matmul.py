"""Fused unpack -> dequantize -> matmul Pallas kernels (the serving hot path).

TPU-native replacement for the reference's three CUDA kernel families —
FT w4a16 GEMM/GEMV (ft/quantization_new/{gemm,gemv}) and the AutoGPTQ
2/3-bit ``vecquant*matmul_faster_old`` GEMV (AutoGPTQ/auto_gptq_kernel.cu)
— as ONE kernel template parameterized by ``nbits`` at trace time, so a
mixed-bit model is just different constants per layer inside one jitted
step (replacing the reference's per-layer module dispatch).

Design:
* weights stay packed in HBM in the :mod:`amq_tpu.core.bitpack` layout
  (``[K*b/32, N]`` uint32, group-aligned planar planes), so HBM traffic is
  exactly ``b`` bits/weight — the roofline for weight-only quantization,
* grid ``(m, n, k)``; per step the packed block is unpacked plane-by-plane
  with static shifts into a VMEM scratch of dequantized values
  (group-blocked writes keep every slice sublane-aligned), then a single
  MXU matmul accumulates into the output tile,
* 3-bit is a 2-bit plane + 1-bit plane recombination — all power-of-two
  strides (the reference's 10-per-int32 layout cannot vectorize here),
* decode (M<=8) and prefill (M large) use the same kernel with different
  m-tiling; the k-grid axis is sequential ("arbitrary") for accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.bitpack import packed_rows
from ..core.quantize import QuantizedTensor, dequantize_kn


def _pick_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dimension {dim} not tileable by {candidates}")


def _unpack_plane(w, shift, nbits):
    mask = jnp.uint32(2**nbits - 1)
    return ((w >> jnp.uint32(shift)) & mask).astype(jnp.int32)


def _dequant_group_to_scratch(scratch, w_blk, s_row, z_row, t, nbits,
                              group_size, acc_dtype):
    """Unpack one group's packed rows into scratch[t*g:(t+1)*g, :]."""
    g = group_size
    if nbits == 3:
        hi_rows = packed_rows(g, 2)   # 2-bit plane rows
        lo_rows = packed_rows(g, 1)   # 1-bit plane rows
        base = t * (hi_rows + lo_rows)
        hi = w_blk[base:base + hi_rows, :]
        lo = w_blk[base + hi_rows:base + hi_rows + lo_rows, :]
        # natural order c[j] for j = i*sub + r requires assembling both
        # planes at their own strides, then recombining
        for i in range(16):  # 2-bit: 16 vals/word
            shift = 2 * (16 - 1 - i)
            part = _unpack_plane(hi, shift, 2) << 1
            scratch[t * g + i * hi_rows:t * g + (i + 1) * hi_rows, :] = (
                part.astype(acc_dtype))
        for i in range(32):  # 1-bit: 32 vals/word
            shift = (32 - 1 - i)
            part = _unpack_plane(lo, shift, 1)
            rows = lo_rows
            sl = slice(t * g + i * rows, t * g + (i + 1) * rows)
            scratch[sl, :] = ((scratch[sl, :]).astype(jnp.int32)
                              + part).astype(acc_dtype)
        sl = slice(t * g, (t + 1) * g)
        scratch[sl, :] = ((scratch[sl, :] - z_row) * s_row).astype(acc_dtype)
    else:
        rows = packed_rows(g, nbits)
        vals_per_word = 32 // nbits
        base = t * rows
        wt = w_blk[base:base + rows, :]
        for i in range(vals_per_word):
            shift = nbits * (vals_per_word - 1 - i)
            c = _unpack_plane(wt, shift, nbits).astype(acc_dtype)
            scratch[t * g + i * rows:t * g + (i + 1) * rows, :] = (
                (c - z_row) * s_row)


def _qmm_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, scratch,
                *, nbits, group_size, groups_per_tile, acc_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # scale/zero blocks carry the full K/g rows (their per-k-tile row count
    # can be < 8, which Mosaic's sublane tiling rejects); index by k here
    row0 = k * groups_per_tile
    for t in range(groups_per_tile):
        s_row = s_ref[row0 + t, :][None, :].astype(acc_dtype)
        z_row = z_ref[row0 + t, :][None, :].astype(acc_dtype)
        _dequant_group_to_scratch(scratch, w_ref, s_row, z_row, t, nbits,
                                  group_size, acc_dtype)

    o_ref[:] += jnp.dot(x_ref[:].astype(acc_dtype), scratch[:],
                        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "group_size", "shape", "block_m", "block_n",
                     "block_k", "acc_dtype", "out_dtype"))
def _quant_matmul_packed(
    x: jnp.ndarray,        # [M, K]
    packed: jnp.ndarray,   # [K*b/32, N] uint32
    scale: jnp.ndarray,    # [K/g, N]
    zero: jnp.ndarray,     # [K/g, N]
    *,
    nbits: int,
    group_size: int,
    shape,                 # (out, in) == (N, K)
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    acc_dtype=jnp.float32,
    out_dtype=None,
) -> jnp.ndarray:
    N, K = shape
    M = x.shape[0]
    out_dtype = out_dtype or x.dtype
    g = group_size

    bm = block_m or (M if M <= 8 else _pick_tile(M, (256, 128, 64, 32, 16, 8)))
    bn = block_n or _pick_tile(N, (512, 256, 128))
    bk = block_k or _pick_tile(K, (1024, 512, 256, 128))
    assert bk % g == 0, (bk, g)
    groups_per_tile = bk // g
    rows_per_group = packed_rows(g, nbits)
    rows_per_tile = groups_per_tile * rows_per_group

    # pad M up to the fp32 sublane tile
    m_pad = -M % max(bm, 8)
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
        bm = x.shape[0] if M <= 8 else bm
    grid = (x.shape[0] // bm, N // bn, K // bk)

    kernel = functools.partial(
        _qmm_kernel, nbits=nbits, group_size=g,
        groups_per_tile=groups_per_tile, acc_dtype=acc_dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_tile, bn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // g, bn), lambda m, n, k: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // g, bn), lambda m, n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bk, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(K * nbits // 8) * N + M * K * x.dtype.itemsize
            + M * N * 4,
            transcendentals=0,
        ),
    )(x, packed, scale, zero)
    return out[:M]


def quant_matmul(x: jnp.ndarray, qt: QuantizedTensor,
                 out_dtype=None, acc_dtype=jnp.float32) -> jnp.ndarray:
    """``x @ W_dequant.T`` with W in packed form.  x: [..., K] -> [..., N]."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    assert K == qt.in_features, (x.shape, qt.shape)
    x2 = x.reshape(-1, K)
    out = _quant_matmul_packed(
        x2, qt.packed, qt.scale, qt.zero,
        nbits=qt.nbits, group_size=qt.group_size,
        shape=qt.shape, acc_dtype=acc_dtype, out_dtype=out_dtype)
    return out.reshape(*lead, qt.out_features)


def quant_matmul_reference(x: jnp.ndarray, qt: QuantizedTensor,
                           out_dtype=None) -> jnp.ndarray:
    """XLA fallback: dequantize then matmul (for tests / CPU)."""
    wt = dequantize_kn(qt, dtype=x.dtype)
    out = jnp.dot(x, wt, preferred_element_type=jnp.float32)
    return out.astype(out_dtype or x.dtype)
