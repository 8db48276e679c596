"""Group-wise affine weight quantization (HQQ core, TPU-native).

Re-expresses the reference HQQ quantizer (hqq/core/quantize.py:75-199) and
its proximal zero-point solver (hqq/core/optimize.py:208-255) as pure jnp
functions over pytrees.  Numerics follow the reference:

* groups of ``group_size`` consecutive in-features per out-row (axis=1),
* inverse-scale formulation ``q = round(W * scale + zero)`` with
  ``scale = (2^b - 1) / (max - min)``, small-denominator guard at 1e-4,
  scale clamp at 2e4, ``zero = -min * scale`` (quantize.py:120-135),
* optional zero rounding (the reference's BaseQuantizeConfig sets
  ``round_zero=True`` iff nbits==4, quantize.py:1097),
* proximal solver: 20 iterations of round/clamp -> lp-shrink (p=0.7,
  beta=10, kappa=1.01) -> zero update, early-stopped on the first
  non-improvement of mean |W - dequant| (optimize.py:208-255),
* stored meta inverts the scale so dequant is ``(q - zero) * scale``.

Differences from the reference (deliberate, TPU-first):

* everything runs in float32 (the reference drops to fp16 on CUDA),
* packed codes use the layout of :mod:`amq_tpu.core.bitpack` — transposed
  ``[K, N]``, group-aligned planar uint32 words — not torch uint8/int32
  strided packing,
* scale/zero are stored as ``[K/g, N]`` (transposed) so a fused
  dequant-matmul kernel reads them in the same orientation as the packed
  codes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from . import bitpack


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """A group-quantized linear weight in TPU-native packed form.

    ``dequant(qt) @ x`` computes the same linear map as ``W @ x`` for the
    original ``[out, in]`` weight; internally everything is stored
    transposed (``kn`` layout) so the forward is ``x @ Wt``.
    """

    packed: jnp.ndarray   # uint32 [K * nbits / 32, N]
    scale: jnp.ndarray    # [K / g, N]  (dequant scale, i.e. inverted)
    zero: jnp.ndarray     # [K / g, N]
    nbits: int = dataclasses.field(metadata=dict(static=True))
    group_size: int = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))  # (out, in)
    #: planar packing block (= the fused kernel's K tile); 0 -> group_size
    superblock: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def superblock_(self) -> int:
        return self.superblock or self.group_size

    @property
    def out_features(self) -> int:
        return self.shape[0]

    @property
    def in_features(self) -> int:
        return self.shape[1]


def _shrink_lp(x: jnp.ndarray, beta: float, lp_norm: float) -> jnp.ndarray:
    """lp shrinkage operator (optimize.py:96-108)."""
    a = jnp.abs(x)
    if lp_norm == 1:
        out = jnp.maximum(a - 1.0 / beta, 0.0)
    else:
        out = jnp.maximum(a - (1.0 / beta) * a ** (lp_norm - 1), 0.0)
    return out * jnp.sign(x)


def optimize_zero_proximal(
    Wg: jnp.ndarray,
    scale: jnp.ndarray,
    zero: jnp.ndarray,
    max_v: float,
    lp_norm: float = 0.7,
    beta: float = 10.0,
    kappa: float = 1.01,
    iters: int = 20,
):
    """Proximal zero-point refinement on grouped weights ``[n_groups, g]``.

    Mirrors ``optimize_weights_proximal_legacy`` (optimize.py:208-255): each
    step rounds/clamps, shrinks the residual, and re-estimates the zero
    point; stops early (by masking further updates) once the mean absolute
    reconstruction error stops improving.  ``scale`` here is the *forward*
    scale (multiplied, not divided).
    """

    def step(carry, beta_i):
        zero_c, best_zero, best_err, done = carry
        W_q = jnp.clip(jnp.round(Wg * scale + zero_c), 0.0, max_v)
        W_r = (W_q - zero_c) / scale
        err = jnp.mean(jnp.abs(Wg - W_r))
        improved = err < best_err
        take = jnp.logical_and(improved, jnp.logical_not(done))
        best_zero = jnp.where(take, zero_c, best_zero)
        best_err = jnp.where(take, err, best_err)
        done = jnp.logical_or(done, jnp.logical_not(improved))
        W_e = _shrink_lp(Wg - W_r, beta_i, lp_norm)
        zero_n = jnp.mean(W_q - (Wg - W_e) * scale, axis=1, keepdims=True)
        zero_c = jnp.where(done, zero_c, zero_n)
        return (zero_c, best_zero, best_err, done), None

    betas = beta * kappa ** jnp.arange(iters, dtype=Wg.dtype)
    init = (zero, zero, jnp.array(jnp.inf, Wg.dtype), jnp.array(False))
    (_, best_zero, _, _), _ = jax.lax.scan(step, init, betas)
    return best_zero


@partial(jax.jit, static_argnames=("nbits", "group_size", "optimize",
                                   "round_zero", "meta_dtype",
                                   "superblock"))
def quantize(
    W: jnp.ndarray,
    nbits: int = 4,
    group_size: int = 128,
    optimize: bool = True,
    round_zero: Optional[bool] = None,
    meta_dtype=jnp.float32,
    superblock: Optional[int] = None,
) -> QuantizedTensor:
    """HQQ-quantize an ``[out, in]`` weight into a :class:`QuantizedTensor`.

    ``round_zero`` defaults to ``nbits == 4`` as in the reference config
    factory (hqq/core/quantize.py:1097).

    ``meta_dtype`` is the scale/zero storage dtype.  float32 keeps exact
    eval parity with the XLA reference path; bfloat16 halves the
    per-group metadata stream for serving — the closest analogue of the
    reference's fp16 meta on CUDA (HQQLinear stores half-precision
    scale/zero).  Quality impact is bounded by one bf16 ulp on scale
    (2^-8 relative) and zero (<= 0.06 quant steps), tested in
    tests/test_quantize.py.
    """
    assert nbits in bitpack.SUPPORTED_BITS, nbits
    out_f, in_f = W.shape
    # the transposed packed layout requires groups not to straddle rows
    assert in_f % group_size == 0, (W.shape, group_size)
    if round_zero is None:
        round_zero = nbits == 4

    Wf = W.astype(jnp.float32)
    Wg = Wf.reshape(-1, group_size)  # groups = consecutive in-features per row
    _min = Wg.min(axis=1, keepdims=True)
    _max = Wg.max(axis=1, keepdims=True)
    max_v = float(round(2**nbits - 1))

    denom = _max - _min
    scale = max_v / denom
    scale = jnp.where(jnp.abs(denom) <= 1e-4, jnp.ones_like(scale), scale)
    scale = jnp.clip(scale, None, 2e4)
    zero = -_min * scale
    if round_zero:
        zero = jnp.round(zero)

    if optimize:
        zero = optimize_zero_proximal(Wg, scale, zero, max_v)

    W_q = jnp.clip(jnp.round(Wg * scale + zero), 0.0, max_v)

    # store per [out, in/g] then transpose to the kernel's [in/g, out]
    n_groups_per_row = in_f // group_size
    scale_t = (1.0 / scale).reshape(out_f, n_groups_per_row).T.astype(meta_dtype)
    zero_t = zero.reshape(out_f, n_groups_per_row).T.astype(meta_dtype)

    codes_kn = W_q.reshape(out_f, in_f).T.astype(jnp.uint32)  # [K, N]
    # a tensor-parallel shard must own whole superblocks: callers that
    # will shard K pass an explicit (smaller) superblock
    if superblock:
        k_pad = 0
        assert in_f % superblock == 0, (in_f, superblock)
    else:
        superblock, k_pad = bitpack.pick_superblock_padded(in_f, group_size)
    if k_pad:
        # round K up to whole superblocks (see pick_superblock_padded);
        # zero codes/scale/zero rows dequantize to 0 and the kernels
        # zero-pad x over the extra in-features
        codes_kn = jnp.pad(codes_kn, ((0, k_pad), (0, 0)))
        scale_t = jnp.pad(scale_t, ((0, k_pad // group_size), (0, 0)))
        zero_t = jnp.pad(zero_t, ((0, k_pad // group_size), (0, 0)))
    packed = bitpack.pack(codes_kn, nbits, superblock)

    return QuantizedTensor(
        packed=packed,
        scale=scale_t,
        zero=zero_t,
        nbits=nbits,
        group_size=group_size,
        shape=(out_f, in_f),
        superblock=superblock,
    )


def to_container(qt: QuantizedTensor, container_bits: int) -> QuantizedTensor:
    """Repack the same codes into wider ``container_bits`` fields.

    Code values, scale, and zero are untouched, so the dequantized weight
    is bit-identical — only the packed storage/stream width changes.  Used
    to serve 3-bit layers through the 4-bit kernel path: the measured
    decode GEMV is VPU-extraction-bound, and the 3-bit 2+1-plane
    recombination costs ~3.3x the ops of nibble extraction (all-3-bit
    16.2 ms/token vs all-4-bit 7.9 on Llama-2-7B; scripts/bisect7.py), so
    streaming 4 bits for 3-bit codes is a strict wall-clock win at +1/3
    HBM bytes.  Native 3-bit packing remains the capacity-optimal option.
    """
    assert container_bits >= qt.nbits, (qt.nbits, container_bits)
    if container_bits == qt.nbits:
        return qt
    codes = bitpack.unpack(qt.packed, qt.nbits, qt.superblock_)
    packed = bitpack.pack(codes, container_bits, qt.superblock_)
    return dataclasses.replace(qt, packed=packed, nbits=container_bits)


def dequantize_kn(qt: QuantizedTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize to the transposed ``[in, out]`` layout (kernel orientation)."""
    codes = bitpack.unpack(qt.packed, qt.nbits, qt.superblock_)  # [Kp, Np]
    K, N = codes.shape
    g = qt.group_size
    c = codes.reshape(K // g, g, N).astype(dtype)
    scale = qt.scale.reshape(K // g, 1, N).astype(dtype)
    zero = qt.zero.reshape(K // g, 1, N).astype(dtype)
    w = ((c - zero) * scale).reshape(K, N)
    # packed arrays may be padded up to tile-friendly sizes (serving
    # stacks pad K to the superblock and N to the kernel n-tile); the
    # logical weight is the leading [in, out] block
    return w[:qt.in_features, :qt.out_features]


def dequantize(qt: QuantizedTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize back to the original ``[out, in]`` weight."""
    return dequantize_kn(qt, dtype).T.reshape(qt.shape)
