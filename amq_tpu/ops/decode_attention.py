"""Fused decode attention over the stacked KV cache (flash-decode style).

TPU-native equivalent of the reference's fused masked decoder attention
(ft/attention/decoder_masked_multihead_attention_template.hpp — one CUDA
kernel per decode step doing QK^T, softmax, and PV against the cache).

Why a kernel (measured, scripts/profile_decode.py): the XLA decode path
first materializes the layer's [B,kv,T,hd] cache slice out of the stacked
[L,B,kv,T,hd] buffer (~19 us/layer of pure copy at 7B) and then runs the
score/softmax/PV einsums (~8 us/layer) as separate fused ops between the
Pallas GEMV calls.  Here the layer index is a scalar-prefetch BlockSpec
input, so the kernel DMAs K/V tiles straight from the stacked buffer, and:

* the T (context) axis is tiled with an online softmax (flash-decode), so
  VMEM residency is one [heads, Tt, hd] tile, not the whole context,
* tiles entirely beyond the live context are never fetched: their index
  map clamps to the last live tile, and an unchanged block index makes
  the pipeline skip the DMA — HBM traffic is proportional to the actual
  context length, not max_len,
* per-row offsets (slot-batched decode: every sequence at its own length)
  ride a second scalar-prefetch vector,
* this step's key/value (not yet in the cache — the cache is read-only
  inside the layer scan, models/stacked.py) contribute a final virtual
  column, so the softmax is exactly over [cache < offset] + [new token].

GQA walks the G query heads per KV head in a static Python loop; the
contractions are VPU broadcast-multiply-reduces (hd in lanes), which at
decode shapes beat per-head MXU matmuls.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_t_tile(T: int) -> int:
    for t in (256, 128, 64, 32, 16):
        if T % t == 0:
            return t
    return T


def _attn_kernel(offs_ref, idx_ref, q_ref, kc_ref, vc_ref, kn_ref, vn_ref,
                 o_ref, m_ref, l_ref, acc_ref,
                 *, G, Tt, window, g_major, neg=-1e30):
    b = pl.program_id(0)
    t = pl.program_id(2)
    n_t = pl.num_programs(2)
    off = offs_ref[b]
    hd = q_ref.shape[3]
    Hb = q_ref.shape[2] if g_major else q_ref.shape[1]

    def q_at(g):
        # g_major: q/o ride as [1, G, Hb, hd] so per-g access is a clean
        # 2-D [Hb, hd] slice — the [1, Hb, G, hd] layout's mid-tensor
        # singleton (vector<Hb x hd> -> <1 x Hb x 1 x hd>) is an
        # unsupported Mosaic shape cast when hd < the 128-lane tile
        return q_ref[0, g] if g_major else q_ref[0, :, g, :]

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, neg)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # tile of cache positions [t*Tt, t*Tt + Tt); live rows are < off
    t_pos = jax.lax.broadcasted_iota(jnp.int32, (Hb, Tt), 1) + t * Tt
    ok = t_pos < off
    if window is not None:
        ok = jnp.logical_and(ok, t_pos > off - window)
    live = jnp.logical_and(t * Tt < off, True)

    inv = jax.lax.rsqrt(jnp.float32(hd))
    kc = kc_ref[0, 0].astype(jnp.float32)       # [Hb, Tt, hd]
    vc = vc_ref[0, 0].astype(jnp.float32)

    for g in range(G):
        m = m_ref[g]                              # [Hb, 1]
        l = l_ref[g]
        q = q_at(g).astype(jnp.float32)                      # [Hb, hd]

        @pl.when(live)
        def _():
            s = jnp.sum(q[:, None, :] * kc, axis=2) * inv     # [Hb, Tt]
            s = jnp.where(ok, s, neg)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            corr = jnp.exp(m - m_new)                         # [Hb, 1]
            p = jnp.exp(s - m_new)                            # [Hb, Tt]
            m_ref[g] = m_new
            l_ref[g] = l * corr + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[g] = (acc_ref[g] * corr
                          + jnp.sum(p[:, :, None] * vc, axis=1))

        @pl.when(t == n_t - 1)
        def _():
            # the new token's key/value as a final virtual column (its
            # position IS off, outside the cache's live range)
            kn = kn_ref[0].astype(jnp.float32)               # [Hb, hd]
            vn = vn_ref[0].astype(jnp.float32)
            s1 = jnp.sum(q * kn, axis=1, keepdims=True) * inv  # [Hb, 1]
            m_fin = jnp.maximum(m_ref[g], s1)
            corr = jnp.exp(m_ref[g] - m_fin)
            p1 = jnp.exp(s1 - m_fin)
            l_fin = l_ref[g] * corr + p1
            acc = acc_ref[g] * corr + p1 * vn
            out = (acc / l_fin).astype(o_ref.dtype)
            if g_major:
                o_ref[0, g] = out
            else:
                o_ref[0, :, g, :] = out


@functools.partial(
    jax.jit,
    static_argnames=("window", "out_dtype"))
def decode_attention_indexed(
    q: jnp.ndarray,          # [B, Hkv, G, hd] (rope'd)
    k_cache: jnp.ndarray,    # [L, B, Hkv, T, hd]
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,      # [B, Hkv, hd] (rope'd, this step)
    v_new: jnp.ndarray,
    offsets: jnp.ndarray,    # [B] int32 per-row live lengths
    layer: jnp.ndarray,      # scalar int32
    window: Optional[int] = None,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Decode attention for one layer of a stacked cache -> [B, Hkv, G, hd]."""
    B, Hkv, G, hd = q.shape
    T = k_cache.shape[3]
    Tt = _pick_t_tile(T)
    n_t = T // Tt
    # KV-head block: bigger blocks = fewer grid cells / larger DMAs (the
    # per-cell overhead dominates at slot-batched B); capped so the K+V
    # double-buffered tiles stay within ~8 MB of VMEM.  Blocks are
    # divisors of Hkv that are sublane-friendly (multiples of 8, or all
    # of a small-GQA Hkv).
    def _vmem_ok(h):
        return h * Tt * hd * 2 * 2 * 2 <= 8 * 2**20
    Hb = Hkv
    if not _vmem_ok(Hb) or (Hkv > 8 and Hkv % 8):
        Hb = next((h for h in range(Hkv, 0, -1)
                   if Hkv % h == 0 and h % 8 == 0 and _vmem_ok(h)), None)
        if Hb is None:
            Hb = next(h for h in range(min(Hkv, 8), 0, -1) if Hkv % h == 0)

    offs = jnp.asarray(offsets, jnp.int32).reshape(B)
    idx = jnp.asarray(layer, jnp.int32).reshape(1)

    # hd below the 128-lane tile: ship q/out G-major ([B, G, Hkv, hd]) so
    # per-g kernel access is 2-D — see _attn_kernel.q_at
    g_major = hd < 128
    if g_major:
        q = jnp.swapaxes(q, 1, 2)

    # clamp the T-tile index to the last live tile: an unchanged block
    # index skips the DMA, so dead tail tiles are never streamed
    def cache_map(b, h, t, offs, idx):
        last = jnp.maximum(offs[b] - 1, 0) // Tt
        return (idx[0], b, h, jnp.minimum(t, last), 0)

    grid = (B, Hkv // Hb, n_t)
    kernel = functools.partial(_attn_kernel, G=G, Tt=Tt, window=window,
                               g_major=g_major)

    if g_major:
        q_spec = pl.BlockSpec((1, G, Hb, hd),
                              lambda b, h, t, offs, idx: (b, 0, h, 0))
        o_spec = pl.BlockSpec((1, G, Hb, hd),
                              lambda b, h, t, offs, idx: (b, 0, h, 0))
        o_shape = (B, G, Hkv, hd)
    else:
        q_spec = pl.BlockSpec((1, Hb, G, hd),
                              lambda b, h, t, offs, idx: (b, h, 0, 0))
        o_spec = pl.BlockSpec((1, Hb, G, hd),
                              lambda b, h, t, offs, idx: (b, h, 0, 0))
        o_shape = (B, Hkv, G, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                       # offsets, layer idx
        grid=grid,
        in_specs=[
            q_spec,
            pl.BlockSpec((1, 1, Hb, Tt, hd), cache_map),
            pl.BlockSpec((1, 1, Hb, Tt, hd), cache_map),
            pl.BlockSpec((1, Hb, hd), lambda b, h, t, offs, idx: (b, h, 0)),
            pl.BlockSpec((1, Hb, hd), lambda b, h, t, offs, idx: (b, h, 0)),
        ],
        out_specs=o_spec,
        scratch_shapes=[
            pltpu.VMEM((G, Hb, 1), jnp.float32),     # running max
            pltpu.VMEM((G, Hb, 1), jnp.float32),     # running denominator
            pltpu.VMEM((G, Hb, hd), jnp.float32),    # running numerator
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(o_shape, out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hkv * G * T * hd,
            bytes_accessed=2 * B * Hkv * T * hd
            * k_cache.dtype.itemsize,
            transcendentals=B * Hkv * G * T,
        ),
    )(offs, idx, q, k_cache, v_cache, k_new, v_new)
    if g_major:
        out = jnp.swapaxes(out, 1, 2)
    return out
