"""Blockwise (flash) causal attention Pallas kernel for prefill / eval.

Replaces the naive ``[B, H, S, T]`` score materialization in
``models/llama._attention`` for long sequences — at seq 2048 the f32
score tensor is ~0.5 GB/layer of HBM round-trip; this kernel keeps the
online-softmax state in VMEM (the TPU-shaped equivalent of the
reference's prefill SDPA path, monkeypatch/ftllama_modeling.py:88-126).

Layout contract (chosen for TPU tiling: seq in sublanes, head_dim in
lanes):

* q: ``[B, Hq, S, d]``
* k/v: ``[B, Hkv, T, d]``  (T = S for eval, or the cache length for
  prefill-with-cache; only positions < offset + S are attended)
* output: ``[B, Hq, S, d]``

GQA maps q head ``h`` to kv head ``h // (Hq // Hkv)`` inside the index
maps — K/V are never materialized at Hq width.

Causality: query row ``i`` (absolute position ``offset + i``) attends
keys ``j <= offset + i``.  Fully-masked k-tiles are skipped (no compute;
their DMA is still issued by the pipeline), diagonal tiles apply an
element mask, and the output is normalized and written on each q-tile's
last *valid* k-tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(off_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scr, l_scr, acc_scr,
                  *, bq, bk, d, scale, causal, interpret):
    jk = pl.program_id(2)
    iq = pl.program_id(1)
    offset = off_ref[0]

    # first/last valid k-tile bookkeeping for this q-tile
    q_hi = offset + (iq + 1) * bq - 1          # highest absolute q position
    last_valid = jnp.minimum(pl.num_programs(2) - 1, q_hi // bk)
    valid = (jk <= last_valid) if causal else (jk == jk)

    @pl.when(jk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(valid)
    def _body():
        q = q_ref[0].astype(jnp.float32) * scale          # [bq, d]
        k = k_ref[0].astype(jnp.float32)                  # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [bq, bk]

        if causal:
            q_pos = (offset + iq * bq
                     + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0))
            k_pos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_prev = m_scr[:]                                 # [bq, 128] replicated
        row_max = jnp.max(s, axis=-1, keepdims=True)      # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(row_max, m_prev.shape))
        p = jnp.exp(s - m_new[:, :1])                     # [bq, bk]
        corr = jnp.exp(m_prev - m_new)                    # [bq, 128]
        l_new = corr * l_scr[:] + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), m_prev.shape)
        v = v_ref[0].astype(jnp.float32)                  # [bk, d]
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype).astype(jnp.float32), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [bq, d]
        acc_scr[:] = acc_scr[:] * corr[:, :d] + pv
        m_scr[:] = m_new
        l_scr[:] = l_new

    write_at = last_valid if causal else pl.num_programs(2) - 1

    @pl.when(jk == write_at)
    def _write():
        l = l_scr[:, :d]
        o_ref[0] = (acc_scr[:] / jnp.where(l == 0.0, 1.0, l)
                    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,                # [B, Hq, S, d]
    k: jnp.ndarray,                # [B, Hkv, T, d]
    v: jnp.ndarray,                # [B, Hkv, T, d]
    offset: Optional[jnp.ndarray] = None,  # scalar int32 (default 0)
    *,
    causal: bool = True,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Hq, S, d = q.shape
    _, Hkv, T, _ = k.shape
    G = Hq // Hkv
    bq = min(block_q, S)
    assert S % bq == 0, (S, bq)
    # Zero-pad T up to a k-tile multiple: pad keys score 0 and are then
    # causally masked (pad positions sit beyond offset + S - 1, the
    # highest query position — call sites guarantee offset + S <= T);
    # pad values then receive weight exp(-inf)=0.
    bk = min(block_k, -(-T // 64) * 64)
    pad_t = -T % bk
    if pad_t:
        assert causal, "non-causal flash requires T % bk == 0"
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        T += pad_t
    scale = 1.0 / (d ** 0.5)
    if offset is None:
        offset = jnp.int32(0)
    off = jnp.asarray(offset, jnp.int32).reshape(1)

    grid = (B * Hq, S // bq, T // bk)

    kernel = functools.partial(
        _flash_kernel, bq=bq, bk=bk, d=d, scale=scale, causal=causal,
        interpret=interpret)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d),
                         lambda bh, iq, jk, off: (bh, iq, 0)),
            pl.BlockSpec((1, bk, d),
                         lambda bh, iq, jk, off: (bh // G, jk, 0)),
            pl.BlockSpec((1, bk, d),
                         lambda bh, iq, jk, off: (bh // G, jk, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d),
                               lambda bh, iq, jk, off: (bh, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * Hq, S, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * S * T * d,
            bytes_accessed=(B * Hq * S * d * 2 * q.dtype.itemsize
                            + 2 * B * Hkv * T * d * k.dtype.itemsize),
            transcendentals=B * Hq * S * T,
        ),
        interpret=interpret,
    )(off, q.reshape(B * Hq, S, d), k.reshape(B * Hkv, T, d),
      v.reshape(B * Hkv, T, d))
    return out.reshape(B, Hq, S, d)


def flash_attention_reference(q, k, v, offset=None, causal=True):
    """Naive XLA reference (same layout) for parity tests."""
    B, Hq, S, d = q.shape
    _, Hkv, T, _ = k.shape
    G = Hq // Hkv
    if offset is None:
        offset = 0
    qg = q.reshape(B, Hkv, G, S, d).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    s = jnp.einsum("bkgsd,bktd->bkgst", qg, kf) / (d ** 0.5)
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0) + offset
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
        s = jnp.where((k_pos <= q_pos)[None, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgst,bktd->bkgsd", p, v.astype(jnp.float32))
    return o.reshape(B, Hq, S, d).astype(q.dtype)
