"""Llama-family decoder (Llama-2/3/3.1, Mistral, Qwen2/2.5) in pure JAX.

Functional re-design of the HF torch modeling the reference evaluates
through (and of its FT-Llama rewrite, monkeypatch/ftllama_modeling.py):
params are a pytree, the forward is a pure function, the KV cache is an
explicit carry.  One implementation covers the whole family via
:class:`~amq_tpu.models.config.ModelConfig` flags (GQA, qkv_bias, sliding
window, rope scaling).

Two entry styles:
* ``forward(params, cfg, tokens)`` — teacher-forcing over a full sequence
  (the evaluation path: JSD loss / perplexity),
* ``forward(params, cfg, tokens, cache=..., positions=...)`` — incremental
  prefill/decode against a preallocated ring KV cache (the serving path,
  replacing FT's ``single_query_attention`` + start_pos threading).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import LINEAR_NAMES, ModelConfig
from .linear import DenseLinear, LinearParams, apply_linear


# ---------------------------------------------------------------------------
# KV cache

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Preallocated per-layer K/V buffers: ``[n_layers, B, n_kv, max_len, hd]``.

    Replaces the reference's persistent interleaved CUDA cache buffers
    (ftllama_modeling.py:61-68).  Layout puts head_dim in lanes and the
    sequence in sublanes *per head*, so each (batch, head) slice is a
    contiguous ``[T, hd]`` tile — what both the XLA decode attention and
    the blockwise flash kernel (ops/flash_attention.py) want to DMA.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # scalar int32: tokens currently valid

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim_)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# building blocks

def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight.astype(x.dtype)


def _llama3_scale_freqs(freqs: jnp.ndarray) -> jnp.ndarray:
    """Llama-3.1 rope frequency rescaling (HF rope_scaling type='llama3')."""
    factor, low, high, orig = 8.0, 1.0, 4.0, 8192.0
    wavelen = 2.0 * jnp.pi / freqs
    low_wl = orig / low
    high_wl = orig / high
    smooth = (orig / wavelen - low) / (high - low)
    scaled = jnp.where(
        wavelen > low_wl, freqs / factor,
        jnp.where(wavelen < high_wl, freqs,
                  (1 - smooth) * freqs / factor + smooth * freqs))
    return scaled


def rope_cos_sin(cfg: ModelConfig, positions: jnp.ndarray,
                 dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables ``[..., head_dim]`` (HF half-rotation convention)."""
    hd = cfg.head_dim_
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    if cfg.rope_scaling_llama3:
        inv_freq = _llama3_scale_freqs(inv_freq)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., hd/2]
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, H, hd]; cos/sin: [B?, S, hd] -> broadcast over heads."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[..., None, :] if cos.ndim == x.ndim - 1 else cos
    s = sin[..., None, :] if sin.ndim == x.ndim - 1 else sin
    return (x * c + rotated * s).astype(x.dtype)


def _attention(q, k, v, mask, compute_dtype):
    """q: [B,S,Hq,hd], k/v: [B,Hkv,T,hd], mask: [B?,1,S,T] additive.

    GQA is a grouped einsum over [Hkv, G] — K/V are never materialized at
    Hq width (a ``jnp.repeat`` would stream the expanded KV through HBM
    exactly where decode is bandwidth-bound).
    """
    B, S, Hq, hd = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, S, Hkv, G, hd)
    if jax.default_backend() == "cpu":
        # the CPU dot thunk has no bf16 x bf16 -> f32 path for this
        # grouped contraction (hit under shard_map); MXU does natively
        qg, k, v = (t.astype(jnp.float32) for t in (qg, k, v))
    scores = jnp.einsum("bskgd,bktd->bkgst", qg, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(hd)) + mask[:, :, None]
    probs = jax.nn.softmax(scores, axis=-1).astype(k.dtype)
    out = jnp.einsum("bkgst,bktd->bskgd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, S, Hq, hd).astype(compute_dtype)


def _attention_split(q, k_c, v_c, k_new, v_new, offset,
                     sliding_window, compute_dtype):
    """Incremental attention WITHOUT materializing the updated cache.

    q: [B,S,Hq,hd]; k_c/v_c: [B,Hkv,T,hd] cache buffers (positions
    ``< offset`` valid); k_new/v_new: [B,Hkv,S,hd] this step's keys.
    ``offset`` is a scalar, or per-row ``[B]`` (slot-batched decode).

    Scores over the cache and over the new keys are computed separately
    and softmaxed jointly — identical math to dynamic-update-slice-then-
    attend, but the [B,Hkv,T,hd] buffer round trip (slice out, update,
    write back: ~3x the attention's own HBM traffic per layer at decode)
    never happens; callers append the new KV once, outside the layer scan.
    """
    B, S, Hq, hd = q.shape
    Hkv = k_c.shape[1]
    G = Hq // Hkv
    T = k_c.shape[2]
    qg = q.reshape(B, S, Hkv, G, hd)
    if jax.default_backend() == "cpu":
        qg, k_c, v_c, k_new, v_new = (
            t.astype(jnp.float32) for t in (qg, k_c, v_c, k_new, v_new))
    sc = jnp.einsum("bskgd,bktd->bkgst", qg, k_c,
                    preferred_element_type=jnp.float32)
    sn = jnp.einsum("bskgd,bkud->bkgsu", qg, k_new.astype(qg.dtype),
                    preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(jnp.float32(hd))

    off = jnp.asarray(offset, jnp.int32).reshape(-1)              # [1] or [B]
    s_ids = jnp.arange(S, dtype=jnp.int32)
    k_pos = jnp.arange(T, dtype=jnp.int32)
    q_pos = off[:, None] + s_ids[None, :]                         # [b, S]
    ok_c = k_pos[None, None, :] < off[:, None, None]              # [b, 1, T]
    ok_n = (s_ids[None, None, :] <= s_ids[None, :, None])         # [1, S, S]
    if sliding_window is not None:
        ok_c = jnp.logical_and(
            ok_c, k_pos[None, None, :] > q_pos[:, :, None] - sliding_window)
        ok_n = jnp.logical_and(
            ok_n, (off[:, None, None] + s_ids[None, None, :])
            > q_pos[:, :, None] - sliding_window)
    neg = jnp.float32(-1e30)
    mask_c = jnp.where(ok_c, 0.0, neg)[:, None, None]     # [b,1,1,S|1,T]
    mask_n = jnp.where(ok_n, 0.0, neg)[:, None, None]
    scores = jnp.concatenate(
        [sc * inv + mask_c, sn * inv + mask_n], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1).astype(k_c.dtype)
    out = (jnp.einsum("bkgst,bktd->bskgd", probs[..., :T], v_c,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bkgsu,bkud->bskgd", probs[..., T:],
                        v_new.astype(v_c.dtype),
                        preferred_element_type=jnp.float32))
    return out.reshape(B, S, Hq, hd).astype(compute_dtype)


def attention_append(q, k_c, v_c, k_new, v_new, offset, S: int, T: int,
                     cfg: ModelConfig, compute_dtype):
    """Cache attention against (cache, appended keys) — see _attention_split.

    The flash-kernel regime (long prefill) materializes the updated buffer
    locally (its cost amortizes over S tokens) and runs the blockwise
    kernel; everywhere else the split path avoids the buffer round trip.
    """
    if _flash_ok(S, T, cfg):
        k_buf = jax.lax.dynamic_update_slice_in_dim(
            k_c, k_new.astype(k_c.dtype), offset, axis=2)
        v_buf = jax.lax.dynamic_update_slice_in_dim(
            v_c, v_new.astype(v_c.dtype), offset, axis=2)
        # unaligned T is zero-padded to the k-tile inside flash_attention
        # (pads are causally masked: they sit beyond offset + S - 1)
        from ..ops.flash_attention import flash_attention
        qt = jnp.transpose(q, (0, 2, 1, 3))          # [B,Hq,S,d]
        out = flash_attention(qt, k_buf.astype(compute_dtype),
                              v_buf.astype(compute_dtype), offset)
        return jnp.transpose(out, (0, 2, 1, 3)).astype(compute_dtype)
    return _attention_split(q, k_c, v_c, k_new, v_new, offset,
                            cfg.sliding_window, compute_dtype)


def _flash_ok(S: int, T: int, cfg: ModelConfig) -> bool:
    """Use the blockwise Pallas attention? (trace-time decision)

    Flash covers the prefill/eval regime: long-enough S on a TPU backend,
    pure causal(+offset) masking.  Decode (tiny S) stays on the einsum
    path, as does CPU (no Mosaic) and a sliding window actually in range.
    """
    import os
    if os.environ.get("AMQ_FLASH", "1") == "0":
        return False
    # T needs no alignment: the flash call sites zero-pad the key/value
    # buffers to the kernel's 64-tile (pads are causally masked)
    if S < 128 or S % 64:
        return False
    if cfg.sliding_window is not None and T > cfg.sliding_window:
        return False
    return jax.default_backend() not in ("cpu",)


def attention(q, k, v, mask, offset, S: int, T: int, cfg: ModelConfig,
              compute_dtype):
    """Dispatch between the flash kernel and the einsum fallback.

    q: [B,S,Hq,hd]; k/v: [B,Hkv,T,hd]; returns [B,S,Hq,hd].
    """
    if _flash_ok(S, T, cfg):
        from ..ops.flash_attention import flash_attention
        qt = jnp.transpose(q, (0, 2, 1, 3))          # [B,Hq,S,d]
        out = flash_attention(qt, k, v, offset)
        return jnp.transpose(out, (0, 2, 1, 3)).astype(compute_dtype)
    return _attention(q, k, v, mask, compute_dtype)


def _causal_mask(S: int, T: int, offset: jnp.ndarray,
                 sliding_window: Optional[int]) -> jnp.ndarray:
    """Additive mask [1,1,S,T]; query i attends keys j with j <= i+offset."""
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0) + offset
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
    ok = k_pos <= q_pos
    if sliding_window is not None:
        ok = jnp.logical_and(ok, k_pos > q_pos - sliding_window)
    return jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[None, None]


# ---------------------------------------------------------------------------
# forward

def decoder_layer(layer: Dict[str, Any], cfg: ModelConfig, x: jnp.ndarray,
                  cos, sin, mask, compute_dtype,
                  cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                  cache_pos: Optional[jnp.ndarray] = None,
                  captures: Optional[Dict[str, jnp.ndarray]] = None,
                  tp_axis: Optional[str] = None):
    """One decoder block.  Returns (x, (k_cache, v_cache) or None).

    If ``captures`` is a dict it is filled with the *input* activations of
    each linear site — the functional equivalent of the reference's forward
    hooks used by GPTQ Hessian accumulation (quantization/gptq.py:123-135)
    and AWQ input-feature caching (awq_utils/pre_quant.py:147-167).

    ``tp_axis`` enables Megatron-style tensor parallelism inside
    ``shard_map``: q/k/v/gate/up are column-parallel (local heads /
    intermediate slice), o/down are row-parallel and their partial outputs
    are ``psum``-reduced over the axis.
    """
    h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
    if captures is not None:
        captures["self_attn.q_proj"] = h
        captures["self_attn.k_proj"] = h
        captures["self_attn.v_proj"] = h
    att, new_kv, att_in = attn_block(layer, cfg, h, cos, sin, mask,
                                     compute_dtype, cache_kv, cache_pos)
    if captures is not None:
        captures["self_attn.o_proj"] = att_in
    if tp_axis is not None:
        att = jax.lax.psum(att, tp_axis)
    x = x + att

    h = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
    if captures is not None:
        captures["mlp.gate_proj"] = h
        captures["mlp.up_proj"] = h
    out, act = mlp_block(layer, h, compute_dtype)
    if captures is not None:
        captures["mlp.down_proj"] = act
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    x = x + out
    return x, new_kv


def attn_block(layer: Dict[str, Any], cfg: ModelConfig, h: jnp.ndarray,
               cos, sin, mask, compute_dtype,
               cache_kv=None, cache_pos=None):
    """Attention sub-block on the *normed* input ``h``.

    Returns (o_proj output, new kv, o_proj input) — the last is what AWQ's
    clip search needs (awq_utils/pre_quant.py:147-167).
    """
    B, S, _ = h.shape
    hd = cfg.head_dim_
    q = apply_linear(layer["self_attn.q_proj"], h, compute_dtype)
    k = apply_linear(layer["self_attn.k_proj"], h, compute_dtype)
    v = apply_linear(layer["self_attn.v_proj"], h, compute_dtype)
    q = q.reshape(B, S, cfg.num_heads, hd)
    k = k.reshape(B, S, cfg.num_kv_heads, hd)
    v = v.reshape(B, S, cfg.num_kv_heads, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    k = jnp.transpose(k, (0, 2, 1, 3))   # [B, Hkv, S, hd]
    v = jnp.transpose(v, (0, 2, 1, 3))

    new_kv = None
    if cache_kv is not None:
        k_buf, v_buf = cache_kv  # [B, n_kv, max_len, hd]
        k_buf = jax.lax.dynamic_update_slice_in_dim(
            k_buf, k.astype(k_buf.dtype), cache_pos, axis=2)
        v_buf = jax.lax.dynamic_update_slice_in_dim(
            v_buf, v.astype(v_buf.dtype), cache_pos, axis=2)
        new_kv = (k_buf, v_buf)
        k_att, v_att = k_buf.astype(compute_dtype), v_buf.astype(compute_dtype)
    else:
        k_att, v_att = k, v

    T = k_att.shape[2]
    offset = cache_pos if cache_pos is not None else jnp.int32(0)
    att = attention(q, k_att, v_att, mask, offset, S, T, cfg, compute_dtype)
    att = att.reshape(B, S, cfg.num_heads * hd)
    out = apply_linear(layer["self_attn.o_proj"], att, compute_dtype)
    return out, new_kv, att


def mlp_block(layer: Dict[str, Any], h: jnp.ndarray, compute_dtype):
    """SwiGLU MLP on the normed input; returns (output, down_proj input)."""
    gate = apply_linear(layer["mlp.gate_proj"], h, compute_dtype)
    up = apply_linear(layer["mlp.up_proj"], h, compute_dtype)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(compute_dtype) * up
    return apply_linear(layer["mlp.down_proj"], act, compute_dtype), act


def forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    tokens: jnp.ndarray,                 # [B, S] int32
    cache: Optional[KVCache] = None,
    positions: Optional[jnp.ndarray] = None,  # [B, S] or [S]
    compute_dtype=jnp.float32,
    tp_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Returns (logits [B, S, vocab] float32, updated cache or None)."""
    B, S = tokens.shape
    x = params["embed"][tokens].astype(compute_dtype)

    if cache is not None:
        offset = cache.length
        T = cache.k.shape[3]
    else:
        offset = jnp.int32(0)
        T = S
    if positions is None:
        positions = jnp.arange(S, dtype=jnp.int32)[None, :] + offset
    cos, sin = rope_cos_sin(cfg, positions, dtype=compute_dtype)
    mask = _causal_mask(S, T, offset, cfg.sliding_window)

    new_k, new_v = [], []
    for idx, layer in enumerate(params["layers"]):
        ck = (cache.k[idx], cache.v[idx]) if cache is not None else None
        x, kv = decoder_layer(layer, cfg, x, cos, sin, mask, compute_dtype,
                              cache_kv=ck,
                              cache_pos=offset if cache is not None else None,
                              tp_axis=tp_axis)
        if kv is not None:
            new_k.append(kv[0])
            new_v.append(kv[1])

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:  # tied embeddings
        logits = jnp.dot(x, params["embed"].T.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
    else:
        logits = apply_linear(head, x, compute_dtype).astype(jnp.float32)

    new_cache = None
    if cache is not None:
        new_cache = KVCache(k=jnp.stack(new_k), v=jnp.stack(new_v),
                            length=cache.length + S)
    return logits.astype(jnp.float32), new_cache


# ---------------------------------------------------------------------------
# dense scan-over-layers forward
#
# The unrolled ``forward`` above emits O(depth) HLO; the axon remote
# compiler rejects programs that large at 7B+ (HTTP 413).  The dense FP16
# logit cache / final-mode PPL (the role of the reference's
# evaluation/evaluator.py:46-52 dense pass) therefore needs the same
# scan-over-stacked-layers structure the quantized paths already use.

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseStacked:
    """Dense decoder with all per-layer params stacked on a leading L dim."""

    embed: jnp.ndarray
    final_norm: jnp.ndarray
    lm_head: Optional[jnp.ndarray]            # [vocab, H] or None (tied)
    input_norm: jnp.ndarray                   # [L, H]
    post_norm: jnp.ndarray                    # [L, H]
    weights: Dict[str, jnp.ndarray]           # name -> [L, out, in]
    biases: Dict[str, Optional[jnp.ndarray]]  # name -> [L, out] or None
    num_layers: int = dataclasses.field(metadata=dict(static=True))


def stack_dense(params: Dict[str, Any], lo: int = 0,
                hi: Optional[int] = None) -> DenseStacked:
    """Fold an init_params/load_hf_params pytree into a DenseStacked.

    ``lo:hi`` selects a contiguous layer chunk (the Evaluator's dense
    logit-cache pass stages the 7B+ model onto the chip one chunk at a
    time — the full bf16 stack alone nearly fills a 16 GB chip)."""
    layers = params["layers"][lo:hi]
    L = len(layers)
    weights = {name: jnp.stack([layers[i][name].weight for i in range(L)])
               for name in LINEAR_NAMES}
    biases = {}
    for name in LINEAR_NAMES:
        b0 = layers[0][name].bias
        biases[name] = (None if b0 is None else
                        jnp.stack([layers[i][name].bias for i in range(L)]))
    head = params.get("lm_head")
    return DenseStacked(
        embed=params["embed"], final_norm=params["final_norm"],
        lm_head=None if head is None else head.weight,
        input_norm=jnp.stack([layers[i]["input_norm"] for i in range(L)]),
        post_norm=jnp.stack([layers[i]["post_norm"] for i in range(L)]),
        weights=weights, biases=biases, num_layers=L)


def forward_dense_chunk(
    model: DenseStacked,                 # a stack_dense(params, lo, hi) chunk
    cfg: ModelConfig,
    x: jnp.ndarray,                      # [B, S, H] activations entering lo
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Layer scan only (no embed / final norm / head) over a dense chunk.

    Full-sequence causal attention at offset 0 — the dense logit-cache
    pass (Evaluator) runs the 7B+ model through the chip one layer chunk
    at a time; chaining chunks reproduces forward_dense exactly."""
    B, S, _ = x.shape
    hd = cfg.head_dim_
    positions = jnp.arange(S, dtype=jnp.int32)[None, :]
    cos, sin = rope_cos_sin(cfg, positions, dtype=compute_dtype)
    mask = _causal_mask(S, S, jnp.int32(0), cfg.sliding_window)

    def proj(w, b, h):
        y = jnp.dot(h.astype(compute_dtype), w.T.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(compute_dtype)

    def layer_fn(x, xs):
        lw, lb = xs["w"], xs["b"]
        h = rms_norm(x, xs["input_norm"], cfg.rms_norm_eps)
        q = proj(lw["self_attn.q_proj"], lb.get("self_attn.q_proj"), h)
        k = proj(lw["self_attn.k_proj"], lb.get("self_attn.k_proj"), h)
        v = proj(lw["self_attn.v_proj"], lb.get("self_attn.v_proj"), h)
        q = apply_rope(q.reshape(B, S, cfg.num_heads, hd), cos, sin)
        k = apply_rope(k.reshape(B, S, cfg.num_kv_heads, hd), cos, sin)
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v.reshape(B, S, cfg.num_kv_heads, hd), (0, 2, 1, 3))
        att = attention(q, k, v, mask, jnp.int32(0), S, S, cfg,
                        compute_dtype)
        att = att.reshape(B, S, cfg.num_heads * hd)
        x = x + proj(lw["self_attn.o_proj"], lb.get("self_attn.o_proj"), att)
        h = rms_norm(x, xs["post_norm"], cfg.rms_norm_eps)
        gate = proj(lw["mlp.gate_proj"], lb.get("mlp.gate_proj"), h)
        up = proj(lw["mlp.up_proj"], lb.get("mlp.up_proj"), h)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(compute_dtype) * up
        x = x + proj(lw["mlp.down_proj"], lb.get("mlp.down_proj"), act)
        return x, None

    xs = {
        "w": model.weights,
        "b": {n: b for n, b in model.biases.items() if b is not None},
        "input_norm": model.input_norm,
        "post_norm": model.post_norm,
    }
    x, _ = jax.lax.scan(layer_fn, x, xs)
    return x


def forward_dense(
    model: DenseStacked,
    cfg: ModelConfig,
    tokens: jnp.ndarray,                 # [B, S]
    cache: Optional[KVCache] = None,
    compute_dtype=jnp.float32,
    logits_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Dense forward as a lax.scan over stacked layers (O(1) program size).

    Numerics match ``forward`` exactly (same blocks, same dtypes); only the
    loop structure differs.  Per-layer weights ride the scan as xs so XLA
    streams one layer's params at a time.
    """
    B, S = tokens.shape
    hd = cfg.head_dim_
    x = model.embed[tokens].astype(compute_dtype)

    if cache is not None:
        offset = cache.length
        T = cache.k.shape[3]
    else:
        offset = jnp.int32(0)
        T = S
    positions = jnp.arange(S, dtype=jnp.int32)[None, :] + offset
    cos, sin = rope_cos_sin(cfg, positions, dtype=compute_dtype)
    mask = _causal_mask(S, T, offset, cfg.sliding_window)
    has_cache = cache is not None

    def proj(w, b, h):
        y = jnp.dot(h.astype(compute_dtype), w.T.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(compute_dtype)

    def layer_fn(x, xs):
        lw = xs["w"]
        lb = xs["b"]
        k_buf = xs.get("k")
        v_buf = xs.get("v")
        h = rms_norm(x, xs["input_norm"], cfg.rms_norm_eps)
        q = proj(lw["self_attn.q_proj"], lb.get("self_attn.q_proj"), h)
        k = proj(lw["self_attn.k_proj"], lb.get("self_attn.k_proj"), h)
        v = proj(lw["self_attn.v_proj"], lb.get("self_attn.v_proj"), h)
        q = apply_rope(q.reshape(B, S, cfg.num_heads, hd), cos, sin)
        k = apply_rope(k.reshape(B, S, cfg.num_kv_heads, hd), cos, sin)
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v.reshape(B, S, cfg.num_kv_heads, hd), (0, 2, 1, 3))
        if has_cache:
            k_buf = jax.lax.dynamic_update_slice_in_dim(
                k_buf, k.astype(k_buf.dtype), offset, axis=2)
            v_buf = jax.lax.dynamic_update_slice_in_dim(
                v_buf, v.astype(v_buf.dtype), offset, axis=2)
            k_att = k_buf.astype(compute_dtype)
            v_att = v_buf.astype(compute_dtype)
        else:
            k_att, v_att = k, v
        att = attention(q, k_att, v_att, mask, offset, S, k_att.shape[2],
                        cfg, compute_dtype)
        att = att.reshape(B, S, cfg.num_heads * hd)
        x = x + proj(lw["self_attn.o_proj"], lb.get("self_attn.o_proj"), att)

        h = rms_norm(x, xs["post_norm"], cfg.rms_norm_eps)
        gate = proj(lw["mlp.gate_proj"], lb.get("mlp.gate_proj"), h)
        up = proj(lw["mlp.up_proj"], lb.get("mlp.up_proj"), h)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(compute_dtype) * up
        x = x + proj(lw["mlp.down_proj"], lb.get("mlp.down_proj"), act)
        ys = (k_buf, v_buf) if has_cache else None
        return x, ys

    xs = {
        "w": model.weights,
        "b": {n: b for n, b in model.biases.items() if b is not None},
        "input_norm": model.input_norm,
        "post_norm": model.post_norm,
    }
    if has_cache:
        xs["k"] = cache.k
        xs["v"] = cache.v
    x, ys = jax.lax.scan(layer_fn, x, xs)

    x = rms_norm(x, model.final_norm, cfg.rms_norm_eps)
    head = model.lm_head if model.lm_head is not None else model.embed
    # logits_dtype=bfloat16 keeps the [B,S,V] buffer half-size (the cast
    # fuses into the head matmul) — needed for the 7B dense logit-cache
    # pass to fit next to the 13.5 GB bf16 dense stack on one chip
    logits = jnp.dot(x, head.T.astype(compute_dtype),
                     preferred_element_type=jnp.float32)

    new_cache = None
    if has_cache:
        new_cache = KVCache(k=ys[0], v=ys[1], length=cache.length + S)
    return logits.astype(logits_dtype), new_cache


# ---------------------------------------------------------------------------
# parameter init / conversion

def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Random params (for tests/benches — no-network environment)."""
    keys = iter(jax.random.split(key, 4 + cfg.num_layers * len(LINEAR_NAMES)))
    h = cfg.hidden_size

    def dense(shape):
        fan_in = shape[-1]
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * (1.0 / jnp.sqrt(fan_in))).astype(dtype)

    layers: List[Dict[str, Any]] = []
    for _ in range(cfg.num_layers):
        layer: Dict[str, Any] = {
            "input_norm": jnp.ones((h,), dtype),
            "post_norm": jnp.ones((h,), dtype),
        }
        for name in LINEAR_NAMES:
            out_f, in_f = cfg.linear_shape(name)
            bias = None
            if cfg.qkv_bias and name in ("self_attn.q_proj", "self_attn.k_proj",
                                         "self_attn.v_proj"):
                bias = jnp.zeros((out_f,), dtype)
            layer[name] = DenseLinear(weight=dense((out_f, in_f)), bias=bias)
        layers.append(layer)

    params: Dict[str, Any] = {
        "embed": dense((cfg.vocab_size, h)),
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = DenseLinear(weight=dense((cfg.vocab_size, h)))
    return params
