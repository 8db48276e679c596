"""Stacked-layer model: lax.scan over layers with per-layer bit switching.

Why this exists (TPU/axon facts measured on this backend):
* remote compilation rejects large programs (HTTP 413) — a 32-layer model
  unrolled in Python produces an HLO too big to ship; a ``lax.scan`` over
  stacked layer parameters keeps the program O(1) in depth,
* per-jit-call dispatch is ~25 ms over the tunnel — generation must run
  entirely on device (scan over steps), which requires the per-layer loop
  to be a scan as well.

Mixed precision: for every linear site the three per-bit packed stacks
(``[L, rows_b, N]``) are closed over as constants, and a per-layer int32
selector drives a ``lax.switch`` whose branches each dynamic-index *their
own* stack — XLA executes only the selected branch, so HBM traffic per
layer is exactly the selected bit-width.  Changing the architecture is a
new selector vector: no retrace, no re-stitch (cf. the reference's
per-layer module setattr, amq_speed_benchmark.py:233-251).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.quantize import QuantizedTensor
from .config import LINEAR_NAMES, ModelConfig
from .linear import QuantLinear, _KERNEL_IMPL  # noqa: F401 (impl read at trace)
from . import linear as linear_mod
from . import llama


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedQuant:
    """One linear site across all layers at one bit-width."""

    packed: jnp.ndarray  # [L, K*b/32, N]
    scale: jnp.ndarray   # [L, K/g, N]
    zero: jnp.ndarray    # [L, K/g, N]
    nbits: int = dataclasses.field(metadata=dict(static=True))
    group_size: int = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))  # (out, in)

    def layer(self, i) -> QuantizedTensor:
        return QuantizedTensor(
            packed=jax.lax.dynamic_index_in_dim(self.packed, i, 0, False),
            scale=jax.lax.dynamic_index_in_dim(self.scale, i, 0, False),
            zero=jax.lax.dynamic_index_in_dim(self.zero, i, 0, False),
            nbits=self.nbits, group_size=self.group_size, shape=self.shape)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedModel:
    """Whole decoder with stacked layers and per-layer bit selectors."""

    embed: jnp.ndarray
    final_norm: jnp.ndarray
    lm_head: Optional[jnp.ndarray]          # [vocab, H] or None (tied)
    input_norm: jnp.ndarray                 # [L, H]
    post_norm: jnp.ndarray                  # [L, H]
    sites: Dict[str, Tuple[StackedQuant, ...]]  # name -> per-bit stacks
    biases: Dict[str, Optional[jnp.ndarray]]    # name -> [L, out] or None
    select: Dict[str, jnp.ndarray]              # name -> [L] int32
    bits_range: tuple = dataclasses.field(metadata=dict(static=True))
    num_layers: int = dataclasses.field(metadata=dict(static=True))


def stack_proxies(proxies: Sequence[Dict[str, Any]],
                  bits_range: Sequence[int],
                  arch: Optional[Dict] = None) -> StackedModel:
    """Fold per-bit quantized pytrees (quantize_model outputs) into a
    StackedModel."""
    base = proxies[-1]
    L = len(base["layers"])

    sites: Dict[str, Tuple[StackedQuant, ...]] = {}
    biases: Dict[str, Optional[jnp.ndarray]] = {}
    select: Dict[str, jnp.ndarray] = {}
    for name in LINEAR_NAMES:
        stacks = []
        for p in proxies:
            qls = [p["layers"][i][name] for i in range(L)]
            q0 = qls[0].qt
            stacks.append(StackedQuant(
                packed=jnp.stack([q.qt.packed for q in qls]),
                scale=jnp.stack([q.qt.scale for q in qls]),
                zero=jnp.stack([q.qt.zero for q in qls]),
                nbits=q0.nbits, group_size=q0.group_size, shape=q0.shape))
        sites[name] = tuple(stacks)
        b0 = base["layers"][0][name].bias
        biases[name] = (None if b0 is None else
                        jnp.stack([base["layers"][i][name].bias
                                   for i in range(L)]))
        if arch is None:
            sel = [len(bits_range) - 1] * L
        else:
            sel = [list(bits_range).index(int(arch["linear"][name][i]))
                   for i in range(L)]
        select[name] = jnp.asarray(sel, jnp.int32)

    head = base.get("lm_head")
    return StackedModel(
        embed=base["embed"],
        final_norm=base["final_norm"],
        lm_head=None if head is None else head.weight,
        input_norm=jnp.stack([base["layers"][i]["input_norm"]
                              for i in range(L)]),
        post_norm=jnp.stack([base["layers"][i]["post_norm"]
                             for i in range(L)]),
        sites=sites, biases=biases, select=select,
        bits_range=tuple(bits_range), num_layers=L)


def set_arch(model: StackedModel, arch: Dict) -> StackedModel:
    """New selector vectors for ``arch`` — same treedef, no retrace."""
    select = {
        name: jnp.asarray([model.bits_range.index(int(b))
                           for b in arch["linear"][name]], jnp.int32)
        for name in LINEAR_NAMES
    }
    return dataclasses.replace(model, select=select)


def _apply_site(model: StackedModel, name: str, i, x, compute_dtype):
    """lax.switch over the per-bit stacks; only the chosen branch reads HBM."""
    impl = linear_mod._KERNEL_IMPL

    def make_branch(stack: StackedQuant):
        def br(x):
            qt = stack.layer(i)
            ql = QuantLinear(qt=qt, bias=None)
            if impl is not None:
                return impl(ql, x, compute_dtype)
            return linear_mod.apply_linear(ql, x, compute_dtype)
        return br

    y = jax.lax.switch(model.select[name][i],
                       [make_branch(s) for s in model.sites[name]], x)
    if model.biases[name] is not None:
        y = y + jax.lax.dynamic_index_in_dim(
            model.biases[name], i, 0, False).astype(y.dtype)
    return y


def forward_stacked(
    model: StackedModel,
    cfg: ModelConfig,
    tokens: jnp.ndarray,                       # [B, S]
    cache: Optional[llama.KVCache] = None,
    compute_dtype=jnp.bfloat16,
    tp_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, Optional[llama.KVCache]]:
    """Full forward as a lax.scan over layers (compile size O(1) in depth)."""
    B, S = tokens.shape
    hd = cfg.head_dim_
    x = model.embed[tokens].astype(compute_dtype)

    if cache is not None:
        offset = cache.length
        T = cache.k.shape[2]
    else:
        offset = jnp.int32(0)
        T = S
    positions = jnp.arange(S, dtype=jnp.int32)[None, :] + offset
    cos, sin = llama.rope_cos_sin(cfg, positions, dtype=compute_dtype)
    mask = llama._causal_mask(S, T, offset, cfg.sliding_window)

    def layer_fn(carry, i):
        x, k_all, v_all = carry
        h = llama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(model.input_norm, i, 0, False),
            cfg.rms_norm_eps)
        q = _apply_site(model, "self_attn.q_proj", i, h, compute_dtype)
        k = _apply_site(model, "self_attn.k_proj", i, h, compute_dtype)
        v = _apply_site(model, "self_attn.v_proj", i, h, compute_dtype)
        q = llama.apply_rope(q.reshape(B, S, cfg.num_heads, hd), cos, sin)
        k = llama.apply_rope(k.reshape(B, S, cfg.num_kv_heads, hd), cos, sin)
        v = v.reshape(B, S, cfg.num_kv_heads, hd)

        if k_all is not None:
            k_buf = jax.lax.dynamic_index_in_dim(k_all, i, 0, False)
            v_buf = jax.lax.dynamic_index_in_dim(v_all, i, 0, False)
            k_buf = jax.lax.dynamic_update_slice_in_dim(
                k_buf, k.astype(k_buf.dtype), offset, axis=1)
            v_buf = jax.lax.dynamic_update_slice_in_dim(
                v_buf, v.astype(v_buf.dtype), offset, axis=1)
            k_all = jax.lax.dynamic_update_index_in_dim(k_all, k_buf, i, 0)
            v_all = jax.lax.dynamic_update_index_in_dim(v_all, v_buf, i, 0)
            k_att = k_buf.astype(compute_dtype)
            v_att = v_buf.astype(compute_dtype)
        else:
            k_att, v_att = k, v

        att = llama._attention(q, k_att, v_att, mask, compute_dtype)
        att = att.reshape(B, S, cfg.num_heads * hd)
        o = _apply_site(model, "self_attn.o_proj", i, att, compute_dtype)
        if tp_axis is not None:
            o = jax.lax.psum(o, tp_axis)
        x = x + o

        h = llama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(model.post_norm, i, 0, False),
            cfg.rms_norm_eps)
        gate = _apply_site(model, "mlp.gate_proj", i, h, compute_dtype)
        up = _apply_site(model, "mlp.up_proj", i, h, compute_dtype)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(compute_dtype) * up
        down = _apply_site(model, "mlp.down_proj", i, act, compute_dtype)
        if tp_axis is not None:
            down = jax.lax.psum(down, tp_axis)
        x = x + down
        return (x, k_all, v_all), None

    k_all = cache.k if cache is not None else None
    v_all = cache.v if cache is not None else None
    (x, k_all, v_all), _ = jax.lax.scan(
        layer_fn, (x, k_all, v_all),
        jnp.arange(model.num_layers, dtype=jnp.int32))

    x = llama.rms_norm(x, model.final_norm, cfg.rms_norm_eps)
    head = model.lm_head if model.lm_head is not None else model.embed
    logits = jnp.dot(x, head.T.astype(compute_dtype),
                     preferred_element_type=jnp.float32)

    new_cache = None
    if cache is not None:
        new_cache = llama.KVCache(k=k_all, v=v_all, length=cache.length + S)
    return logits.astype(jnp.float32), new_cache
