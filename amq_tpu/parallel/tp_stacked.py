"""Tensor parallelism for the STACKED scan-serving model.

``parallel/tp.py`` shards the unrolled per-layer pytree — the eval-style
model.  The serving model (models/stacked.py: lax.scan over ``[L, ...]``
per-bit stacks + Pallas indexed kernels) is the only shape that ships at
7B+ on this backend, so the BASELINE "70B-class across hosts" serving
contract (SURVEY §2.7 TPU-equivalent: sharded packed weights + KV on
heads *in the serving model*) needs TP here, not there.

Design (Megatron-style SPMD, shard_map over a mesh 'tensor' axis):

* every shard holds a complete LOCAL :class:`StackedModel`; the global
  arrays carry a leading ``[tp]`` axis sharded on 'tensor', so inside
  ``shard_map`` a shard squeezes axis 0 and runs the *unmodified*
  ``scan_layers`` (same lax.scan, same per-layer ``lax.switch``, same
  scalar-prefetch Pallas kernels) on its slice,
* q/k/v and gate/up are column-parallel — shard-local lane slices, cut at
  head / quant-group boundaries; o/down are row-parallel — shard-local
  packed-row slices, repacked per shard with a local superblock — and
  their partial outputs ``psum`` over 'tensor' (the hooks already exist:
  ``scan_layers(tp_axis=...)``),
* uneven splits (Llama-2-7B intermediate 11008 = 86 groups over tp=4)
  are equalized by zero-SCALE padding: every shard owns
  ``ceil(G/tp)`` groups, phantom groups dequantize to exactly 0 and the
  matching gate/up pad lanes output 0 — numerics are unaffected,
* the KV cache shards on the kv-head axis (attention fully local), the
  batch axis optionally shards on a 'data' mesh axis,
* the quantized lm_head shards on the vocab (lane) axis; shards compute
  ``[B, ceil(V/tp)]`` logits and ``all_gather`` reassembles — the dense
  bf16 head stays replicated (head FLOPs then replicate too; serve with
  ``head_bits`` to shard them).

Reference contract: same archs -> same losses regardless of process
count (amq/utils/func.py:68-98, evaluation data-parallel only); block
placement (func.py:79-98) is superseded by true TP with ICI collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import bitpack
from ..core.quantize import QuantizedTensor
from ..models import llama
from ..models.config import LINEAR_NAMES, ModelConfig
from ..models.linear import QuantLinear
from ..models.stacked import (StackedModel, apply_head, merge_containers,
                              quantize_head, scan_layers, stack_proxies)

COLUMN_PARALLEL = ("self_attn.q_proj", "self_attn.k_proj",
                   "self_attn.v_proj", "mlp.gate_proj", "mlp.up_proj")
ROW_PARALLEL = ("self_attn.o_proj", "mlp.down_proj")


# ---------------------------------------------------------------------------
# shard geometry

def _even_split(n: int, tp: int, s: int):
    """(start, length) of shard ``s`` for an exactly divisible axis."""
    assert n % tp == 0, (n, tp)
    return s * (n // tp), n // tp


def _group_split(n_groups: int, tp: int, s: int):
    """(start_group, real_groups, max_groups) for a group-granular axis.

    First ``n_groups % tp`` shards own one extra group; every shard is
    padded (zero-scale) up to ``max_groups`` so shapes agree across the
    'tensor' axis.
    """
    base, rem = divmod(n_groups, tp)
    start = s * base + min(s, rem)
    real = base + (1 if s < rem else 0)
    return start, real, base + (1 if rem else 0)


def local_stacked_config(cfg: ModelConfig, tp: int,
                         group_size: int = 128) -> ModelConfig:
    """Per-shard model config for the TP stacked model."""
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0, (
        cfg.num_heads, cfg.num_kv_heads, tp)
    assert (cfg.num_heads // tp * cfg.head_dim_) % group_size == 0, (
        "o_proj K shard must own whole quantization groups",
        cfg.num_heads, cfg.head_dim_, tp, group_size)
    _, _, g_max = _group_split(cfg.intermediate_size // group_size, tp, 0)
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=g_max * group_size,
        head_dim=cfg.head_dim_,
        name=cfg.name + f"-tp{tp}",
    )


# ---------------------------------------------------------------------------
# QuantizedTensor shard slicing

def _slice_qt_lanes(qt: QuantizedTensor, lo: int, n_real: int,
                    n_out: int) -> QuantizedTensor:
    """Column-parallel shard: lanes ``[lo, lo+n_real)`` zero-padded to
    ``n_out``.  Lane slicing never crosses the packed-K layout; pad lanes
    get scale 0 so they dequantize (and therefore output) exactly 0."""
    pad = ((0, 0), (0, n_out - n_real))
    return dataclasses.replace(
        qt,
        packed=jnp.pad(qt.packed[:, lo:lo + n_real], pad),
        scale=jnp.pad(qt.scale[:, lo:lo + n_real], pad),
        zero=jnp.pad(qt.zero[:, lo:lo + n_real], pad),
        shape=(n_out, qt.shape[1]))


def _slice_qt_rows(qt: QuantizedTensor, g0: int, g_real: int,
                   g_out: int) -> QuantizedTensor:
    """Row-parallel shard: quantization groups ``[g0, g0+g_real)`` of the
    K axis, zero-scale-padded to ``g_out`` groups, repacked with a local
    superblock (the planar packing block = the kernel K-tile, so packed
    rows cannot simply be sliced at group granularity)."""
    g = qt.group_size
    codes = bitpack.unpack(qt.packed, qt.nbits, qt.superblock_)
    codes = codes[g0 * g:(g0 + g_real) * g]
    k_loc = g_out * g
    sb, k_pad = bitpack.pick_superblock_padded(k_loc, g)
    codes = jnp.pad(codes, ((0, k_loc + k_pad - codes.shape[0]), (0, 0)))
    meta_pad = ((0, g_out + k_pad // g - g_real), (0, 0))
    return dataclasses.replace(
        qt,
        packed=bitpack.pack(codes, qt.nbits, sb),
        scale=jnp.pad(qt.scale[g0:g0 + g_real], meta_pad),
        zero=jnp.pad(qt.zero[g0:g0 + g_real], meta_pad),
        shape=(qt.shape[0], k_loc),
        superblock=sb)


def shard_proxy(proxy: Dict[str, Any], cfg: ModelConfig, tp: int, s: int,
                group_size: int = 128) -> Dict[str, Any]:
    """Shard ``s``'s slice of one per-bit quantized proxy pytree.

    Cut points: q/o at query-head boundaries, k/v at kv-head boundaries,
    gate/up/down at the SAME intermediate quant-group boundaries (so the
    row-parallel down_proj owns whole groups and its K slice matches the
    column-parallel gate/up lane slices).
    """
    hd = cfg.head_dim_
    g = group_size
    gi0, gi_real, gi_max = _group_split(cfg.intermediate_size // g, tp, s)
    i_loc = gi_max * g

    def slice_linear(name: str, ql: QuantLinear) -> QuantLinear:
        assert isinstance(ql, QuantLinear), (name, type(ql))
        if name in ("self_attn.q_proj", "self_attn.k_proj",
                    "self_attn.v_proj"):
            heads = (cfg.num_heads if name.endswith("q_proj")
                     else cfg.num_kv_heads)
            h0, h_n = _even_split(heads, tp, s)
            qt = _slice_qt_lanes(ql.qt, h0 * hd, h_n * hd, h_n * hd)
            bias = (None if ql.bias is None
                    else ql.bias[h0 * hd:(h0 + h_n) * hd])
            return QuantLinear(qt=qt, bias=bias)
        if name in ("mlp.gate_proj", "mlp.up_proj"):
            assert ql.bias is None, "row-parallel mate must be bias-free"
            qt = _slice_qt_lanes(ql.qt, gi0 * g, gi_real * g, i_loc)
            return QuantLinear(qt=qt, bias=None)
        if name == "self_attn.o_proj":
            assert ql.bias is None, (
                "row-parallel bias would be psum-multiplied")
            kh0, kh_n = _even_split(cfg.num_heads, tp, s)
            assert (kh_n * hd) % g == 0, (kh_n, hd, g)
            qt = _slice_qt_rows(ql.qt, kh0 * hd // g, kh_n * hd // g,
                                kh_n * hd // g)
            return QuantLinear(qt=qt, bias=None)
        assert name == "mlp.down_proj", name
        assert ql.bias is None, "row-parallel bias would be psum-multiplied"
        qt = _slice_qt_rows(ql.qt, gi0, gi_real, gi_max)
        return QuantLinear(qt=qt, bias=None)

    out = {k: v for k, v in proxy.items() if k != "layers"}
    out["layers"] = [
        {**{k: v for k, v in layer.items() if k not in LINEAR_NAMES},
         **{name: slice_linear(name, layer[name]) for name in LINEAR_NAMES}}
        for layer in proxy["layers"]]
    return out


# ---------------------------------------------------------------------------
# TP stacked-model assembly

def stack_proxies_tp(
    proxies: Sequence[Any],
    bits_range: Sequence[int],
    cfg: ModelConfig,
    tp: int,
    *,
    arch: Optional[Dict] = None,
    fuse: str = "auto",
    container_bits: Optional[Dict[int, int]] = None,
    head_bits: Optional[int] = None,
    merge: bool = False,
    group_size: int = 128,
    mesh: Optional[Mesh] = None,
) -> StackedModel:
    """Build the TP-sharded stacked serving model.

    Returns a :class:`StackedModel` whose every array leaf carries a
    leading ``[tp]`` shard axis (static fields describe the LOCAL shard);
    with ``mesh`` given, leaves are device_put with the leading axis on
    'tensor'.  ``proxies`` elements may be zero-arg factories (one per-bit
    proxy resident at a time, as in :func:`stack_proxies`).

    ``merge=True`` applies :func:`merge_containers` per shard (requires a
    layer-uniform ``arch``).  ``head_bits`` quantizes AND vocab-shards the
    lm_head: each shard serves ``ceil(V/tp)`` vocab lanes and the forward
    all_gathers logits (see :func:`make_tp_forward_stacked`).
    """
    v_loc = -(-cfg.vocab_size // tp)
    shards = []
    for s in range(tp):
        sliced = [
            (lambda p=p, s=s: shard_proxy(p() if callable(p) else p, cfg,
                                          tp, s, group_size))
            for p in proxies]
        m = stack_proxies(sliced, bits_range, arch=arch, fuse=fuse,
                          container_bits=container_bits, head_bits=None)
        if merge:
            m = merge_containers(m)
        if head_bits is not None:
            head_w = m.lm_head if m.lm_head is not None else m.embed
            head_pad = jnp.pad(
                head_w[s * v_loc:(s + 1) * v_loc],
                ((0, v_loc - max(0, min(v_loc, head_w.shape[0] - s * v_loc))),
                 (0, 0)))
            m = dataclasses.replace(
                m, lm_head=None,
                lm_head_qt=quantize_head(head_pad, nbits=head_bits))
        shards.append(m)

    model = jax.tree.map(lambda *xs: jnp.stack(xs), *shards)
    if mesh is not None:
        model = jax.device_put(model, jax.tree.map(
            lambda s: NamedSharding(mesh, s), tp_specs(model),
            is_leaf=lambda x: isinstance(x, P)))
    return model


def tp_specs(model: StackedModel) -> StackedModel:
    """PartitionSpec pytree: leading shard axis on 'tensor' everywhere."""
    return jax.tree.map(
        lambda x: P("tensor", *([None] * (x.ndim - 1))), model)


def _local(tree):
    """Squeeze the leading shard axis off every leaf (inside shard_map)."""
    return jax.tree.map(lambda x: x[0], tree)


def make_tp_mesh(tp: int, data: int = 1) -> Mesh:
    devs = jax.devices()
    assert len(devs) >= data * tp, (len(devs), data, tp)
    return Mesh(np.array(devs[:data * tp]).reshape(data, tp),
                ("data", "tensor"))


def cache_specs(data: bool = False) -> llama.KVCache:
    """Specs for the TP cache ``[tp, L, B, kv_local, T, hd]``."""
    b = "data" if data else None
    return llama.KVCache(k=P("tensor", None, b, None, None, None),
                         v=P("tensor", None, b, None, None, None),
                         length=P())


def new_tp_cache(cfg: ModelConfig, tp: int, batch: int, max_len: int,
                 dtype=jnp.bfloat16, mesh: Optional[Mesh] = None,
                 group_size: int = 128) -> llama.KVCache:
    lcfg = local_stacked_config(cfg, tp, group_size)
    shape = (tp, lcfg.num_layers, batch, lcfg.num_kv_heads, max_len,
             lcfg.head_dim_)
    cache = llama.KVCache(k=jnp.zeros(shape, dtype),
                          v=jnp.zeros(shape, dtype), length=jnp.int32(0))
    if mesh is not None:
        data = "data" in mesh.axis_names and mesh.shape.get("data", 1) > 1
        cache = jax.device_put(cache, jax.tree.map(
            lambda s: NamedSharding(mesh, s), cache_specs(data),
            is_leaf=lambda x: isinstance(x, P)))
    return cache


def make_tp_forward_stacked(
    cfg: ModelConfig,
    mesh: Mesh,
    model: StackedModel,
    compute_dtype=jnp.bfloat16,
    group_size: int = 128,
) -> Callable:
    """shard_map-ped stacked forward: ``(model, tokens, cache) ->
    (logits, cache)`` with TP psum on o/down and kv-head-local attention.

    tokens ``[B, S]`` shard on 'data' when the mesh has one (>1); logits
    come back ``[B, S, V]`` float32.  The cache is required (serving
    always has one; prefill writes positions ``[offset, offset+S)``).
    """
    tp = mesh.shape["tensor"]
    dp = "data" in mesh.axis_names and mesh.shape.get("data", 1) > 1
    lcfg = local_stacked_config(cfg, tp, group_size)
    pspec = tp_specs(model)
    # static head mode: vocab-sharded quantized head -> all_gather
    head_sharded = model.lm_head_qt is not None and tp > 1
    v_loc = -(-cfg.vocab_size // tp)
    if head_sharded:
        assert model.lm_head_qt.out_features >= v_loc, (
            model.lm_head_qt.out_features, v_loc)
    bspec = P("data" if dp else None, None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspec, bspec, cache_specs(dp)),
             out_specs=(P("data" if dp else None, None, None),
                        cache_specs(dp)),
             check_vma=False)
    def fwd(m, tokens, cache):
        m = _local(m)
        k_all, v_all = cache.k[0], cache.v[0]
        offset = cache.length
        x = m.embed[tokens].astype(compute_dtype)
        x, kv_app = scan_layers(m, lcfg, x, cache_kv=(k_all, v_all),
                                offset=offset, compute_dtype=compute_dtype,
                                tp_axis="tensor")
        x = llama.rms_norm(x, m.final_norm, cfg.rms_norm_eps)
        logits = apply_head(m, x, compute_dtype)    # [B, S, V or v_loc]
        if head_sharded:
            parts = jax.lax.all_gather(logits[..., :v_loc], "tensor")
            logits = jnp.moveaxis(parts, 0, 2).reshape(
                *logits.shape[:2], tp * v_loc)[..., :cfg.vocab_size]
        k_all = jax.lax.dynamic_update_slice_in_dim(
            k_all, kv_app[0], offset, axis=3)
        v_all = jax.lax.dynamic_update_slice_in_dim(
            v_all, kv_app[1], offset, axis=3)
        new_cache = llama.KVCache(k=k_all[None], v=v_all[None],
                                  length=cache.length + tokens.shape[1])
        return logits.astype(jnp.float32), new_cache

    return fwd


def make_tp_engine(cfg: ModelConfig, mesh: Mesh, model: StackedModel,
                   batch_size: int = 1, max_len: int = 2048,
                   compute_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16,
                   group_size: int = 128, use_pallas: Optional[bool] = None):
    """Serving :class:`~amq_tpu.serving.engine.Engine` over the TP mesh.

    Same public API (generate / prefill / decode scan); the forward and
    the KV cache factory are the sharded ones.
    """
    from ..serving.engine import Engine
    tp = mesh.shape["tensor"]
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    fwd = make_tp_forward_stacked(cfg, mesh, model,
                                  compute_dtype=compute_dtype,
                                  group_size=group_size)
    return Engine(
        params=model, cfg=cfg, batch_size=batch_size, max_len=max_len,
        compute_dtype=compute_dtype, cache_dtype=cache_dtype,
        use_pallas=use_pallas,
        forward_fn=lambda params, tokens, cache: fwd(params, tokens, cache),
        cache_factory=lambda: new_tp_cache(
            cfg, tp, batch_size, max_len, dtype=cache_dtype, mesh=mesh,
            group_size=group_size))
