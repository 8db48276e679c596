"""Tensor parallelism over a jax Mesh (packed quantized weights included).

The reference's only "model parallelism" is block-wise device placement via
Accelerate hooks (utils/func.py:79-98, utils/dispatch.py) — sequential,
no compute overlap.  TPU-native we do real Megatron-style TP under
``shard_map``:

* q/k/v/gate/up are column-parallel: their packed codes ``[K*b/32, N]``,
  scale/zero ``[K/g, N]`` and bias shard on the **N** (out-feature/lane)
  axis — head-aligned, so each device owns whole heads,
* o/down are row-parallel: packed codes shard on the **packed-row** axis
  (group-aligned: K/D must be a multiple of the group size, so every
  device owns whole quantization groups and their scale/zero rows),
* partial row-parallel outputs are ``psum``-reduced over the axis (the
  hooks live in :func:`amq_tpu.models.llama.decoder_layer` via
  ``tp_axis``), collectives ride ICI,
* the KV cache shards on the kv-head axis; attention is fully local,
* norms/embeddings are replicated.

Because the per-device shard of a packed ``QuantizedTensor`` is itself a
valid packed tensor (group-aligned slicing), the same fused Pallas kernel
runs unmodified on each shard.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llama
from ..models.config import LINEAR_NAMES, ModelConfig
from ..models.linear import DenseLinear, ProxySwitch, QuantLinear

COLUMN_PARALLEL = ("self_attn.q_proj", "self_attn.k_proj",
                   "self_attn.v_proj", "mlp.gate_proj", "mlp.up_proj")
ROW_PARALLEL = ("self_attn.o_proj", "mlp.down_proj")


def make_mesh(n_devices: Optional[int] = None, data: int = 1,
              tensor: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    tensor = tensor or (n // data)
    assert data * tensor <= len(devs), (data, tensor, len(devs))
    arr = np.array(devs[: data * tensor]).reshape(data, tensor)
    return Mesh(arr, ("data", "tensor"))


def _linear_spec(name: str, kind: str) -> Dict[str, P]:
    """PartitionSpecs for one linear's leaves ('dense'|'quant')."""
    if name in COLUMN_PARALLEL:
        if kind == "dense":
            return {"weight": P("tensor", None), "bias": P("tensor")}
        return {"packed": P(None, "tensor"), "scale": P(None, "tensor"),
                "zero": P(None, "tensor"), "bias": P("tensor")}
    if kind == "dense":
        return {"weight": P(None, "tensor"), "bias": P()}
    return {"packed": P("tensor", None), "scale": P("tensor", None),
            "zero": P("tensor", None), "bias": P()}


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Pytree of PartitionSpecs matching ``params`` (replicated elsewhere)."""

    def linear_entry(p, name):
        if isinstance(p, DenseLinear):
            sp = _linear_spec(name, "dense")
            return DenseLinear(weight=sp["weight"],
                               bias=None if p.bias is None else sp["bias"])
        if isinstance(p, QuantLinear):
            sp = _linear_spec(name, "quant")
            import dataclasses as dc
            qt_spec = dc.replace(p.qt, packed=sp["packed"],
                                 scale=sp["scale"], zero=sp["zero"])
            return QuantLinear(qt=qt_spec,
                               bias=None if p.bias is None else sp["bias"])
        if isinstance(p, ProxySwitch):
            return ProxySwitch(
                proxies=tuple(linear_entry(q, name) for q in p.proxies),
                select=P())
        raise TypeError(type(p))

    out = {"embed": P(), "final_norm": P()}
    if "lm_head" in params:
        out["lm_head"] = DenseLinear(weight=P(), bias=None)
    out["layers"] = []
    for layer in params["layers"]:
        lsp: Dict[str, Any] = {"input_norm": P(), "post_norm": P()}
        for name in LINEAR_NAMES:
            lsp[name] = linear_entry(layer[name], name)
        out["layers"].append(lsp)
    return out


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    specs = param_specs(params)

    def put(x, s):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, s or P()))

    return jax.tree.map(
        put, params, specs,
        is_leaf=lambda x: x is None or isinstance(x, (jnp.ndarray, np.ndarray, P)))


def local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard config: local heads / intermediate size."""
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0, (
        cfg.num_heads, cfg.num_kv_heads, tp)
    assert cfg.intermediate_size % tp == 0
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
        head_dim=cfg.head_dim_,
        name=cfg.name + f"-tp{tp}",
    )


def cache_specs() -> llama.KVCache:
    # [L, B, kv, T, hd]: batch over 'data', kv heads over 'tensor'
    return llama.KVCache(k=P(None, "data", "tensor", None, None),
                         v=P(None, "data", "tensor", None, None),
                         length=P())


def make_tp_forward(cfg: ModelConfig, mesh: Mesh, params: Dict[str, Any],
                    compute_dtype=jnp.bfloat16):
    """shard_map-ped forward: (params, tokens, cache) -> (logits, cache).

    Data axis shards the batch; tensor axis shards heads/intermediate.
    Logits come back replicated over 'tensor', sharded over 'data'.
    ``params`` is only used for its pytree structure (to build specs).
    """
    tp = mesh.shape["tensor"]
    lcfg = local_config(cfg, tp)
    pspec = param_specs(params)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspec, P("data", None), cache_specs()),
             out_specs=(P("data", None, None), cache_specs()),
             check_vma=False)
    def fwd(p, tokens, cache):
        logits, new_cache = llama.forward(
            p, lcfg, tokens, cache=cache,
            compute_dtype=compute_dtype, tp_axis="tensor")
        return logits, new_cache

    return fwd
