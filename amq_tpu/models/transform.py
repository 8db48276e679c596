"""Whole-model quantization transforms over param pytrees.

Replaces the reference's in-place module surgery — HQQ's ``quantize_model``
module patching (hqq/models/base.py:349-367) and the evaluator's per-arch
module re-stitching (evaluation/evaluator.py:71-81) — with pure
tree-to-tree transforms:

* :func:`quantize_model` — dense -> uniformly or per-arch quantized params
  (the "quantization proxy" builder, amq/amq_quantization_proxy.py:26-42),
* :func:`build_switch_model` — fold N per-bit proxy pytrees into one pytree
  of :class:`~amq_tpu.models.linear.ProxySwitch` leaves,
* :func:`set_arch` — point the switch model at a new architecture by
  rewriting only the selector leaves (same treedef -> no retrace).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp

from ..core import quantize as qcore
from .config import LINEAR_NAMES, ModelConfig
from .linear import DenseLinear, ProxySwitch, QuantLinear

Arch = Dict[str, Dict[str, List[int]]]  # {'linear': {site: [bits]*n_block}}


def uniform_arch(cfg: ModelConfig, bits: int) -> Arch:
    return {"linear": {l: [bits] * cfg.num_layers for l in LINEAR_NAMES}}


def quantize_model(params: Dict[str, Any], cfg: ModelConfig,
                   arch_or_bits, group_size: int = 128,
                   optimize: bool = True,
                   superblock: int = 0,
                   meta_dtype=None,
                   device=None) -> Dict[str, Any]:
    """Quantize every decoder linear; embeddings/norms/lm_head stay dense.

    ``superblock`` caps the planar packing block (pass the tensor-parallel
    shard granularity when the model will be K-sharded).  ``meta_dtype``
    sets the scale/zero storage dtype (see core.quantize.quantize);
    bfloat16 for serving proxies, float32 (default) for eval parity.

    ``device``: stage each weight there before quantizing.  Host-resident
    7B+ params are COMMITTED to the cpu device, which pins the jitted
    quantize (incl. the 20-iteration proximal solver) to the CPU backend
    — ~40 min and tens of GB of host arena churn at 7B; staged on the
    accelerator it is seconds per layer.
    """
    import jax
    import jax.numpy as jnp
    meta_dtype = meta_dtype or jnp.float32
    arch = (uniform_arch(cfg, arch_or_bits)
            if isinstance(arch_or_bits, int) else arch_or_bits)
    out = dict(params)
    out_layers = []
    for i, layer in enumerate(params["layers"]):
        new_layer = dict(layer)
        for name in LINEAR_NAMES:
            p = layer[name]
            assert isinstance(p, DenseLinear), (name, type(p))
            w = p.weight
            if device is not None:
                w = jax.device_put(w, device)
            qt = qcore.quantize(w, nbits=int(arch["linear"][name][i]),
                                group_size=group_size, optimize=optimize,
                                superblock=superblock or None,
                                meta_dtype=meta_dtype)
            new_layer[name] = QuantLinear(qt=qt, bias=p.bias)
        out_layers.append(new_layer)
    out["layers"] = out_layers
    return out


def build_switch_model(proxies: Sequence[Dict[str, Any]],
                       bits_range: Sequence[int],
                       arch: Optional[Arch] = None) -> Dict[str, Any]:
    """Fold per-bit proxy models into one ProxySwitch model.

    ``proxies[j]`` must be the quantized model at ``bits_range[j]``; all
    non-linear leaves (embed/norms) are taken from the last (highest-bit)
    proxy, mirroring the reference working model = copy of the 4-bit proxy
    (evaluator.py:59).
    """
    assert len(proxies) == len(bits_range)
    base = proxies[-1]
    out = dict(base)
    out_layers = []
    for i in range(len(base["layers"])):
        new_layer = dict(base["layers"][i])
        for name in LINEAR_NAMES:
            qls = [p["layers"][i][name] for p in proxies]
            sel = 0 if arch is None else list(bits_range).index(
                int(arch["linear"][name][i]))
            new_layer[name] = ProxySwitch(
                proxies=tuple(qls), select=jnp.int32(sel))
        out_layers.append(new_layer)
    out["layers"] = out_layers
    return out


def set_arch(switch_params: Dict[str, Any], arch: Arch,
             bits_range: Sequence[int]) -> Dict[str, Any]:
    """Re-point every ProxySwitch selector at ``arch`` (no retrace)."""
    bits_range = list(bits_range)
    out = dict(switch_params)
    out_layers = []
    for i, layer in enumerate(switch_params["layers"]):
        new_layer = dict(layer)
        for name in LINEAR_NAMES:
            ps = layer[name]
            assert isinstance(ps, ProxySwitch)
            sel = bits_range.index(int(arch["linear"][name][i]))
            new_layer[name] = ProxySwitch(proxies=ps.proxies,
                                          select=jnp.int32(sel))
        out_layers.append(new_layer)
    out["layers"] = out_layers
    return out
