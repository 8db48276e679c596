"""Quantized-model serialization (the reference's ``qmodel.pt``).

HQQ saves per-module state dicts via torch (hqq/models/base.py:424-434)
and reloads into empty-weight models (:462-543).  Here a quantized param
pytree is a flat ``.npz`` of arrays plus a JSON manifest holding the
static structure (nbits / group_size / shapes), so proxies round-trip
without pickle and load straight to any device/sharding.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import ml_dtypes
import numpy as np

#: dtypes the ``.npy`` format cannot represent (they round-trip as void
#: ``|V2`` blobs) — stored as same-width uint views + a manifest entry
_NONNATIVE = {"bfloat16": (ml_dtypes.bfloat16, np.uint16)}

from ..core.quantize import QuantizedTensor
from ..models.config import LINEAR_NAMES, ModelConfig, get_config
from ..models.linear import DenseLinear, QuantLinear


def save_quantized(params: Dict[str, Any], cfg: ModelConfig, path: str,
                   extra_meta: Dict | None = None) -> None:
    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict[str, Any] = {"model": cfg.name, "layers": [],
                                "nonnative_dtypes": {},
                                **(extra_meta or {})}

    def put(key, arr):
        a = np.asarray(arr)
        for name, (dt, view_dt) in _NONNATIVE.items():
            if a.dtype == dt:
                manifest["nonnative_dtypes"][key] = name
                a = a.view(view_dt)
                break
        arrays[key] = a

    put("embed", params["embed"])
    put("final_norm", params["final_norm"])
    if "lm_head" in params:
        put("lm_head.weight", params["lm_head"].weight)
    for i, layer in enumerate(params["layers"]):
        lman: Dict[str, Any] = {}
        put(f"layers.{i}.input_norm", layer["input_norm"])
        put(f"layers.{i}.post_norm", layer["post_norm"])
        for name in LINEAR_NAMES:
            p = layer[name]
            base = f"layers.{i}.{name}"
            if isinstance(p, QuantLinear):
                put(f"{base}.packed", p.qt.packed)
                put(f"{base}.scale", p.qt.scale)
                put(f"{base}.zero", p.qt.zero)
                lman[name] = {"kind": "quant", "nbits": p.qt.nbits,
                              "group_size": p.qt.group_size,
                              "shape": list(p.qt.shape),
                              "superblock": p.qt.superblock_}
            else:
                put(f"{base}.weight", p.weight)
                lman[name] = {"kind": "dense"}
            if p.bias is not None:
                put(f"{base}.bias", p.bias)
                lman[name]["bias"] = True
        manifest["layers"].append(lman)

    np.savez(os.path.join(path, "qmodel.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_quantized(path: str, dtype=jnp.float32) -> tuple[Dict[str, Any], ModelConfig]:
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    cfg = get_config(manifest["model"])
    blob = np.load(os.path.join(path, "qmodel.npz"))
    nonnative = manifest.get("nonnative_dtypes", {})

    def get(key, cast=True):
        raw = blob[key]
        if key in nonnative:
            # deliberately-narrow storage (e.g. bf16 serving metadata):
            # keep as stored, don't widen to the load dtype
            return jnp.asarray(raw.view(_NONNATIVE[nonnative[key]][0]))
        a = jnp.asarray(raw)
        return a.astype(dtype) if cast and a.dtype.kind == "f" else a

    params: Dict[str, Any] = {
        "embed": get("embed"),
        "final_norm": get("final_norm"),
        "layers": [],
    }
    if "lm_head.weight" in blob:
        params["lm_head"] = DenseLinear(weight=get("lm_head.weight"))
    for i, lman in enumerate(manifest["layers"]):
        layer: Dict[str, Any] = {
            "input_norm": get(f"layers.{i}.input_norm"),
            "post_norm": get(f"layers.{i}.post_norm"),
        }
        for name in LINEAR_NAMES:
            base = f"layers.{i}.{name}"
            m = lman[name]
            bias = get(f"{base}.bias") if m.get("bias") else None
            if m["kind"] == "quant":
                qt = QuantizedTensor(
                    packed=get(f"{base}.packed", cast=False),
                    scale=get(f"{base}.scale"),
                    zero=get(f"{base}.zero"),
                    nbits=m["nbits"], group_size=m["group_size"],
                    shape=tuple(m["shape"]),
                    superblock=m.get("superblock", m["group_size"]))
                layer[name] = QuantLinear(qt=qt, bias=bias)
            else:
                layer[name] = DenseLinear(weight=get(f"{base}.weight"),
                                          bias=bias)
        params["layers"].append(layer)
    return params, cfg
