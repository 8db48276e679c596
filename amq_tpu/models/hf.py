"""HF checkpoint loading: safetensors -> param pytree.

Replaces the reference's ``get_hfmodel`` (utils/func.py:117-156, init-skip
fast load through transformers) with a direct safetensors read — no torch
module tree, just arrays into our functional pytree.  Gated on local files;
this environment has no hub access, so tests use ``init_params`` instead.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .config import LINEAR_NAMES, ModelConfig, get_config, register
from .linear import DenseLinear

# HF state-dict names per our param slots
_HF_LAYER = {
    "input_norm": "model.layers.{i}.input_layernorm.weight",
    "post_norm": "model.layers.{i}.post_attention_layernorm.weight",
    **{name: f"model.layers.{{i}}.{name}.weight" for name in LINEAR_NAMES},
}


def config_from_hf(path: str) -> ModelConfig:
    """Build (and register) a ModelConfig from an HF config.json."""
    with open(os.path.join(path, "config.json")) as f:
        hc = json.load(f)
    rope_scaling = hc.get("rope_scaling") or {}
    cfg = ModelConfig(
        name=os.path.basename(os.path.normpath(path)),
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        intermediate_size=hc["intermediate_size"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        num_kv_heads=hc.get("num_key_value_heads",
                            hc["num_attention_heads"]),
        head_dim=hc.get("head_dim"),
        rms_norm_eps=hc.get("rms_norm_eps", 1e-5),
        rope_theta=hc.get("rope_theta", 10000.0),
        rope_scaling_llama3=(rope_scaling.get("rope_type") == "llama3"),
        qkv_bias=(hc.get("model_type") == "qwen2"),
        tie_word_embeddings=hc.get("tie_word_embeddings", False),
        sliding_window=hc.get("sliding_window"),
        max_position_embeddings=hc.get("max_position_embeddings", 4096),
    )
    return register(cfg)


def load_hf_params(path: str, cfg: Optional[ModelConfig] = None,
                   dtype=jnp.float32) -> Dict[str, Any]:
    """Load a local HF llama-family checkpoint directory."""
    from safetensors import safe_open

    cfg = cfg or config_from_hf(path)
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors under {path}")

    tensors: Dict[str, Any] = {}
    for f in files:
        # the flax backend handles bfloat16 natively
        with safe_open(f, framework="flax") as sf:
            for k in sf.keys():
                tensors[k] = sf.get_tensor(k)

    def get(name):
        return jnp.asarray(tensors[name]).astype(dtype)

    params: Dict[str, Any] = {
        "embed": get("model.embed_tokens.weight"),
        "final_norm": get("model.norm.weight"),
        "layers": [],
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in tensors:
        params["lm_head"] = DenseLinear(weight=get("lm_head.weight"))
    for i in range(cfg.num_layers):
        layer: Dict[str, Any] = {}
        for slot, pat in _HF_LAYER.items():
            key = pat.format(i=i)
            if slot in LINEAR_NAMES:
                bias_key = key.replace(".weight", ".bias")
                bias = get(bias_key) if bias_key in tensors else None
                layer[slot] = DenseLinear(weight=get(key), bias=bias)
            else:
                layer[slot] = get(key)
        params["layers"].append(layer)
    return params
