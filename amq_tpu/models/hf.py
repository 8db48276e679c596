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


def save_hf_checkpoint(params: Dict[str, Any], cfg: ModelConfig,
                       path: str, dtype=np.float32) -> None:
    """Write a param pytree as an HF-format checkpoint directory
    (model.safetensors + config.json) — the inverse of
    :func:`load_hf_params`.

    Lets the full real-weights pipeline (safetensors load, tokenizer,
    dataset chunking) run end-to-end in hub-less environments, and
    doubles as an export path for models quantize-evaluated here.
    """
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed"], dtype),
        "model.norm.weight": np.asarray(params["final_norm"], dtype),
    }
    if "lm_head" in params:
        tensors["lm_head.weight"] = np.asarray(params["lm_head"].weight,
                                               dtype)
    for i, layer in enumerate(params["layers"]):
        for slot, pat in _HF_LAYER.items():
            key = pat.format(i=i)
            if slot in LINEAR_NAMES:
                tensors[key] = np.asarray(layer[slot].weight, dtype)
                if layer[slot].bias is not None:
                    tensors[key.replace(".weight", ".bias")] = np.asarray(
                        layer[slot].bias, dtype)
            else:
                tensors[key] = np.asarray(layer[slot], dtype)
    save_file(tensors, os.path.join(path, "model.safetensors"))

    hf_cfg = {
        "model_type": "qwen2" if cfg.qkv_bias else "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim_,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "sliding_window": cfg.sliding_window,
        "max_position_embeddings": cfg.max_position_embeddings,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=1)


def save_dummy_tokenizer(path: str, vocab_size: int) -> None:
    """Write a minimal WordLevel tokenizer.json loadable by
    transformers.PreTrainedTokenizerFast — exercises the *real* tokenizer
    code path (fast-tokenizer load + encode) without hub access."""
    vocab = {"[UNK]": 0}
    vocab.update({f"w{i}": i for i in range(1, vocab_size)})
    tok = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {"id": 0, "content": "[UNK]", "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False,
             "special": True}
        ],
        "normalizer": None,
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None,
        "decoder": None,
        "model": {"type": "WordLevel", "vocab": vocab,
                  "unk_token": "[UNK]"},
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "tokenizer.json"), "w") as f:
        json.dump(tok, f)
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "unk_token": "[UNK]"}, f)


def load_tokenizer(path: str):
    """Local-files-only tokenizer load (reference: AutoTokenizer in
    utils/func.py:117-156's callers)."""
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(path, local_files_only=True)


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
