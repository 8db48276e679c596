"""AWQ: activation-aware scale + clip search, per-linear-bit-aware.

Functional re-design of the reference AWQ pipeline
(quantization/awq.py:5-38, awq_utils/{pre_quant,auto_scale,auto_clip}.py):

* per block, capture each linear site's input activations,
* **scale search** (auto_scale.py:96-146): for each scale group
  ``(prev_op, linears, inspect)`` grid-search alpha over 20 points,
  ``scales = mean|x| ** alpha`` normalized by ``sqrt(max*min)``; candidate
  evaluated by fake-quantizing each linear *at its searched bit* and
  measuring the inspected sub-module's output MSE,
* scale groups for the Llama family (auto_scale.py:167-273):
  (input_norm -> q/k/v, inspect=attention), (v -> o, only when shapes
  match i.e. no GQA), (post_norm -> gate/up, inspect=mlp), (up -> down),
* **clip search** (auto_clip.py:27-87): asymmetric per-group min/max
  shrink grid (20 steps, max 0.5) minimizing per-channel output MSE on a
  512-token subsample; q/k projections skipped,
* apply scales + clips, then group-wise pseudo-quantize at arch bits
  (pre_quant.py:218-235).

All transforms are tree-to-tree; the hidden-state propagation uses the
*original* weights, as the reference computes next-block inputs before
scaling (pre_quant.py:160-162).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pseudo import pseudo_quantize
from ..models import llama, transform
from ..models.config import LINEAR_NAMES, ModelConfig
from ..models.linear import DenseLinear
from . import calib

N_GRID = 20
CLIP_N_GRID = 20
CLIP_MAX_SHRINK = 0.5
CLIP_N_SAMPLE_TOKEN = 512


def _scale_groups(cfg: ModelConfig) -> List[Dict]:
    groups = [
        {"prev": "input_norm", "linears": ["self_attn.q_proj",
                                           "self_attn.k_proj",
                                           "self_attn.v_proj"],
         "inp": "self_attn.q_proj", "inspect": "attn"},
    ]
    if cfg.q_dim == cfg.kv_dim:  # v/o shapes match (auto_scale.py:185)
        groups.append({"prev": "self_attn.v_proj",
                       "linears": ["self_attn.o_proj"],
                       "inp": "self_attn.o_proj", "inspect": "linear"})
    groups += [
        {"prev": "post_norm", "linears": ["mlp.gate_proj", "mlp.up_proj"],
         "inp": "mlp.gate_proj", "inspect": "mlp"},
        {"prev": "mlp.up_proj", "linears": ["mlp.down_proj"],
         "inp": "mlp.down_proj", "inspect": "linear"},
    ]
    return groups


def _inspect_forward(kind: str, layer, cfg, x, cos, sin, mask, compute_dtype):
    if kind == "attn":
        out, _, _ = llama.attn_block(layer, cfg, x, cos, sin, mask,
                                     compute_dtype)
        return out
    if kind == "mlp":
        return llama.mlp_block(layer, x, compute_dtype)[0]
    raise ValueError(kind)


def _search_scale_group(layer, cfg, group, input_feat, bits_by_site,
                        cos, sin, mask, group_size, compute_dtype):
    """Grid search over alpha (auto_scale.py:96-146).  Returns scales [in]."""
    x = input_feat[group["inp"]]
    x_max = jnp.mean(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0)

    if group["inspect"] == "linear":
        (name,) = group["linears"]
        lin = layer[name]

        def run(test_layer):
            return jnp.dot(x, test_layer[name].weight.T,
                           preferred_element_type=jnp.float32)
    else:
        def run(test_layer):
            return _inspect_forward(group["inspect"], test_layer, cfg, x,
                                    cos, sin, mask, compute_dtype)

    org_out = run(layer)

    best_err, best_scales = np.inf, None
    for g in range(N_GRID):
        ratio = g / N_GRID
        scales = jnp.clip(x_max ** ratio, 1e-4, None)
        scales = scales / jnp.sqrt(scales.max() * scales.min())
        test_layer = dict(layer)
        for name in group["linears"]:
            p = layer[name]
            w = p.weight * scales[None, :]
            w = pseudo_quantize(w, n_bit=int(bits_by_site[name]),
                                group_size=group_size)
            test_layer[name] = DenseLinear(weight=w / scales[None, :],
                                           bias=p.bias)
        out = run(test_layer)
        loss = float(jnp.mean((org_out.astype(jnp.float32)
                               - out.astype(jnp.float32)) ** 2))
        if loss < best_err:
            best_err, best_scales = loss, scales
    assert best_scales is not None
    return best_scales


def _apply_scales_to_layer(layer, group, scales):
    """scale_ln_fcs / scale_fc_fc semantics (auto_scale.py:32-68)."""
    out = dict(layer)
    prev = group["prev"]
    if prev in ("input_norm", "post_norm"):
        out[prev] = layer[prev] / scales
    else:  # previous linear: divide its output rows
        p = layer[prev]
        out[prev] = DenseLinear(
            weight=p.weight / scales[:, None],
            bias=None if p.bias is None else p.bias / scales)
    for name in group["linears"]:
        p = out[name]
        out[name] = DenseLinear(weight=p.weight * scales[None, :], bias=p.bias)
    return out


@partial(jax.jit, static_argnames=("n_bit", "group_size"))
def _clip_search_single(w, feat, n_bit: int, group_size: int):
    """auto_clip_layer_asym (auto_clip.py:27-87) for one weight.

    w: [co, ci]; feat: [n_token, ci] (already subsampled).
    Returns (max_val, min_val) of shape [co, n_group, 1].
    """
    co, ci = w.shape
    g = group_size if group_size > 0 else ci
    wg = w.reshape(co, 1, ci // g, g).astype(jnp.float32)
    xg = feat.reshape(1, feat.shape[0], ci // g, g).astype(jnp.float32)
    org_out = jnp.sum(xg * wg, axis=-1)  # [co, n_token, n_group]
    org_max = jnp.max(wg, axis=-1, keepdims=True)
    org_min = jnp.min(wg, axis=-1, keepdims=True)

    def body(i_s, carry):
        best_max, best_min, min_err = carry
        shrink = 1.0 - i_s.astype(jnp.float32) / CLIP_N_GRID
        max_v = org_max * shrink
        min_v = org_min * shrink
        cur_w = jnp.clip(wg, min_v, max_v)
        q_w = pseudo_quantize(cur_w.reshape(-1, g), n_bit=n_bit,
                              group_size=g).reshape(cur_w.shape)
        cur_out = jnp.sum(xg * q_w, axis=-1)
        # per-channel-group error, viewed as min_err's [co,1,n_group,1]
        err = jnp.mean((cur_out - org_out) ** 2, axis=1)[:, None, :, None]
        take = err < min_err
        return (jnp.where(take, max_v, best_max),
                jnp.where(take, min_v, best_min),
                jnp.where(take, err, min_err))

    init = (org_max, org_min, jnp.full_like(org_max, jnp.inf))
    best_max, best_min, _ = jax.lax.fori_loop(
        0, int(CLIP_MAX_SHRINK * CLIP_N_GRID), body, init)
    return best_max[:, 0], best_min[:, 0]


def _subsample_tokens(feat: jnp.ndarray) -> jnp.ndarray:
    x = feat.reshape(-1, feat.shape[-1])
    stride = max(1, x.shape[0] // CLIP_N_SAMPLE_TOKEN)
    return x[::stride]


def awq_quantize_model(
    params: Dict[str, Any],
    cfg: ModelConfig,
    arch: transform.Arch,
    calib_tokens: np.ndarray,
    group_size: int = 128,
    clip_asym: bool = True,
    batch_size: int = 8,
    compute_dtype=jnp.float32,
    progress: bool = False,
) -> Dict[str, Any]:
    """Full AWQ pipeline -> fake-quantized params (awq.py:5-38)."""
    assert clip_asym, "symmetric clip path not implemented (unused upstream)"
    n, S = calib_tokens.shape
    batches = [jnp.asarray(calib_tokens[i:i + batch_size])
               for i in range(0, n, batch_size)]
    states, rope = [], None
    for toks in batches:
        x, cos, sin, mask = calib.embed_inputs(params, cfg, toks,
                                               compute_dtype)
        states.append(x)
        rope = (cos, sin, mask)
    cos, sin, mask = rope
    groups = _scale_groups(cfg)

    out_layers = []
    for li, layer in enumerate(params["layers"]):
        bits_by_site = {nm: int(round(arch["linear"][nm][li]))
                        for nm in LINEAR_NAMES}
        # capture features + propagate with ORIGINAL weights
        feats = {nm: [] for nm in LINEAR_NAMES}
        next_states = []
        for x in states:
            h, caps = calib.run_block(layer, cfg, x, cos, sin, mask,
                                      capture=True,
                                      compute_dtype=compute_dtype)
            next_states.append(h)
            for nm in LINEAR_NAMES:
                feats[nm].append(caps[nm])
        states = next_states
        feats = {nm: jnp.concatenate(v, axis=0) for nm, v in feats.items()}

        # all group searches run on the ORIGINAL layer state; scales are
        # applied once afterwards (pre_quant.py:173-178: auto_scale_block
        # computes every group before apply_scale runs)
        group_scales = [
            _search_scale_group(layer, cfg, group, feats, bits_by_site,
                                cos, sin, mask, group_size, compute_dtype)
            for group in groups
        ]
        scaled_layer = dict(layer)
        for group, scales in zip(groups, group_scales):
            scaled_layer = _apply_scales_to_layer(scaled_layer, group, scales)
            for nm in group["linears"]:  # auto_scale.py:301-305
                feats[nm] = feats[nm] / scales

        # clip search on the scaled weights (q/k skipped, auto_clip.py:16-18)
        for nm in LINEAR_NAMES:
            if "q_proj" in nm or "k_proj" in nm:
                continue
            p = scaled_layer[nm]
            max_v, min_v = _clip_search_single(
                p.weight, _subsample_tokens(feats[nm]),
                n_bit=bits_by_site[nm], group_size=group_size)
            co, ci = p.weight.shape
            g = group_size if group_size > 0 else ci
            w = p.weight.reshape(co, ci // g, g)
            w = jnp.clip(w, min_v, max_v).reshape(co, ci)
            scaled_layer[nm] = DenseLinear(weight=w, bias=p.bias)

        # final group-wise fake-quant at arch bits (pre_quant.py:218-235)
        for nm in LINEAR_NAMES:
            p = scaled_layer[nm]
            w = pseudo_quantize(p.weight, n_bit=bits_by_site[nm],
                                group_size=group_size)
            scaled_layer[nm] = DenseLinear(weight=w, bias=p.bias)
        out_layers.append(scaled_layer)
        if progress:
            print(f"awq block {li} done", flush=True)

    out = dict(params)
    out["layers"] = out_layers
    return out
