"""GPTQ: Hessian-guided greedy weight quantization, as jitted lax loops.

Re-expression of the reference GPTQ (quantization/gptq.py:19-439):

* Hessian ``H = (2/N) X^T X`` accumulated per linear site from block-input
  activations (add_batch, gptq.py:178-204),
* damping ``percdamp * mean(diag H)``, then
  ``Hinv = chol_upper(inv(H))`` via Cholesky (gptq.py:250-252),
* column-blocked greedy rounding with error feedback: per 128-column block,
  per column — fake-quant against the current group params, push the
  scaled error into the remaining columns (gptq.py:254-290),
* group-wise ``find_params`` re-estimated at every group boundary on the
  *updated* weights (gptq.py:269-277), asymmetric per-row min/max,
* optional activation ordering (act_order) by descending diag(H).

TPU-native: the sequential column loop is a ``lax.fori_loop`` with masked
rank-1 updates (no dynamic-length slices), the block loop is a second
``fori_loop`` with static block size = group size, and everything jit
compiles once per (shape, bits).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pseudo import find_params_minmax, quantize_affine
from ..models import transform
from ..models.config import LINEAR_NAMES, ModelConfig
from ..models.linear import DenseLinear
from . import calib


@partial(jax.jit, static_argnames=("bits", "group_size", "blocksize",
                                   "actorder", "sym"))
def gptq_quantize_weight(
    W: jnp.ndarray,            # [rows, cols] fp
    H: jnp.ndarray,            # [cols, cols] fp32
    bits: int,
    group_size: int = 128,
    blocksize: int = 128,
    percdamp: float = 0.01,
    actorder: bool = False,
    sym: bool = False,
) -> jnp.ndarray:
    """Returns the fake-quantized weight ``Q`` (same shape/dtype as W)."""
    rows, cols = W.shape
    if group_size == -1:
        group_size = blocksize  # params computed once below, groups unused
        per_channel_once = True
    else:
        per_channel_once = False
        assert blocksize % group_size == 0, (blocksize, group_size)
    assert cols % blocksize == 0, (cols, blocksize)
    maxq = 2**bits - 1

    Wf = W.astype(jnp.float32)
    H = H.astype(jnp.float32)

    dead = jnp.diag(H) == 0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    Wf = jnp.where(dead[None, :], 0.0, Wf)

    if actorder:
        perm = jnp.argsort(-jnp.diag(H))
        Wf = Wf[:, perm]
        H = H[perm][:, perm]
        invperm = jnp.argsort(perm)

    damp = percdamp * jnp.mean(jnp.diag(H))
    H = H + damp * jnp.eye(cols, dtype=jnp.float32)
    # Hinv = chol_upper(inv(H))  (gptq.py:250-252)
    L = jnp.linalg.cholesky(H)
    Hinv_full = jax.scipy.linalg.cho_solve((L, True), jnp.eye(cols, dtype=jnp.float32))
    Hinv = jnp.linalg.cholesky(Hinv_full.T).T  # upper factor: U^T U = Hinv

    if per_channel_once:
        g_scale, g_zero = find_params_minmax(Wf, bits, sym=sym)

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, blocksize), 1)

    def block_body(blk, carry):
        Wc, Qc = carry
        i1 = blk * blocksize
        W1 = jax.lax.dynamic_slice(Wc, (0, i1), (rows, blocksize))
        Hinv1 = jax.lax.dynamic_slice(Hinv, (i1, i1), (blocksize, blocksize))

        def col_body(i, inner):
            W1i, Q1, Err1, scale, zero = inner
            if not per_channel_once:
                # new group every group_size columns (gptq.py:269-273)
                def refresh(_):
                    gstart = (i // group_size) * group_size
                    Wg = jax.lax.dynamic_slice(
                        W1i, (0, gstart), (rows, group_size))
                    p = find_params_minmax(Wg, bits, sym=sym)
                    return p.scale, p.zero
                scale, zero = jax.lax.cond(
                    i % group_size == 0, refresh, lambda _: (scale, zero), None)

            w = jax.lax.dynamic_slice(W1i, (0, i), (rows, 1))
            d = Hinv1[i, i]
            q = quantize_affine(w, scale, zero, maxq)
            err = (w - q) / d
            row = Hinv1[i, :][None, :]                    # [1, blocksize]
            upd = err * jnp.where(col_idx >= i, row, 0.0)  # [rows, blocksize]
            W1i = W1i - upd
            Q1 = jax.lax.dynamic_update_slice(Q1, q, (0, i))
            Err1 = jax.lax.dynamic_update_slice(Err1, err, (0, i))
            return W1i, Q1, Err1, scale, zero

        if per_channel_once:
            init_scale, init_zero = g_scale, g_zero
        else:
            init_scale = jnp.zeros((rows, 1), jnp.float32)
            init_zero = jnp.zeros((rows, 1), jnp.float32)
        _, Q1, Err1, _, _ = jax.lax.fori_loop(
            0, blocksize, col_body,
            (W1, jnp.zeros_like(W1), jnp.zeros_like(W1),
             init_scale, init_zero))

        Qc = jax.lax.dynamic_update_slice(Qc, Q1, (0, i1))
        # propagate error into the remaining columns (gptq.py:284)
        Hrows = jax.lax.dynamic_slice(Hinv, (i1, 0), (blocksize, cols))
        tail_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
                     >= i1 + blocksize)
        Wc = Wc - jnp.dot(Err1, Hrows, preferred_element_type=jnp.float32) * tail_mask
        return Wc, Qc

    _, Q = jax.lax.fori_loop(0, cols // blocksize, block_body,
                             (Wf, jnp.zeros_like(Wf)))

    if actorder:
        Q = Q[:, invperm]
    return Q.astype(W.dtype)


def gptq_quantize_model(
    params: Dict[str, Any],
    cfg: ModelConfig,
    arch: transform.Arch,
    calib_tokens: np.ndarray,      # [n_samples, seqlen]
    group_size: int = 128,
    percdamp: float = 0.01,
    actorder: bool = False,
    sym: bool = False,
    batch_size: int = 8,
    compute_dtype=jnp.float32,
    progress: bool = False,
) -> Dict[str, Any]:
    """Sequential block-by-block GPTQ over the whole model (gptq.py:25-161).

    Hidden states are propagated through already-quantized blocks, so each
    block's Hessian sees the quantization error of its predecessors —
    matching the reference's in-place pipeline.
    """
    out = dict(params)
    out_layers = []
    n, S = calib_tokens.shape
    batches = [jnp.asarray(calib_tokens[i:i + batch_size])
               for i in range(0, n, batch_size)]
    states = []
    rope_mask = None
    for toks in batches:
        x, cos, sin, mask = calib.embed_inputs(params, cfg, toks, compute_dtype)
        states.append(x)
        rope_mask = (cos, sin, mask)
    cos, sin, mask = rope_mask

    n_tokens = n * S
    for li, layer in enumerate(params["layers"]):
        # 1) Hessians from the current (quantized-prefix) hidden states
        hessians = {name: jnp.zeros((cfg.linear_shape(name)[1],) * 2,
                                    jnp.float32) for name in LINEAR_NAMES}
        for x in states:
            _, caps = calib.run_block(layer, cfg, x, cos, sin, mask,
                                      capture=True, compute_dtype=compute_dtype)
            for name, h in calib.accumulate_hessians(caps).items():
                hessians[name] = hessians[name] + h

        # 2) quantize each site at its arch bits
        new_layer = dict(layer)
        for name in LINEAR_NAMES:
            p = layer[name]
            assert isinstance(p, DenseLinear)
            bits = int(round(arch["linear"][name][li]))
            H = hessians[name] * (2.0 / n_tokens)
            Q = gptq_quantize_weight(p.weight, H, bits, group_size=group_size,
                                     percdamp=percdamp, actorder=actorder,
                                     sym=sym)
            new_layer[name] = DenseLinear(weight=Q, bias=p.bias)
            if progress:
                err = float(jnp.mean((Q - p.weight) ** 2))
                print(f"gptq block {li} {name}: bits={bits} mse={err:.3e}",
                      flush=True)

        # 3) propagate through the quantized block (gptq.py:149-150)
        states = [calib.run_block(new_layer, cfg, x, cos, sin, mask,
                                  capture=False,
                                  compute_dtype=compute_dtype)[0]
                  for x in states]
        # park the quantized block on host: at 7B the fake-quant output
        # (13.5 GB bf16) cannot accumulate on device next to the
        # calibration state (the chunked PPL pass restages it)
        out_layers.append(calib.layer_to_host(new_layer))

    out["layers"] = out_layers
    return out
