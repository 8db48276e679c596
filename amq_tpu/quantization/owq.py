"""OWQ: outlier-aware weight quantization (GPTQ + fp16 outlier columns).

Re-expression of the reference OWQ (quantization/owq.py:44-564):

* outlier budget: with the 32/g scale-zero overhead removed from the
  target (owq.py:69-70), ``r = (12 / (16 - avg_bits)) * 0.1 / n_linear``
  and per-linear ``n_out = round(in_dim * r * ratio)`` rounded up to even
  (owq.py:143-153); ratios 1.0 for attention, 0.375 for MLP projections
  (quantization/model_config.json),
* outlier selection: top-``n_out`` columns by ``diag(H) * frob_error``
  where frob_error is the per-column squared error of an MSE-grid
  quantization of W (owq.py:199-208, hessian_sorting :287-309),
* columns permuted so outliers sit last; the GPTQ loop runs only over the
  first ``n_nonout`` columns; outlier columns receive error feedback but
  stay fp16 (owq.py:348-386),
* quantizer: asymmetric MSE grid over (range shrink x zero point) with
  lp-norm 2.4 scoring — ``num``=40 at group boundaries (owq.py:435-553).

TPU-native: fixed-width masked lax loops (no variable-length slices); the
MSE grid is a vectorized double ``fori_loop``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import transform
from ..models.config import LINEAR_NAMES, ModelConfig
from ..models.linear import DenseLinear
from . import calib

# per-linear outlier ratios (quantization/model_config.json "ratios")
OWQ_RATIOS = {
    "self_attn.q_proj": 1.0,
    "self_attn.k_proj": 1.0,
    "self_attn.v_proj": 1.0,
    "self_attn.o_proj": 1.0,
    "mlp.up_proj": 0.375,
    "mlp.gate_proj": 0.375,
    "mlp.down_proj": 0.375,
}


def compute_n_out(cfg: ModelConfig, avg_bits: float, group_size: int = 128) -> Dict[str, int]:
    """Outlier column budget per linear site (owq.py:143-153)."""
    if group_size > 0:
        avg_bits = avg_bits - 32.0 / group_size
    r = (12.0 / (16.0 - avg_bits)) * 0.1 / len(LINEAR_NAMES)
    out = {}
    for name in LINEAR_NAMES:
        in_dim = cfg.linear_shape(name)[1]
        n_out = round(in_dim * r * OWQ_RATIOS[name])
        if n_out % 2 == 1:
            n_out += 1
        out[name] = n_out
    return out


@partial(jax.jit, static_argnames=("bits", "num"))
def find_params_mse_grid(x: jnp.ndarray, bits: int, num: int = 100,
                         col_mask: Optional[jnp.ndarray] = None):
    """Asymmetric MSE-grid quant params per row (owq.py Quantizer:489-516).

    ``x``: [rows, cols]; optional ``col_mask`` [cols] marks valid columns
    (used for group windows clipped at the outlier boundary).  Returns
    (scale, zero) of shape [rows, 1].
    """
    maxq = 2**bits - 1
    n_levels = 2**bits
    xf = x.astype(jnp.float32)
    if col_mask is not None:
        m = col_mask[None, :]
        n_valid = jnp.maximum(jnp.sum(m), 1)
        xf = jnp.where(m, xf, 0.0)
    else:
        m = None
        n_valid = xf.shape[1]
    eps = 1e-8

    xmin = jnp.minimum(xf.min(axis=1), 0.0)
    xmax = jnp.maximum(xf.max(axis=1), 0.0)
    xrange = xmax - xmin

    def score_of(x_q):
        e = jnp.abs(xf - x_q) ** 2.4
        if m is not None:
            e = jnp.where(m, e, 0.0)
            return jnp.sum(e, axis=1) / n_valid
        return jnp.mean(e, axis=1)

    def i_body(i, carry):
        best_score, best_min, best_max = carry
        tmp_max = xrange / num * (i + 1).astype(jnp.float32)
        scale = jnp.maximum(tmp_max / maxq, eps)
        x_round = jnp.round(xf / scale[:, None])

        def zp_body(zp, inner):
            b_score, b_min, b_max = inner
            zpf = zp.astype(jnp.float32)
            new_min = -zpf * scale
            new_max = tmp_max - zpf * scale
            zero = jnp.clip(-jnp.round(new_min / scale), 0, maxq)
            x_q = scale[:, None] * (
                jnp.clip(x_round + zero[:, None], 0, maxq) - zero[:, None])
            s = score_of(x_q)
            take = s < b_score
            return (jnp.where(take, s, b_score),
                    jnp.where(take, new_min, b_min),
                    jnp.where(take, new_max, b_max))

        return jax.lax.fori_loop(0, n_levels, zp_body,
                                 (best_score, best_min, best_max))

    init = (jnp.full_like(xmin, 1e10), xmin, xmax)
    _, best_min, best_max = jax.lax.fori_loop(0, num, i_body, init)

    min_neg = jnp.minimum(best_min, 0.0)
    max_pos = jnp.maximum(best_max, 0.0)
    scale = jnp.maximum((max_pos - min_neg) / maxq, eps)
    zero = jnp.clip(-jnp.round(min_neg / scale), 0, maxq)
    return scale[:, None], zero[:, None]


def _quantize_affine_oz(x, scale, zero, maxq):
    q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


@partial(jax.jit, static_argnames=("bits", "n_out", "group_size", "blocksize",
                                   "num_boundary", "return_packed"))
def owq_quantize_weight(
    W: jnp.ndarray,            # [rows, cols]
    H: jnp.ndarray,            # [cols, cols]
    bits: int,
    n_out: int,
    group_size: int = 128,
    blocksize: int = 128,
    percdamp: float = 0.01,
    num_boundary: int = 40,
    return_packed: bool = False,
) -> jnp.ndarray:
    """OWQ fasterquant (owq.py:311-391): returns fake-quantized W with the
    selected outlier columns preserved (plus their error compensation).

    ``return_packed=True`` additionally returns the serving-form pieces
    (the QEFT kernel's data contract, gemv_cuda_qeft.cu:392 — which the
    reference ships but never compiles): integer codes / per-group
    scale,zero over the PERMUTED non-outlier columns, the permutation,
    and the fp outlier columns (incl. error compensation).
    """
    rows, cols = W.shape
    n_nonout = cols - n_out
    maxq = 2**bits - 1
    Wf = W.astype(jnp.float32)
    H = H.astype(jnp.float32)

    # outlier selection: diag(H) * frobenius quant error (owq.py:199-208)
    fp_scale, fp_zero = find_params_mse_grid(Wf, bits, num=num_boundary)
    W_quant = _quantize_affine_oz(Wf, fp_scale, fp_zero, maxq)
    frob = jnp.sum((Wf - W_quant) ** 2, axis=0)
    h_score = jnp.diag(H) * frob
    desc = jnp.argsort(-h_score)
    outlier_ids = desc[:n_out]
    is_out = jnp.zeros(cols, bool).at[outlier_ids].set(True)
    # non-outliers in original order, outliers appended (owq.py:303-306)
    order = jnp.argsort(is_out, stable=True)
    inv_order = jnp.argsort(order)

    Wp = Wf[:, order]
    Hp = H[order][:, order]

    dead = jnp.diag(Hp) == 0
    Hp = Hp + jnp.diag(jnp.where(dead, 1.0, 0.0))
    Wp = jnp.where(dead[None, :], 0.0, Wp)

    damp = percdamp * jnp.mean(jnp.diag(Hp))
    Hp = Hp + damp * jnp.eye(cols, dtype=jnp.float32)
    L = jnp.linalg.cholesky(Hp)
    Hinv_full = jax.scipy.linalg.cho_solve((L, True),
                                           jnp.eye(cols, dtype=jnp.float32))
    Hinv = jnp.linalg.cholesky(Hinv_full.T).T

    col_iota_blk = jax.lax.broadcasted_iota(jnp.int32, (1, blocksize), 1)
    col_iota_all = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
    n_blocks = -(-n_nonout // blocksize)

    def block_body(blk, carry):
        Wc = carry[0]
        i1 = blk * blocksize
        W1 = jax.lax.dynamic_slice(Wc, (0, i1), (rows, blocksize))
        Hinv1 = jax.lax.dynamic_slice(Hinv, (i1, i1), (blocksize, blocksize))

        def col_body(i, inner):
            W1i, Q1, Qi1, Sc1, Zp1, Err1, scale, zero = inner
            gcol = i1 + i
            valid = gcol < n_nonout

            def refresh(_):
                gstart = (i // group_size) * group_size
                # group window clipped at the outlier boundary (owq.py:360)
                win_mask = (jax.lax.broadcasted_iota(
                    jnp.int32, (group_size,), 0) + i1 + gstart) < n_nonout
                Wg = jax.lax.dynamic_slice(W1i, (0, gstart),
                                           (rows, group_size))
                return find_params_mse_grid(Wg, bits, num=num_boundary,
                                            col_mask=win_mask)

            scale, zero = jax.lax.cond(
                jnp.logical_and(gcol % group_size == 0, valid),
                refresh, lambda _: (scale, zero), None)

            w = jax.lax.dynamic_slice(W1i, (0, i), (rows, 1))
            d = Hinv1[i, i]
            qi = jnp.clip(jnp.round(w / scale) + zero, 0, maxq)
            q = scale * (qi - zero)
            err = jnp.where(valid, (w - q) / d, 0.0)
            row = Hinv1[i, :][None, :]
            upd_mask = jnp.logical_and(col_iota_blk >= i,
                                       col_iota_blk + i1 < n_nonout)
            W1i = W1i - err * jnp.where(upd_mask, row, 0.0)
            Q1 = jnp.where(valid,
                           jax.lax.dynamic_update_slice(Q1, q, (0, i)), Q1)
            Qi1 = jnp.where(valid,
                            jax.lax.dynamic_update_slice(Qi1, qi, (0, i)),
                            Qi1)
            Sc1 = jax.lax.dynamic_update_slice(Sc1, scale, (0, i))
            Zp1 = jax.lax.dynamic_update_slice(Zp1, zero, (0, i))
            Err1 = jax.lax.dynamic_update_slice(Err1, err, (0, i))
            return W1i, Q1, Qi1, Sc1, Zp1, Err1, scale, zero

        init = (W1, jnp.zeros_like(W1), jnp.zeros_like(W1),
                jnp.ones_like(W1), jnp.zeros_like(W1), jnp.zeros_like(W1),
                jnp.ones((rows, 1), jnp.float32),
                jnp.zeros((rows, 1), jnp.float32))
        _, Q1, Qi1, Sc1, Zp1, Err1, _, _ = jax.lax.fori_loop(
            0, blocksize, col_body, init)

        Qc, Qic, Scc, Zpc = carry[1], carry[2], carry[3], carry[4]
        Qc = jax.lax.dynamic_update_slice(Qc, Q1, (0, i1))
        Qic = jax.lax.dynamic_update_slice(Qic, Qi1, (0, i1))
        Scc = jax.lax.dynamic_update_slice(Scc, Sc1, (0, i1))
        Zpc = jax.lax.dynamic_update_slice(Zpc, Zp1, (0, i1))
        i2 = jnp.minimum(i1 + blocksize, n_nonout)
        Hrows = jax.lax.dynamic_slice(Hinv, (i1, 0), (blocksize, cols))
        tail_mask = col_iota_all >= i2
        Wc = Wc - jnp.dot(Err1, Hrows,
                          preferred_element_type=jnp.float32) * tail_mask
        return Wc, Qc, Qic, Scc, Zpc

    Wfin, Q, Qint, Scales, Zeros = jax.lax.fori_loop(
        0, n_blocks, block_body,
        (Wp, jnp.zeros_like(Wp), jnp.zeros_like(Wp), jnp.ones_like(Wp),
         jnp.zeros_like(Wp)))

    # outlier columns: keep fp values incl. error compensation (owq.py:383-386)
    keep_mask = col_iota_all[0] >= n_nonout
    Q = jnp.where(keep_mask[None, :], Wfin, Q)
    Q = Q[:, inv_order]
    if not return_packed:
        return Q.astype(W.dtype)
    return Q.astype(W.dtype), {
        "codes": Qint[:, :n_nonout],          # [rows, n_nonout] ints (f32)
        "scale": Scales[:, :n_nonout],        # per-column (const per group)
        "zero": Zeros[:, :n_nonout],
        "order": order,                       # permuted col -> original col
        "n_nonout": n_nonout,
        "w_out": Wfin[:, n_nonout:],          # [rows, n_out] fp outliers
    }


def owq_quantize_model(
    params: Dict[str, Any],
    cfg: ModelConfig,
    arch: transform.Arch,
    avg_bits: float,
    calib_tokens: np.ndarray,
    group_size: int = 128,
    percdamp: float = 0.01,
    batch_size: int = 8,
    compute_dtype=jnp.float32,
    progress: bool = False,
    packed: bool = False,
) -> Dict[str, Any]:
    """Sequential block-by-block OWQ over the whole model (owq.py:98-240).

    ``packed=True`` realizes each linear as an :class:`OWQLinear`
    (packed serving form, see ``owq_pack``) instead of a fake-quant
    DenseLinear; state propagation still uses the fake-quant weights so
    the sequential quantization order matches the eval path exactly."""
    n_out_dict = compute_n_out(cfg, avg_bits, group_size)
    out_layers = []
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
    n_tokens = n * S

    for li, layer in enumerate(params["layers"]):
        hessians = {name: jnp.zeros((cfg.linear_shape(name)[1],) * 2,
                                    jnp.float32) for name in LINEAR_NAMES}
        for x in states:
            _, caps = calib.run_block(layer, cfg, x, cos, sin, mask,
                                      capture=True,
                                      compute_dtype=compute_dtype)
            for name, h in calib.accumulate_hessians(caps).items():
                hessians[name] = hessians[name] + h

        new_layer = dict(layer)
        packed_layer = dict(layer)
        for name in LINEAR_NAMES:
            p = layer[name]
            bits = int(round(arch["linear"][name][li]))
            H = hessians[name] * (2.0 / n_tokens)
            if packed:
                from ..models.linear import OWQLinear
                Q, pk = owq_pack(p.weight, H, bits,
                                 n_out=n_out_dict[name],
                                 group_size=group_size,
                                 percdamp=percdamp)
                packed_layer[name] = OWQLinear(packed=pk, bias=p.bias)
            else:
                Q = owq_quantize_weight(p.weight, H, bits,
                                        n_out=n_out_dict[name],
                                        group_size=group_size,
                                        percdamp=percdamp)
            new_layer[name] = DenseLinear(weight=Q, bias=p.bias)
            if progress:
                print(f"owq block {li} {name}: bits={bits} "
                      f"n_out={n_out_dict[name]}", flush=True)
        states = [calib.run_block(new_layer, cfg, x, cos, sin, mask,
                                  capture=False,
                                  compute_dtype=compute_dtype)[0]
                  for x in states]
        # park the quantized block on host (see gptq_quantize_model)
        out_layers.append(calib.layer_to_host(
            packed_layer if packed else new_layer))

    out = dict(params)
    out["layers"] = out_layers
    return out


# ---------------------------------------------------------------------------
# packed OWQ serving form (the QEFT kernel's data contract —
# ft/quantization_new/gemv/gemv_cuda_qeft.cu:392, which the reference
# ships but never compiles or binds; here it is a first-class serving
# path: fused dequant-GEMV over the packed non-outlier columns + a dense
# fp16 tail matmul over the outlier columns)

import dataclasses as _dc

from ..core import bitpack as _bitpack
from ..core.quantize import QuantizedTensor


@jax.tree_util.register_dataclass
@_dc.dataclass
class OWQPacked:
    """One linear in OWQ serving form.

    ``qt`` covers the permuted non-outlier input columns (padded to a
    group multiple with zero-dequant codes); ``w_out`` holds the fp
    outlier columns (with GPTQ error compensation baked in).

    The permutation is STATIC metadata, not a device array: OWQ's stable
    argsort keeps non-outliers in original order, so compacting x is a
    concatenation of the contiguous ``segments`` between outlier columns
    — static slices the compiler turns into copies.  A runtime
    ``jnp.take`` gather of the 4096-wide x was measured at ~450 us/GEMV
    on v5e (30x the packed body itself, scripts/bench_owq.py) — dynamic
    gathers are the one thing this backend cannot stream.
    """

    qt: QuantizedTensor
    w_out: jnp.ndarray     # [n_out, N]
    #: static: contiguous (start, stop) runs of non-outlier input columns
    segments: tuple = _dc.field(metadata=dict(static=True))
    #: static: original indices of the outlier columns, ascending
    out_ids: tuple = _dc.field(metadata=dict(static=True))


def owq_pack(W: jnp.ndarray, H: jnp.ndarray, bits: int, n_out: int,
             group_size: int = 128, percdamp: float = 0.01) -> tuple:
    """Quantize + produce the packed serving form.  Returns
    (fake-quant W for eval parity, OWQPacked)."""
    rows, cols = W.shape
    n_nonout = cols - n_out
    Q, parts = owq_quantize_weight(W, H, bits, n_out,
                                   group_size=group_size,
                                   percdamp=percdamp,
                                   return_packed=True)
    Kp = -(-n_nonout // group_size) * group_size
    codes = np.zeros((rows, Kp), np.uint32)
    codes[:, :n_nonout] = np.asarray(parts["codes"], np.float32).astype(
        np.uint32)
    # per-group scale/zero: constant within each (clipped) group window
    n_groups = Kp // group_size
    sc = np.ones((rows, n_groups), np.float32)
    zp = np.zeros((rows, n_groups), np.float32)
    sc_cols = np.asarray(parts["scale"], np.float32)
    zp_cols = np.asarray(parts["zero"], np.float32)
    for gidx in range(-(-n_nonout // group_size)):
        sc[:, gidx] = sc_cols[:, gidx * group_size]
        zp[:, gidx] = zp_cols[:, gidx * group_size]

    codes_kn = jnp.asarray(codes.T)                    # [Kp, N]
    superblock = _bitpack.pick_superblock(Kp, group_size)
    packed = _bitpack.pack(codes_kn, bits, superblock)
    qt = QuantizedTensor(
        packed=packed,
        scale=jnp.asarray(sc.T),                       # [Kp/g, N]
        zero=jnp.asarray(zp.T),
        nbits=bits, group_size=group_size, shape=(rows, Kp),
        superblock=superblock)

    order = np.asarray(parts["order"])
    out_ids = np.sort(order[n_nonout:]).astype(int)
    w_out_perm = np.argsort(order[n_nonout:])          # reorder to ascending
    w_out = jnp.asarray(np.asarray(parts["w_out"]).T[w_out_perm])  # [n_out, N]
    return Q, OWQPacked(qt=qt, w_out=w_out,
                        segments=outlier_segments(out_ids, cols),
                        out_ids=tuple(int(i) for i in out_ids))


def outlier_segments(out_ids, n_cols: int) -> tuple:
    """Contiguous (start, stop) runs of non-outlier columns, in order."""
    segs, start = [], 0
    for i in sorted(int(i) for i in out_ids):
        if i > start:
            segs.append((start, i))
        start = i + 1
    if start < n_cols:
        segs.append((start, n_cols))
    return tuple(segs)


def owq_matmul(x: jnp.ndarray, p: OWQPacked, out_dtype=None,
               use_kernel: bool = True) -> jnp.ndarray:
    """``x @ W_owq.T`` in packed serving form: fused dequant-GEMV over the
    compacted non-outlier columns + dense tail matmul on the outliers.

    Compaction is a concatenation of static slices (no gather — see
    OWQPacked); the pad columns are explicit zeros, so their packed codes
    (which share the last real group's zero point) contribute nothing.
    """
    from ..ops.quant_matmul import quant_matmul, quant_matmul_reference

    Kp = p.qt.in_features
    parts = [jax.lax.slice_in_dim(x, a, b, axis=-1) for a, b in p.segments]
    n_nonout = sum(b - a for a, b in p.segments)
    if Kp > n_nonout:
        parts.append(jnp.zeros((*x.shape[:-1], Kp - n_nonout), x.dtype))
    x_main = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    mm = quant_matmul if use_kernel else quant_matmul_reference
    y = mm(x_main, p.qt)
    if p.out_ids:
        x_out = jnp.concatenate(
            [jax.lax.slice_in_dim(x, i, i + 1, axis=-1) for i in p.out_ids],
            axis=-1)
        y = y + jnp.dot(x_out.astype(y.dtype), p.w_out.astype(y.dtype),
                        preferred_element_type=jnp.float32).astype(y.dtype)
    return y.astype(out_dtype or x.dtype)
