"""Quality metrics: JSD-vs-dense loss, perplexity, avg-bits accounting.

Numerics mirror the reference exactly:

* JSD (utils/loss.py:6-14): symmetric KL against the clamped mixture of the
  two softmaxes, ``batchmean`` over token rows,
* eval_loss (utils/eval.py:22-46): per-sample JSD over next-token-shifted
  logits, scaled by ``seqlen * batch`` and renormalized by
  ``len(losses) * seqlen`` after gathering — i.e. the mean per-sample JSD,
* eval_ppl (utils/eval.py:50-75): ``exp(mean cross-entropy)`` over shifted
  logits,
* get_bits_usage (utils/func.py:101-114): per-linear
  ``numel * (bit + 32/group_size)`` summed over blocks, divided by
  ``model_numel`` — the ``32/g`` term is the fp16 scale+zero per group.

Data parallelism: instead of Accelerate's process-sharded loaders +
``gather_for_metrics`` (the reference's only collective use), batches are
sharded over the mesh 'data' axis by NamedSharding and XLA inserts the
reduction collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def jsd(p_logits: jnp.ndarray, q_logits: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Jensen–Shannon divergence between two logit rows ``[..., V]``.

    Returns the mean over all leading dims (torch KLDivLoss 'batchmean'
    over flattened token rows).
    """
    p_log = jax.nn.log_softmax(p_logits.astype(jnp.float32), axis=-1)
    q_log = jax.nn.log_softmax(q_logits.astype(jnp.float32), axis=-1)
    m = jnp.clip(0.5 * (jnp.exp(p_log) + jnp.exp(q_log)), eps, None)
    log_m = jnp.log(m)
    kl_p = jnp.sum(jnp.exp(p_log) * (p_log - log_m), axis=-1)
    kl_q = jnp.sum(jnp.exp(q_log) * (q_log - log_m), axis=-1)
    return 0.5 * jnp.mean(kl_p + kl_q)


def jsd_shifted(lm_logits: jnp.ndarray, dense_logits: jnp.ndarray) -> jnp.ndarray:
    """eval_loss inner step: JSD over ``[:, :-1]`` next-token rows."""
    B, S, V = lm_logits.shape
    p = lm_logits[:, :-1, :].reshape(-1, V)
    q = dense_logits[:, :-1, :].reshape(-1, V)
    return jsd(p, q)


def jsd_shifted_per_sample(lm_logits: jnp.ndarray,
                           dense_logits: jnp.ndarray,
                           chunk: int = 0) -> jnp.ndarray:
    """Per-sample JSD ``[B]`` (each = mean over that sample's token rows).

    Batched evaluation pads the ragged last batch; the caller weight-
    averages the per-sample values over the valid prefix, reproducing the
    reference's mean-per-sample accounting (utils/eval.py:40-44) exactly.

    ``chunk > 0`` computes the divergence in sequence chunks of that many
    rows via ``lax.map`` (serial, O(chunk) temporaries).  The unchunked
    step keeps ~5 live f32 ``[B, S, V]`` buffers — >10 GB at 8x2048x32k —
    which cannot coexist with the three 7B proxy stacks on a 16 GB chip.
    """
    if chunk <= 0:
        p_log = jax.nn.log_softmax(
            lm_logits[:, :-1, :].astype(jnp.float32), -1)
        q_log = jax.nn.log_softmax(
            dense_logits[:, :-1, :].astype(jnp.float32), -1)
        m = jnp.clip(0.5 * (jnp.exp(p_log) + jnp.exp(q_log)), 1e-7, None)
        log_m = jnp.log(m)
        kl_p = jnp.sum(jnp.exp(p_log) * (p_log - log_m), axis=-1)
        kl_q = jnp.sum(jnp.exp(q_log) * (q_log - log_m), axis=-1)
        return 0.5 * jnp.mean(kl_p + kl_q, axis=-1)

    B, S, V = lm_logits.shape
    chunk = min(chunk, S)
    n_rows = S - 1                               # shifted next-token rows
    n_chunk = -(-n_rows // chunk)

    # chunks are sliced straight out of the [B, S, V] inputs (no global
    # transpose/cast copy).  dynamic_slice clamps an out-of-range start to
    # S - chunk, so the final chunk may re-read rows earlier chunks
    # covered: a row contributes iff it is real (< n_rows) and not yet
    # counted (>= this chunk's requested start).
    def one_chunk(start):
        astart = jnp.minimum(start, S - chunk)
        p_c = jax.lax.dynamic_slice_in_dim(lm_logits, astart, chunk, axis=1)
        q_c = jax.lax.dynamic_slice_in_dim(dense_logits, astart, chunk,
                                           axis=1)
        p_log = jax.nn.log_softmax(p_c.astype(jnp.float32), -1)
        q_log = jax.nn.log_softmax(q_c.astype(jnp.float32), -1)
        m = jnp.clip(0.5 * (jnp.exp(p_log) + jnp.exp(q_log)), 1e-7, None)
        log_m = jnp.log(m)
        kl_p = jnp.sum(jnp.exp(p_log) * (p_log - log_m), axis=-1)
        kl_q = jnp.sum(jnp.exp(q_log) * (q_log - log_m), axis=-1)
        idx = astart + jnp.arange(chunk, dtype=jnp.int32)
        valid = ((idx >= start) & (idx < n_rows)).astype(jnp.float32)[None]
        return jnp.sum((kl_p + kl_q) * valid, axis=-1)   # [B] row sums

    starts = jnp.arange(n_chunk, dtype=jnp.int32) * chunk
    sums = jax.lax.map(one_chunk, starts)
    return 0.5 * jnp.sum(sums, axis=0) / n_rows


def cross_entropy_shifted(lm_logits: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """Mean CE of next-token prediction (eval_ppl inner step)."""
    B, S, V = lm_logits.shape
    logp = jax.nn.log_softmax(lm_logits[:, :-1, :].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def cross_entropy_shifted_per_sample(lm_logits: jnp.ndarray,
                                     tokens: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean CE ``[B]`` (see jsd_shifted_per_sample)."""
    logp = jax.nn.log_softmax(lm_logits[:, :-1, :].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll, axis=-1)


def ppl_from_losses(losses: List[float]) -> float:
    """exp(mean per-sample CE) — matches utils/eval.py:72-73 at batch 1."""
    return float(np.exp(np.mean(np.asarray(losses, np.float64))))


def loss_from_losses(losses: List[float]) -> float:
    """Mean per-sample JSD — matches utils/eval.py:43-44 at batch 1."""
    return float(np.mean(np.asarray(losses, np.float64)))


def get_bits_usage(architecture: Dict, config: Dict, group_size: int = 128) -> float:
    """Average bits/weight incl. scale+zero overhead (utils/func.py:101-114)."""
    memory = 0.0
    for linear_group, bits in architecture["linear"].items():
        out_dim, in_dim = config["linear_shape"][linear_group]
        for bit in bits:
            g = in_dim if group_size == -1 else group_size
            b = bit + (32.0 / g if bit < 16 else 0.0)
            memory += int(out_dim) * int(in_dim) * b
    return memory / config["model_numel"]


def get_correlation(prediction, target):
    """RMSE / Spearman rho / Kendall tau (utils/func.py:61-66)."""
    from scipy import stats

    prediction = np.asarray(prediction, np.float64).flatten()
    target = np.asarray(target, np.float64).flatten()
    rmse = float(np.sqrt(((prediction - target) ** 2).mean()))
    rho, _ = stats.spearmanr(prediction, target)
    tau, _ = stats.kendalltau(prediction, target)
    return rmse, float(rho), float(tau)
