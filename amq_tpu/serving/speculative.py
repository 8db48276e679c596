"""Speculative (assisted) decoding, fully on device.

Re-expression of the reference's patched ``_assisted_decoding``
(monkeypatch/ftllama_generate.py:343-611: candidate generation +
prefix-match acceptance + acceptance-rate stats) as a single jitted
``lax.while_loop`` — no host round trip per speculation round (the axon
dispatch latency makes the reference's per-round Python loop a non-starter
on TPU).

Greedy acceptance: the draft proposes ``gamma`` tokens autoregressively;
the target scores all ``gamma+1`` positions in ONE forward (same HBM
traffic as a single decode step for weight-bound models — that is the
speedup); the accepted prefix is the longest match with the target's
argmax chain, plus one corrected bonus token.

A natural TPU-native draft is the *2-bit proxy of the same model* — the
search already produces it, and it shares the tokenizer by construction.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig
from ..models.linear import kernel_linears


@dataclasses.dataclass
class SpecStats:
    tokens: int
    rounds: int
    accepted: int

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(1, self.rounds)


def _forward(params, cfg, tokens, cache, compute_dtype):
    from ..models.stacked import StackedModel, forward_stacked
    if isinstance(params, StackedModel):
        return forward_stacked(params, cfg, tokens, cache=cache,
                               compute_dtype=compute_dtype)
    return llama.forward(params, cfg, tokens, cache=cache,
                         compute_dtype=compute_dtype)


@partial(jax.jit, static_argnames=("t_cfg", "d_cfg", "gamma", "max_new",
                                   "compute_dtype", "impl"),
         donate_argnames=("t_cache", "d_cache"))
def speculative_decode(
    t_params, d_params,
    t_cfg: ModelConfig, d_cfg: ModelConfig,
    first_token: jnp.ndarray,        # [1] int32 (from target prefill)
    t_cache: llama.KVCache,
    d_cache: llama.KVCache,
    gamma: int = 4,
    max_new: int = 128,
    compute_dtype=jnp.bfloat16,
    impl: Callable = None,
):
    """Greedy speculative generation (batch 1).  Returns
    (tokens [1, max_new], n_rounds, n_accepted_draft)."""

    n_rounds_max = max_new  # worst case: 1 token per round

    def round_body(state):
        tok, t_cache, d_cache, out, n_out, rounds, accepted = state

        # --- draft: gamma+1 autoregressive steps (the extra step makes
        # the draft consume d_gamma too, so its cache never has a hole
        # when the whole draft block is accepted) ----------------------
        def d_step(carry, _):
            dtok, d_cache = carry
            with kernel_linears(impl):
                logits, d_cache = _forward(d_params, d_cfg, dtok[:, None],
                                           d_cache, compute_dtype)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, d_cache), nxt

        (last_d, d_cache), drafts_all = jax.lax.scan(
            d_step, (tok, d_cache), None, length=gamma + 1)
        drafts = jnp.moveaxis(drafts_all, 0, 1)[:, :gamma]   # [1, gamma]

        # --- target scores [tok, d_1..d_gamma] in one forward ----------
        t_in = jnp.concatenate([tok[:, None], drafts], axis=1)  # [1, g+1]
        with kernel_linears(impl):
            t_logits, t_cache = _forward(t_params, t_cfg, t_in, t_cache,
                                         compute_dtype)
        t_pred = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)  # [1, g+1]

        # --- prefix-match acceptance ----------------------------------
        match = (drafts == t_pred[:, :gamma])[0]                 # [gamma]
        n_acc = jnp.argmin(jnp.concatenate(
            [match, jnp.array([False])]).astype(jnp.int32))      # first False
        # emitted tokens this round: d_1..d_n_acc then t_pred[n_acc]
        # (drafts_all is gamma+1 long; its last entry is never selected
        # because the draft branch needs idx < n_acc <= gamma)
        emit = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (gamma + 1,), 0) < n_acc,
            jnp.moveaxis(drafts_all, 0, 1)[0], t_pred[0])        # [gamma+1]
        n_emit = jnp.minimum(n_acc + 1, max_new - n_out)

        # full-width masked write (a clipped scatter would hit duplicate
        # indices at the buffer tail and lose the final token)
        pos = jax.lax.broadcasted_iota(jnp.int32, (max_new,), 0)
        rel = pos - n_out
        vals = emit[jnp.clip(rel, 0, gamma)]
        write = jnp.logical_and(rel >= 0, rel < n_emit)
        out = jnp.where(write[None, :], vals[None, :], out)

        # --- rewind caches to the accepted frontier -------------------
        # both models have consumed everything before the next input token
        new_len = t_cache.length - (gamma + 1) + n_acc + 1
        t_cache = llama.KVCache(k=t_cache.k, v=t_cache.v, length=new_len)
        d_cache = llama.KVCache(k=d_cache.k, v=d_cache.v, length=new_len)

        tok = emit[jnp.maximum(n_emit - 1, 0)][None]
        return (tok, t_cache, d_cache, out, n_out + n_emit, rounds + 1,
                accepted + n_acc)

    def cond(state):
        _, _, _, _, n_out, rounds, _ = state
        return jnp.logical_and(n_out < max_new, rounds < n_rounds_max)

    out0 = jnp.zeros((1, max_new), jnp.int32)
    state = (first_token, t_cache, d_cache, out0,
             jnp.int32(0), jnp.int32(0), jnp.int32(0))
    tok, t_cache, d_cache, out, n_out, rounds, accepted = (
        jax.lax.while_loop(cond, round_body, state))
    return out, rounds, accepted


class SpeculativeEngine:
    """Target + draft pair with shared tokenizer (e.g. mixed-bit target and
    its own 2-bit proxy as draft)."""

    def __init__(self, target_engine, draft_params, draft_cfg=None,
                 gamma: int = 4):
        self.t = target_engine
        self.d_params = draft_params
        self.d_cfg = draft_cfg or target_engine.cfg
        self.gamma = gamma

    def generate(self, prompt: np.ndarray, max_new_tokens: int = 128
                 ) -> Tuple[np.ndarray, SpecStats]:
        eng = self.t
        assert eng.batch_size == 1, "speculative decoding is batch-1"
        t_cache = eng.new_cache()
        d_cache = llama.KVCache.create(self.d_cfg, 1, eng.max_len,
                                       dtype=eng.cache_dtype)
        toks = jnp.asarray(prompt, jnp.int32)
        last, t_cache = eng._prefill(eng.params, toks, t_cache)
        # draft prefills the same prompt: both caches track the sequence
        with kernel_linears(eng._impl):
            _, d_cache = _forward(self.d_params, self.d_cfg, toks,
                                  d_cache, eng.compute_dtype)
        first = jnp.argmax(last, axis=-1).astype(jnp.int32)

        out, rounds, accepted = speculative_decode(
            eng.params, self.d_params, eng.cfg, self.d_cfg, first,
            t_cache, d_cache, gamma=self.gamma, max_new=max_new_tokens - 1,
            compute_dtype=eng.compute_dtype, impl=eng._impl)
        tokens = np.concatenate(
            [np.asarray(first)[:, None], np.asarray(out)], axis=1)
        return tokens, SpecStats(tokens=max_new_tokens,
                                 rounds=int(rounds), accepted=int(accepted))
