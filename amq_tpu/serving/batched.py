"""Slot-batched decoding: per-sequence cache lengths for continuous batching.

The single-sequence engine carries one scalar cache length; continuous
batching needs every slot at its own position.  This module provides:

* :class:`SlotCache` — KV buffers ``[L, B, T, kv, hd]`` + ``lengths [B]``,
* :func:`prefill_slot` — run one prompt (batch 1) and scatter its KV into
  a slot (jitted per bucketed prompt length),
* :func:`decode_step` — one token for ALL slots: per-slot rope positions,
  per-slot causal masks, per-slot cache writes (vmapped scatter); idle
  slots are masked no-ops,
* :class:`SlotEngine` — ties the above to the C++/Python batching
  scheduler for a run-to-completion serving loop.

The reference has no analogue (its serving path is single-request
``generate``, ftllama_generate.py); this is the "continuous batching
across hosts" BASELINE requirement's single-host core.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig
from ..models.linear import kernel_linears
from ..models.stacked import (StackedModel, forward_stacked, _apply_site,
                              _apply_down_swiglu, _apply_mlp_merged)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SlotCache:
    k: jnp.ndarray        # [L, B, kv, T, hd]
    v: jnp.ndarray
    lengths: jnp.ndarray  # [B] int32

    @classmethod
    def create(cls, cfg: ModelConfig, n_slots: int, max_len: int,
               dtype=jnp.bfloat16) -> "SlotCache":
        shape = (cfg.num_layers, n_slots, cfg.num_kv_heads, max_len,
                 cfg.head_dim_)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   lengths=jnp.zeros((n_slots,), jnp.int32))


def _model_forward(model, cfg, tokens, cache: Optional[llama.KVCache],
                   compute_dtype):
    if isinstance(model, StackedModel):
        return forward_stacked(model, cfg, tokens, cache=cache,
                               compute_dtype=compute_dtype)
    return llama.forward(model, cfg, tokens, cache=cache,
                         compute_dtype=compute_dtype)


@partial(jax.jit, static_argnames=("cfg", "slot_len", "compute_dtype", "impl"),
         donate_argnames=("cache",))
def prefill_slot(model, cfg: ModelConfig, tokens: jnp.ndarray,  # [1, S] padded
                 true_len: jnp.ndarray,   # scalar int32, <= S
                 cache: SlotCache, slot: jnp.ndarray,
                 slot_len: int, compute_dtype=jnp.bfloat16,
                 impl=None):
    """Prefill one slot from a right-padded prompt bucket.

    Causality makes right-padding exact: real positions never attend the
    pad tail, the next token is read at ``true_len - 1``, and the slot
    length masks the pad KV entries out of later decode steps.
    """
    S = tokens.shape[1]
    assert S == slot_len
    tmp = llama.KVCache(
        k=jnp.zeros_like(cache.k[:, :1, :, :S]),
        v=jnp.zeros_like(cache.v[:, :1, :, :S]),
        length=jnp.int32(0))
    with kernel_linears(impl):
        logits, tmp = _model_forward(model, cfg, tokens, tmp, compute_dtype)
    k = jax.lax.dynamic_update_slice(
        cache.k, tmp.k, (0, slot, 0, 0, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, tmp.v, (0, slot, 0, 0, 0))
    lengths = cache.lengths.at[slot].set(true_len)
    last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1, 0, False)
    nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)[None]
    return nxt, SlotCache(k=k, v=v, lengths=lengths)


@partial(jax.jit, static_argnames=("cfg", "win_len", "compute_dtype", "impl"),
         donate_argnames=("cache",))
def prefill_chunk(model, cfg: ModelConfig,
                  tokens: jnp.ndarray,     # [1, C] right-padded chunk
                  true_new: jnp.ndarray,   # scalar int32: valid tokens, >= 1
                  offset: jnp.ndarray,     # scalar int32: slot length so far
                  cache: SlotCache, slot: jnp.ndarray,
                  win_len: int, compute_dtype=jnp.bfloat16, impl=None):
    """Advance one slot's prefill by a chunk of C prompt tokens.

    Chunked prefill (Sarathi/vLLM-style): long prompts are prefilled in
    fixed-size chunks so the serving loop can decode active slots between
    chunks — a 2048-token arrival stalls decode by one chunk, not one
    full prefill.  The scheduler's admission budget
    (native/amq_native.cpp fill2) bounds how much prefill is admitted per
    iteration; this bounds the dispatch granularity of executing it.

    The chunk attends the slot's own cache prefix: a ``win_len``-sized
    window of the slot (static size, ≥ offset + C) is sliced out, run as
    an append-only KVCache at ``length=offset``, and pasted back.  Pad
    tokens beyond ``true_new`` write garbage KV past the new length —
    masked out by ``lengths`` and overwritten by the next chunk (exact
    under causal masking, as in :func:`prefill_slot`).

    Returns (next_token [1] — meaningful only on the final chunk, cache).
    """
    L, _, kv, T, hd = cache.k.shape
    assert win_len <= T
    k_win = jax.lax.dynamic_slice(
        cache.k, (0, slot, 0, 0, 0), (L, 1, kv, win_len, hd))
    v_win = jax.lax.dynamic_slice(
        cache.v, (0, slot, 0, 0, 0), (L, 1, kv, win_len, hd))
    tmp = llama.KVCache(k=k_win, v=v_win, length=offset)
    with kernel_linears(impl):
        logits, tmp = _model_forward(model, cfg, tokens, tmp, compute_dtype)
    k = jax.lax.dynamic_update_slice(cache.k, tmp.k, (0, slot, 0, 0, 0))
    v = jax.lax.dynamic_update_slice(cache.v, tmp.v, (0, slot, 0, 0, 0))
    lengths = cache.lengths.at[slot].set(offset + true_new)
    last = jax.lax.dynamic_index_in_dim(logits[0], true_new - 1, 0, False)
    nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)[None]
    return nxt, SlotCache(k=k, v=v, lengths=lengths)


def _decode_once(model: StackedModel, cfg: ModelConfig,
                 tokens: jnp.ndarray,        # [B] int32 (one per slot)
                 active: jnp.ndarray,        # [B] bool
                 cache: SlotCache,
                 compute_dtype=jnp.bfloat16,
                 impl=None):
    """One decode token for every active slot.  Returns (next [B], cache)."""
    B = tokens.shape[0]
    hd = cfg.head_dim_

    x = model.embed[tokens][:, None, :].astype(compute_dtype)  # [B, 1, H]
    positions = cache.lengths[:, None]                          # [B, 1]
    cos, sin = llama.rope_cos_sin(cfg, positions, dtype=compute_dtype)

    fused = "self_attn.qkv_proj" in model.sites
    # flash-decode kernel pays once the cache is longer than the live
    # contexts (clamped DMA); at short max_len the XLA batched einsum's
    # single big stream beats the kernel's per-(slot,head) cells
    # (measured at 8 slots: 211 vs 226 tok/s at T=512, 163 vs 152 at 1024)
    use_attn_kernel = (hd in (64, 128) and impl is not None
                       and jax.default_backend() != "cpu"
                       and cache.k.shape[3] >= 1024
                       and os.environ.get("AMQ_ATTN_KERNEL", "1") != "0")

    uniform = model.uniform_select
    first_site = next(iter(model.select))

    def layer_body(i, x, bit_idx):
        h = llama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(model.input_norm, i, 0, False),
            cfg.rms_norm_eps)
        if fused:
            qkv = _apply_site(model, "self_attn.qkv_proj", i, h,
                              compute_dtype, bit_idx)
            q = qkv[..., :cfg.q_dim]
            kk = qkv[..., cfg.q_dim:cfg.q_dim + cfg.kv_dim]
            vv = qkv[..., cfg.q_dim + cfg.kv_dim:]
        else:
            q = _apply_site(model, "self_attn.q_proj", i, h, compute_dtype,
                            bit_idx)
            kk = _apply_site(model, "self_attn.k_proj", i, h, compute_dtype,
                             bit_idx)
            vv = _apply_site(model, "self_attn.v_proj", i, h, compute_dtype,
                             bit_idx)
        q = llama.apply_rope(q.reshape(B, 1, cfg.num_heads, hd), cos, sin)
        kk = llama.apply_rope(kk.reshape(B, 1, cfg.num_kv_heads, hd), cos, sin)
        kk = jnp.transpose(kk, (0, 2, 1, 3))   # [B, kv, 1, hd]
        vv = jnp.transpose(vv.reshape(B, 1, cfg.num_kv_heads, hd),
                           (0, 2, 1, 3))

        # cache buffers are read-only inside the layer scan; attention
        # takes per-slot offsets (lengths) and this step's keys directly
        # — no per-layer buffer round trip
        if use_attn_kernel:
            from ..ops.decode_attention import decode_attention_indexed
            Hkv = cfg.num_kv_heads
            G = cfg.num_heads // Hkv
            att = decode_attention_indexed(
                q.reshape(B, Hkv, G, hd), cache.k, cache.v,
                kk.reshape(B, Hkv, hd), vv.reshape(B, Hkv, hd),
                cache.lengths, i, window=cfg.sliding_window,
                out_dtype=compute_dtype).reshape(B, 1, cfg.num_heads, hd)
        else:
            k_c = jax.lax.dynamic_index_in_dim(cache.k, i, 0, False)
            v_c = jax.lax.dynamic_index_in_dim(cache.v, i, 0, False)
            att = llama._attention_split(q, k_c, v_c, kk, vv, cache.lengths,
                                         cfg.sliding_window, compute_dtype)
        att = att.reshape(B, 1, cfg.num_heads * hd)
        o = _apply_site(model, "self_attn.o_proj", i, att, compute_dtype,
                        bit_idx)
        x = x + o

        h = llama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(model.post_norm, i, 0, False),
            cfg.rms_norm_eps)
        down = (_apply_mlp_merged(model, i, h, compute_dtype, bit_idx)
                if fused else None)
        if down is None:
            if fused:
                gu = _apply_site(model, "mlp.gateup_proj", i, h,
                                 compute_dtype, bit_idx)
                gate = gu[..., :cfg.intermediate_size]
                up = gu[..., cfg.intermediate_size:]
            else:
                gate = _apply_site(model, "mlp.gate_proj", i, h,
                                   compute_dtype, bit_idx)
                up = _apply_site(model, "mlp.up_proj", i, h, compute_dtype,
                                 bit_idx)
            down = _apply_down_swiglu(model, i, gate, up, compute_dtype,
                                      bit_idx)
        x = x + down
        return x, kk.astype(cache.k.dtype), vv.astype(cache.v.dtype)

    def layer_fn(x, i):
        if uniform:
            # one whole-layer switch instead of 4 per-site switches (conds
            # cost ~10s of us each inside the decode scan on this backend)
            x, kk, vv = jax.lax.switch(
                model.select[first_site][i],
                [(lambda b: lambda op: layer_body(op[0], op[1], b))(b)
                 for b in range(len(model.bits_range))],
                (i, x))
        else:
            x, kk, vv = layer_body(i, x, None)
        return x, (kk, vv)

    with kernel_linears(impl):
        x, (k_app, v_app) = jax.lax.scan(
            layer_fn, x, jnp.arange(model.num_layers, dtype=jnp.int32))

    # ONE per-slot append of the new keys [L,B,kv,1,hd] at each slot's
    # own position (vmapped over slots)
    def write_all(buf, new, pos):
        return jax.vmap(
            lambda b, n, p: jax.lax.dynamic_update_slice(b, n, (0, 0, p, 0)),
            in_axes=(1, 1, 0), out_axes=1)(buf, new, pos)

    k_all = write_all(cache.k, k_app, cache.lengths)
    v_all = write_all(cache.v, v_app, cache.lengths)

    x = llama.rms_norm(x, model.final_norm, cfg.rms_norm_eps)
    from ..models.stacked import apply_head
    logits = apply_head(model, x[:, 0], compute_dtype)
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    lengths = jnp.where(active, cache.lengths + 1, cache.lengths)
    return nxt, SlotCache(k=k_all, v=v_all, lengths=lengths)


# the cache is donated at every serving dispatch boundary: without
# donation XLA must materialize a full input-preserving copy of the KV
# buffers [L, B, kv, T, hd] on EVERY call (gigabytes per step at real
# slot counts — the single-sequence engine never pays this because its
# whole generation is one on-device scan)
decode_step = jax.jit(_decode_once,
                      static_argnames=("cfg", "compute_dtype", "impl"),
                      donate_argnames=("cache",))


@partial(jax.jit, static_argnames=("cfg", "n_steps", "compute_dtype", "impl"),
         donate_argnames=("cache",))
def decode_chunk(model: StackedModel, cfg: ModelConfig,
                 tokens: jnp.ndarray, active: jnp.ndarray,
                 cache: SlotCache, n_steps: int,
                 compute_dtype=jnp.bfloat16, impl=None):
    """``n_steps`` decode tokens per slot as ONE dispatch (lax.scan).

    Per-call dispatch costs ~25 ms on the tunneled backend, so the serving
    loop decodes in chunks and does scheduler bookkeeping between chunks;
    slots that finish mid-chunk produce discarded tokens (bounded waste of
    < n_steps per retirement).  Returns (tokens [B, n_steps], cache).
    """
    def step(carry, _):
        tok, cache = carry
        nxt, cache = _decode_once(model, cfg, tok, active, cache,
                                  compute_dtype, impl)
        return (nxt, cache), nxt

    (_, cache), toks = jax.lax.scan(step, (tokens, cache), None,
                                    length=n_steps)
    return jnp.moveaxis(toks, 0, 1), cache


class SlotEngine:
    """Continuous-batching serving loop over a StackedModel."""

    def __init__(self, model: StackedModel, cfg: ModelConfig,
                 n_slots: int = 4, max_len: int = 2048,
                 compute_dtype=jnp.bfloat16, use_pallas: bool = True,
                 prefill_buckets=(32, 64, 128, 256, 512, 1024, 2048),
                 chunk_steps: int = 1,
                 prefill_chunk_len: Optional[int] = None):
        from .engine import pallas_linear_impl
        self.model = model
        self.cfg = cfg
        self.n_slots = n_slots
        self.max_len = max_len
        self.compute_dtype = compute_dtype
        self.impl = pallas_linear_impl if use_pallas else None
        self.buckets = tuple(sorted(prefill_buckets))
        self.chunk_steps = chunk_steps
        #: chunked prefill: prompts longer than this are prefilled
        #: ``prefill_chunk_len`` tokens at a time, one chunk per serving
        #: iteration, so active slots keep decoding between chunks
        #: (None = whole-prompt prefill in one dispatch)
        self.prefill_chunk_len = prefill_chunk_len
        self.cache = SlotCache.create(cfg, n_slots, max_len,
                                      dtype=compute_dtype)
        self.next_token = np.zeros(n_slots, np.int32)
        # slot -> (prompt np.ndarray, done_len) for in-flight chunked
        # prefills; such slots are excluded from decode until complete
        self._prefilling: Dict[int, tuple] = {}

    def _bucket(self, S: int) -> int:
        for b in self.buckets:
            if S <= b:
                return b
        raise ValueError(f"prompt too long: {S} > {self.buckets[-1]}")

    def prefill(self, slot: int, prompt: np.ndarray):
        S = len(prompt)
        bucket = self._bucket(S)
        padded = np.zeros(bucket, np.int32)
        padded[:S] = prompt  # right-pad (exact under causal masking)
        nxt, self.cache = prefill_slot(
            self.model, self.cfg, jnp.asarray(padded)[None],
            jnp.int32(S), self.cache, jnp.int32(slot), slot_len=bucket,
            compute_dtype=self.compute_dtype, impl=self.impl)
        self.next_token[slot] = int(nxt[0])

    def start_prefill(self, slot: int, prompt: np.ndarray) -> bool:
        """Begin a slot's prefill.  Returns True when it completed now
        (unchunked path or short prompt); False when the prompt exceeds
        ``prefill_chunk_len`` and will advance chunk-by-chunk via
        :meth:`advance_prefills` while other slots keep decoding."""
        C = self.prefill_chunk_len
        if C is None or len(prompt) <= C:
            self.prefill(slot, prompt)
            return True
        # reset the slot length; chunks append from offset 0
        self.cache = dataclasses.replace(
            self.cache, lengths=self.cache.lengths.at[slot].set(0))
        self._prefilling[slot] = (np.asarray(prompt, np.int32), 0)
        return False

    def advance_prefills(self) -> List[int]:
        """Advance every in-flight chunked prefill by ONE chunk; returns
        the slots whose prefill completed this call (their first
        generated token is in ``next_token``)."""
        C = self.prefill_chunk_len
        done = []
        for slot in list(self._prefilling):
            prompt, off = self._prefilling[slot]
            S = len(prompt)
            n_new = min(C, S - off)
            chunk = np.zeros(C, np.int32)
            chunk[:n_new] = prompt[off:off + n_new]
            # static window size from the prefill buckets (one compile per
            # (bucket, C) pair)
            win = min(self._bucket(off + n_new), self.cache.k.shape[3])
            nxt, self.cache = prefill_chunk(
                self.model, self.cfg, jnp.asarray(chunk)[None],
                jnp.int32(n_new), jnp.int32(off), self.cache,
                jnp.int32(slot), win_len=win,
                compute_dtype=self.compute_dtype, impl=self.impl)
            off += n_new
            if off >= S:
                self.next_token[slot] = int(nxt[0])
                del self._prefilling[slot]
                done.append(slot)
            else:
                self._prefilling[slot] = (prompt, off)
        return done

    def step(self, active_mask: np.ndarray) -> np.ndarray:
        nxt, self.cache = decode_step(
            self.model, self.cfg, jnp.asarray(self.next_token),
            jnp.asarray(active_mask), self.cache,
            compute_dtype=self.compute_dtype, impl=self.impl)
        out = np.asarray(nxt)
        self.next_token = np.where(active_mask, out, self.next_token)
        return out

    def step_chunk(self, active_mask: np.ndarray, n_steps: int) -> np.ndarray:
        toks, self.cache = decode_chunk(
            self.model, self.cfg, jnp.asarray(self.next_token),
            jnp.asarray(active_mask), self.cache, n_steps=n_steps,
            compute_dtype=self.compute_dtype, impl=self.impl)
        out = np.asarray(toks)  # [B, n_steps]
        self.next_token = np.where(active_mask, out[:, -1], self.next_token)
        return out

    def run(self, batcher, max_steps: int = 10_000) -> Dict[int, List[int]]:
        """Drive requests from a ContinuousBatcher to completion."""
        results: Dict[int, List[int]] = {}
        steps = 0
        while batcher.has_work() and steps < max_steps:
            # higher-priority pending requests may evict active slots; the
            # victims rejoin the queue and are re-prefilled on re-admission
            preempt = getattr(batcher, "preempt", None)
            if preempt is not None:
                preempt()
            for slot, req in batcher.fill_slots():
                # resumed victims re-prefill prompt + tokens generated
                # before eviction (their KV state was released with the
                # slot)
                toks = (np.concatenate(
                    [req.prompt, np.asarray(req.generated, np.int32)])
                    if req.generated else req.prompt)
                if self.start_prefill(slot, toks):
                    # the prefill's prediction is the first generated token
                    fin = batcher.prefill_bookkeeping(
                        slot, self.next_token[slot])
                    if fin is not None:
                        results[fin.uid] = fin.generated
            # in-flight chunked prefills advance ONE chunk per iteration;
            # slots still prefilling sit out this iteration's decode
            for slot in self.advance_prefills():
                fin = batcher.prefill_bookkeeping(slot,
                                                  self.next_token[slot])
                if fin is not None:
                    results[fin.uid] = fin.generated
            active = np.array([
                s is not None and i not in self._prefilling
                for i, s in enumerate(batcher.slots)])
            if not active.any():
                # every decodable slot retired at prefill (or is still
                # prefilling); queued requests may remain — keep looping
                steps += 1
                continue
            if self.chunk_steps > 1:
                toks = self.step_chunk(active, self.chunk_steps)
                for j in range(toks.shape[1]):
                    for req in batcher.step_bookkeeping(
                            np.where(active, toks[:, j], -1)):
                        results[req.uid] = req.generated
                    # slots retired mid-chunk: their remaining columns are
                    # discarded; refills happen at the next outer iteration
                    active = np.array([s is not None for s in batcher.slots])
                    if not active.any():
                        break
            else:
                toks = self.step(active)
                for req in batcher.step_bookkeeping(
                        np.where(active, toks, -1)):
                    results[req.uid] = req.generated
            steps += 1
        return results
