"""Serving engine: jitted prefill/decode with a packed mixed-bit model.

Replaces the reference's serving stack — FT-Llama monkeypatch decode path
(monkeypatch/ftllama_modeling.py), patched HF ``generate``
(ftllama_generate.py), and the per-layer CUDA kernel dispatch — with a
functional design:

* the whole decode step (all layers, attention, sampling) is ONE jitted
  function; generation runs as a ``lax.scan`` over steps *on device*, so
  per-token host round trips (the reference's per-layer Python->CUDA
  crossings, amq_speed_benchmark call stack) disappear entirely,
* mixed-bit weights stay packed (:class:`QuantLinear` leaves); each layer
  applies the fused Pallas dequant-matmul specialized to that layer's
  nbits at trace time — the mixed-bit "stitching" is just which params
  live in the pytree (cf. setattr-stitching, amq_speed_benchmark.py:233-251),
* the KV cache is a preallocated functional carry (KVCache),
* continuous batching: slot-based batch manager; finished sequences'
  slots are refilled and the same jitted step keeps serving (the
  reference has no analogue — single-request generate only).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig
from ..models.linear import QuantLinear, kernel_linears
from ..ops.quant_matmul import quant_matmul


def pallas_linear_impl(p: QuantLinear, x: jnp.ndarray, compute_dtype):
    """QuantLinear application through the fused Pallas kernel."""
    y = quant_matmul(x, p.qt, out_dtype=compute_dtype)
    if p.bias is not None:
        y = y + p.bias.astype(y.dtype)
    return y


@dataclasses.dataclass
class Engine:
    """Single-host serving engine over a (possibly quantized) param pytree."""

    params: Dict[str, Any]
    cfg: ModelConfig
    batch_size: int = 1
    max_len: int = 2048
    compute_dtype: Any = jnp.bfloat16
    use_pallas: bool = True
    cache_dtype: Any = jnp.bfloat16
    #: override the forward: (params, tokens, cache) -> (logits, cache) —
    #: e.g. the shard_map-ped TP forward (parallel/tp_stacked.make_tp_engine)
    forward_fn: Optional[Any] = None
    #: override KV-cache construction (sharded caches for mesh serving)
    cache_factory: Optional[Any] = None

    def __post_init__(self):
        self._impl = pallas_linear_impl if self.use_pallas else None
        # NO cache donation here: on this single-stream engine donation
        # forces XLA layout copies ("Some donated buffers were not
        # usable") and was measured at 143.9 vs 172.4 tok/s on-chip
        # (round-4 bisect, commit 3257215).  Donation stays only on the
        # slot/DP engines (serving/batched.py, serving/dp.py) whose
        # per-call jits actually paid a 2 GB cache copy per dispatch.
        self._prefill = jax.jit(self._prefill_impl)
        self._decode_n = jax.jit(self._decode_n_impl,
                                 static_argnames=("n_steps",))
        # prefill + argmax as ONE dispatch (TTFT's timed unit: a 4-byte
        # token pull instead of a ~10 ms [1, V] logits row on tunneled
        # backends).  The cache is a live output — returning only the
        # token would let XLA dead-code-eliminate every KV-cache write
        # and time a prefill no decode could follow.
        self._prefill_token = jax.jit(self._prefill_token_impl)

    def new_cache(self) -> llama.KVCache:
        if self.cache_factory is not None:
            return self.cache_factory()
        return llama.KVCache.create(self.cfg, self.batch_size, self.max_len,
                                    dtype=self.cache_dtype)

    def _forward(self, params, tokens, cache):
        from ..models.stacked import StackedModel, forward_stacked
        if self.forward_fn is not None:
            return self.forward_fn(params, tokens, cache)
        if isinstance(params, StackedModel):
            return forward_stacked(params, self.cfg, tokens, cache=cache,
                                   compute_dtype=self.compute_dtype)
        return llama.forward(params, self.cfg, tokens, cache=cache,
                             compute_dtype=self.compute_dtype)

    # -- jitted bodies (kernel routing is decided at trace time) -----------

    def _prefill_impl(self, params, tokens, cache):
        with kernel_linears(self._impl):
            logits, cache2 = self._forward(params, tokens, cache)
        return logits[:, -1, :], cache2

    def _prefill_token_impl(self, params, tokens, cache):
        last, cache = self._prefill_impl(params, tokens, cache)
        return jnp.argmax(last, axis=-1).astype(jnp.int32), cache

    def _decode_n_impl(self, params, first_token, cache, n_steps: int):
        """Greedy-decode ``n_steps`` tokens as an on-device scan."""
        def step(carry, _):
            tok, cache = carry
            with kernel_linears(self._impl):
                logits, cache = self._forward(params, tok[:, None], cache)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt

        (_, cache), toks = jax.lax.scan(
            step, (first_token, cache), None, length=n_steps)
        return jnp.moveaxis(toks, 0, 1), cache  # [B, n_steps]

    # -- public API --------------------------------------------------------

    def generate(self, prompt_tokens: np.ndarray, max_new_tokens: int = 128
                 ) -> np.ndarray:
        """Greedy generation; prompt [B, S] -> [B, max_new_tokens]."""
        B, S = prompt_tokens.shape
        assert B == self.batch_size
        cache = self.new_cache()
        # _prefill_token keeps the argmax on device: one dispatch, and the
        # host pulls 4 bytes instead of a [B, V] logits row (~10 ms on
        # tunneled backends) — same rationale as the TTFT path.
        first, cache = self._prefill_token(
            self.params, jnp.asarray(prompt_tokens, jnp.int32), cache)
        rest, _ = self._decode_n(self.params, first, cache,
                                 n_steps=max_new_tokens - 1)
        return np.concatenate([np.asarray(first)[:, None], np.asarray(rest)],
                              axis=1)


# ---------------------------------------------------------------------------
# continuous batching

@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray          # [S]
    max_new_tokens: int
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    priority: int = 0           # higher = served first (0 = default class)
    _seq: int = -1              # submission order (set by the batcher)


class ContinuousBatcher:
    """Slot-based continuous batching driver.

    Sequences occupy fixed KV-cache slots; every engine step decodes one
    token for all active slots, finished slots are refilled from the
    queue.  The jitted step function has a fixed batch shape, so
    arrivals/departures never retrace.

    Scheduling policy (native/amq_native.cpp `Scheduler` v2, mirrored by
    the pure-Python path):

    * priority classes — the queue is served (priority desc, FCFS within
      a class),
    * chunked-prefill admission — each ``fill_slots`` call admits
      requests only while their summed prompt tokens stay within
      ``prefill_budget`` (0 = uncapped; one admission always allowed), so
      a burst of long prompts cannot stall active decodes for more than
      one budget's worth of prefill between chunks,
    * preemption — ``preempt()`` evicts lower-priority active slots when
      a strictly-higher-priority request is pending; victims re-enter
      the queue with their generated tokens preserved and are
      re-prefilled (prompt + generated) on re-admission.

    Slot lifecycle runs on the native C++ scheduler when the library is
    available — the TPU-native counterpart of the runtime the reference
    keeps in CUDA host code; token storage stays in Python (tokens are
    the caller's data either way).  ``use_native=False`` or
    AMQ_NATIVE_SCHED=0 forces the pure-Python path.
    """

    def __init__(self, n_slots: int, max_len: int,
                 use_native: Optional[bool] = None,
                 prefill_budget: int = 0):
        self.n_slots = n_slots
        self.max_len = max_len
        self.prefill_budget = prefill_budget
        self.queue: List[Request] = []
        self.slots: List[Optional[Request]] = [None] * n_slots
        self._by_uid: Dict[int, Request] = {}
        self._next_seq = 0
        self._native = None
        if use_native is None:
            import os
            use_native = os.environ.get("AMQ_NATIVE_SCHED", "1") == "1"
        if use_native:
            try:
                from ..native import NativeScheduler
                self._native = NativeScheduler(n_slots)
            except Exception:
                self._native = None

    def _enqueue_ordered(self, req: Request):
        # insert before the first request served after req
        i = 0
        while i < len(self.queue) and (
                self.queue[i].priority > req.priority
                or (self.queue[i].priority == req.priority
                    and self.queue[i]._seq < req._seq)):
            i += 1
        self.queue.insert(i, req)

    def submit(self, req: Request):
        if req.uid < 0:
            # the native core uses uid < 0 as its free-slot sentinel; keep
            # the contract identical on the pure-Python path
            raise ValueError(f"request uid must be >= 0, got {req.uid}")
        req._seq = self._next_seq
        self._next_seq += 1
        if self._native is not None:
            self._native.submit(req.uid, req.max_new_tokens,
                                priority=req.priority,
                                prompt_len=len(req.prompt))
            self._by_uid[req.uid] = req
        else:
            self._enqueue_ordered(req)

    @property
    def active(self) -> int:
        return sum(s is not None for s in self.slots)

    def has_work(self) -> bool:
        if self._native is not None:
            return self._native.pending > 0 or self._native.active > 0
        return bool(self.queue) or self.active > 0

    def fill_slots(self) -> List[Tuple[int, Request]]:
        filled = []
        if self._native is not None:
            for i, uid in self._native.fill(self.prefill_budget):
                req = self._by_uid.pop(uid)
                self.slots[i] = req
                filled.append((i, req))
            return filled
        spent = 0
        for i, slot in enumerate(self.slots):
            if slot is None and self.queue:
                head = self.queue[0]
                if (self.prefill_budget > 0 and filled
                        and spent + len(head.prompt) > self.prefill_budget):
                    break
                spent += len(head.prompt)
                req = self.queue.pop(0)
                self.slots[i] = req
                filled.append((i, req))
        return filled

    def preempt(self) -> List[Tuple[int, Request]]:
        """Evict active slots outprioritized by pending requests; the
        victims rejoin the queue (tokens kept) for later re-admission."""
        evicted: List[Tuple[int, Request]] = []
        if self._native is not None:
            for slot, uid, _gen in self._native.preempt():
                req = self.slots[slot]
                self.slots[slot] = None
                self._by_uid[uid] = req
                evicted.append((slot, req))
            return evicted
        qi = 0
        while qi < len(self.queue):
            want = self.queue[qi].priority
            victim = -1
            for i, r in enumerate(self.slots):
                if r is None or r.priority >= want:
                    continue
                if (victim < 0
                        or r.priority < self.slots[victim].priority
                        or (r.priority == self.slots[victim].priority
                            and r._seq > self.slots[victim]._seq)):
                    victim = i
            if victim < 0:
                break
            req = self.slots[victim]
            self.slots[victim] = None
            self._enqueue_ordered(req)
            evicted.append((victim, req))
            qi += 1
        return evicted

    def prefill_bookkeeping(self, slot: int, token) -> Optional[Request]:
        """Record the prefill's first generated token; the request retires
        here iff max_new_tokens == 1.  Returns the retired request."""
        req = self.slots[slot]
        req.generated.append(int(token))
        if self._native is not None:
            done = self._native.prefill(slot)
        else:
            done = len(req.generated) >= req.max_new_tokens
        if done:
            req.done = True
            self.slots[slot] = None
            return req
        return None

    def step_bookkeeping(self, tokens: np.ndarray) -> List[Request]:
        """Record one decoded token per slot; retire finished requests.

        ``tokens[i] < 0`` marks a slot that did not decode this step
        (idle, or occupied but mid-chunked-prefill) — skipped entirely.
        """
        finished = []
        decoded = np.asarray(tokens) >= 0
        if self._native is not None:
            for i, req in enumerate(self.slots):
                if req is not None and decoded[i]:
                    req.generated.append(int(tokens[i]))
            for i in self._native.step(mask=decoded):
                req = self.slots[i]
                req.done = True
                self.slots[i] = None
                finished.append(req)
            return finished
        for i, req in enumerate(self.slots):
            if req is None or not decoded[i]:
                continue
            req.generated.append(int(tokens[i]))
            if len(req.generated) >= req.max_new_tokens:
                req.done = True
                self.slots[i] = None
                finished.append(req)
        return finished
