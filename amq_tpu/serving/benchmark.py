"""Speed measurement harness (reference utils/speed.py modes).

Replicates the reference's benchmark semantics TPU-natively:

* TPS — tokens/s of ``generate`` at prompt 64 -> gen 128, batch 1
  (speed.py:22-46); here the whole generation is one on-device scan,
* GEMV — per-decode-token latency (speed.py:50-127): measured as the
  per-step cost of the decode scan (amortizing the ~25 ms tunnel
  dispatch, which the reference's per-token loop would pay every token),
* GEMM — prefill forward latency over 20 iters (speed.py:50-127),
* TTFT — prompt-to-first-logit wall time (speed.py:186-239),
* peak memory — device memory_stats (torch.cuda.max_memory_allocated
  equivalent, speed.py:243-244).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .engine import Engine


def device_peak_info() -> tuple:
    """(GiB, kind): peak device bytes when the backend exposes
    memory_stats (kind='peak' — apples-to-apples with the reference's
    torch.cuda.max_memory_allocated, utils/speed.py:243-244), else live
    on-device array bytes (kind='live_lower_bound' — NOT a peak; the
    axon backend returns no memory_stats)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return stats.get("peak_bytes_in_use", 0) / 1024**3, "peak"
    except Exception:
        pass
    try:
        return _live_device_gib(), "live_lower_bound"
    except Exception:
        return float("nan"), "unavailable"


def _live_device_gib() -> float:
    """Live jax.Array bytes on accelerator devices (host-staged CPU
    arrays excluded when an accelerator backend is active — the
    reference's number is device memory only)."""
    skip_cpu = jax.default_backend() != "cpu"
    total = 0
    for a in jax.live_arrays():
        if skip_cpu:
            try:
                if all(d.platform == "cpu" for d in a.sharding.device_set):
                    continue
            except Exception:
                pass
        total += a.nbytes
    return total / 1024**3


class PeakMemTracker:
    """Serving-loop memory high-water mark (reference contract:
    torch.cuda.max_memory_allocated, utils/speed.py:243-244).

    Backends with ``memory_stats`` report the allocator's true peak
    (kind='peak').  On backends without it (axon), ``sample()`` is called
    at every dispatch boundary of the benchmark loop and the maximum of
    live device-array bytes is reported (kind='live_high_water') — an
    underestimate only by XLA's transient scratch, unlike the single
    end-of-run snapshot the harness previously reported
    ('live_lower_bound')."""

    def __init__(self):
        self.peak_gib = 0.0
        self.kind = "unavailable"
        try:
            stats = jax.local_devices()[0].memory_stats()
            self._has_stats = bool(stats)
        except Exception:
            self._has_stats = False

    def sample(self) -> None:
        if self._has_stats:
            try:
                stats = jax.local_devices()[0].memory_stats()
                self.peak_gib = max(
                    self.peak_gib,
                    stats.get("peak_bytes_in_use", 0) / 1024**3)
                self.kind = "peak"
                return
            except Exception:
                self._has_stats = False
        try:
            self.peak_gib = max(self.peak_gib, _live_device_gib())
            self.kind = "live_high_water"
        except Exception:
            pass

    def result(self) -> tuple:
        if self.kind == "unavailable":
            return device_peak_info()
        return self.peak_gib, self.kind


def device_peak_gib() -> float:
    return device_peak_info()[0]


def benchmark_speed(engine: Engine, mode: str = "TPS", prompt_len: int = 64,
                    gen_len: int = 128, iters: int = 20, seed: int = 0,
                    mem: "PeakMemTracker" = None) -> Dict[str, float]:
    cfg = engine.cfg
    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, cfg.vocab_size,
                          (engine.batch_size, prompt_len)).astype(np.int32)
    sample = mem.sample if mem is not None else (lambda: None)

    if mode == "TPS":
        engine.generate(prompt, max_new_tokens=gen_len)  # warmup/compile
        sample()
        t0 = time.perf_counter()
        engine.generate(prompt, max_new_tokens=gen_len)
        dt = time.perf_counter() - t0
        sample()
        return {"tokens_per_s": gen_len * engine.batch_size / dt,
                "total_s": dt}

    if mode == "TTFT":
        # prefill + first-token argmax in ONE dispatch; sync by pulling
        # the 4-byte token (block_until_ready is unreliable on tunneled
        # backends, and the full logits row costs ~10 ms dev->host).
        # The cache is preallocated outside the timed region, matching
        # the reference's setup-time FT buffers
        # (monkeypatch/ftllama_modeling.py:61-68).
        cache = engine.new_cache()
        tok, cache = engine._prefill_token(engine.params,
                                           jnp.asarray(prompt), cache)
        np.asarray(tok)
        sample()
        cache = engine.new_cache()
        t0 = time.perf_counter()
        tok, cache = engine._prefill_token(engine.params,
                                           jnp.asarray(prompt), cache)
        np.asarray(tok)
        ms = (time.perf_counter() - t0) * 1e3
        sample()
        return {"ttft_ms": ms}

    if mode == "GEMM":
        # sync via a tiny host pull — block_until_ready is unreliable on
        # tunneled backends and the full logits row is ~10 ms dev->host
        cache = engine.new_cache()
        toks = jnp.asarray(prompt)
        out, _ = engine._prefill(engine.params, toks, cache)
        np.asarray(out[:1, :1])
        sample()
        t0 = time.perf_counter()
        for _ in range(iters):
            cache = engine.new_cache()
            out, cache = engine._prefill(engine.params, toks, cache)
        np.asarray(out[:1, :1])
        ms = (time.perf_counter() - t0) / iters * 1e3
        sample()
        return {"prefill_ms": ms}

    if mode == "GEMV":
        cache = engine.new_cache()
        last, cache = engine._prefill(engine.params, jnp.asarray(prompt),
                                      cache)
        first = jnp.argmax(last, axis=-1).astype(jnp.int32)
        toks, _ = engine._decode_n(engine.params, first, cache,
                                   n_steps=gen_len)
        np.asarray(toks[:1, -1:])
        sample()
        # no donation on the single-stream engine, so the warmup left
        # `first`/`cache` intact — the timed pass replays the same state
        t0 = time.perf_counter()
        toks, _ = engine._decode_n(engine.params, first, cache,
                                   n_steps=gen_len)
        np.asarray(toks[:1, -1:])
        per_tok = (time.perf_counter() - t0) / gen_len
        sample()
        return {"decode_token_ms": per_tok * 1e3,
                "tokens_per_s": 1.0 / per_tok}

    raise ValueError(f"unknown mode {mode!r}")


def benchmark_continuous(model, cfg, n_slots: int = 4, n_requests: int = 16,
                         prompt_len: int = 64, gen_len: int = 64,
                         max_len: int = 2048, use_pallas: bool = True,
                         compute_dtype=None, seed: int = 0,
                         chunk_steps: int = 8):
    """Continuous-batching throughput: n_requests streamed through n_slots.

    Uses the native C++ scheduler when available; reports aggregate
    generated tokens/s wall-clock including prefills and slot churn.
    """
    import jax.numpy as jnp

    from .batched import SlotEngine
    from .engine import ContinuousBatcher, Request

    compute_dtype = compute_dtype or jnp.bfloat16
    rng = np.random.default_rng(seed)
    eng = SlotEngine(model, cfg, n_slots=n_slots, max_len=max_len,
                     compute_dtype=compute_dtype, use_pallas=use_pallas,
                     prefill_buckets=(prompt_len,), chunk_steps=chunk_steps)

    def submit_all():
        b = ContinuousBatcher(n_slots=n_slots, max_len=max_len)
        for uid in range(n_requests):
            b.submit(Request(
                uid=uid,
                prompt=rng.integers(0, cfg.vocab_size,
                                    prompt_len).astype(np.int32),
                max_new_tokens=gen_len))
        return b

    eng.run(submit_all())  # warmup / compile
    t0 = time.perf_counter()
    results = eng.run(submit_all())
    dt = time.perf_counter() - t0
    total = sum(len(v) for v in results.values())
    return {"requests": n_requests, "slots": n_slots,
            "chunk_steps": chunk_steps,
            "total_tokens": total, "total_s": dt,
            "tokens_per_s": total / dt}
