"""Headline benchmark: mixed-precision Llama-2-7B decode on one TPU chip.

Measures decode tokens/s of the avg-3-bit mixed 2/3/4-bit model (the
BASELINE.json headline: "tokens/s/chip decode at Llama-2-7B avg-3-bit"),
via the stacked scan-over-layers engine with fused Pallas dequant-matmul
kernels.  Weights are synthetic (this environment has no model hub), which
is irrelevant for throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

vs_baseline divides by the only throughput number recoverable from the
reference repo: HQQ's ~158 tok/s for Llama-3-8B 4-bit on an RTX 4090
(amq/kernel/hqq/Readme.md:153; BASELINE.md) — the reference publishes no
AMQ benchmark results.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from amq_tpu.core.bitpack import pick_superblock_padded  # noqa: E402
from amq_tpu.models import get_config  # noqa: E402
from amq_tpu.models.config import LINEAR_NAMES  # noqa: E402
from amq_tpu.models.llama import KVCache  # noqa: E402
from amq_tpu.models.stacked import StackedModel, StackedQuant  # noqa: E402
from amq_tpu.serving import Engine  # noqa: E402

MODEL = os.environ.get("BENCH_MODEL", "Llama-2-7b-hf")
#: BENCH_BITS="3" benches a uniform all-3-bit model (per-bit attribution);
#: default is the mixed 2/3/4 cycle (mean exactly 3 bits)
BITS_RANGE = tuple(int(b) for b in
                   os.environ.get("BENCH_BITS", "2,3,4").split(","))
#: serving container per logical bit width (models/stacked.SERVE_CONTAINERS):
#: 3-bit codes ride the 4-bit kernel path — the GEMV is VPU-extraction-
#: bound and nibble extraction is ~2x faster than 2+1-plane recombination
#: (all-3 16.2 ms/token vs all-4 7.9).  BENCH_NATIVE3=1 restores the
#: capacity-optimal native 3-bit stream.
_NATIVE3 = os.environ.get("BENCH_NATIVE3", "0") == "1"
#: BENCH_CONT2=1 additionally serves 2-bit codes in nibble containers
#: (VERDICT r4 item 3 A/B): doubles their streamed bytes but collapses the
#: whole model into ONE container branch (max cross-layer pipelining).
_CONT2 = os.environ.get("BENCH_CONT2", "0") == "1"
CONTAINER = {b: (4 if (b == 3 and not _NATIVE3) or (b == 2 and _CONT2)
                 else b) for b in BITS_RANGE}
GROUP = 128
#: lm_head serving width: the bf16 head is ~0.35 ms/token of pure weight
#: stream (scripts/profile_decode.py); 8-bit packed halves it.  "0" keeps
#: the dense bf16 head (the reference's fp16-head configuration).
HEAD_BITS = int(os.environ.get("BENCH_HEAD_BITS", "8"))
PROMPT_LEN = 64          # reference default (amq_speed_benchmark.py:107-109)
GEN_LEN = 128
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
BASELINE_TPS = 158.0     # hqq Readme.md:153 (RTX 4090, Llama-3-8B 4-bit)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _bench_sites(cfg):
    """Fused serving sites: q/k/v and gate/up are single kernel launches."""
    return {
        "self_attn.qkv_proj": (cfg.q_dim + 2 * cfg.kv_dim, cfg.hidden_size),
        "self_attn.o_proj": (cfg.hidden_size, cfg.q_dim),
        "mlp.gateup_proj": (2 * cfg.intermediate_size, cfg.hidden_size),
        "mlp.down_proj": (cfg.hidden_size, cfg.intermediate_size),
    }


def _padded_site(N, K):
    """Tile-friendly padded (Np, Kp): K to whole superblocks, N to the
    decode n-tile (mirrors core.quantize + stacked.stack_proxies)."""
    from amq_tpu.models.stacked import _pick_lane_pad
    _, k_pad = pick_superblock_padded(K, GROUP)
    return N + _pick_lane_pad(N), K + k_pad


def random_stacked_model(cfg, rng) -> StackedModel:
    """Synthetic packed model, generated ON DEVICE (host->device transfer of
    ~9 GB over the axon tunnel takes tens of minutes; jax.random on-chip
    takes seconds).  Bit assignment: layer-uniform 2/3/4 cycle -> mean
    exactly 3 bits, q/k/v and gate/up groups share bits (fused kernels).

    Stacks are generated directly in the compact merged-container form
    (models/stacked.merge_containers layout): one stack per DISTINCT
    container width holding exactly its layers — building all three full
    per-bit stacks first would peak at (2+4+4)/8 bytes/weight and OOM
    13B-class models on one chip before compaction."""
    L, H = cfg.num_layers, cfg.hidden_size
    site_shapes = _bench_sites(cfg)

    # layer i uses BITS_RANGE[i % n]; compact per-container stacks
    containers = sorted(set(CONTAINER.values()))
    layer_bits = [BITS_RANGE[i % len(BITS_RANGE)] for i in range(L)]
    layer_cont = [containers.index(CONTAINER[b]) for b in layer_bits]
    slots = np.zeros(L, np.int32)
    members = [[] for _ in containers]
    for i, c in enumerate(layer_cont):
        slots[i] = len(members[c])
        members[c].append(i)

    @jax.jit
    def gen(key):
        out = {}
        for name, (N, K) in site_shapes.items():
            Np, Kp = _padded_site(N, K)
            for ci, w in enumerate(containers):
                Lc = len(members[ci])
                key, k1, k2, k3 = jax.random.split(key, 4)
                rows = Kp * w // 32
                out[f"{name}/{ci}/packed"] = jax.random.bits(
                    k1, (Lc, rows, Np), jnp.uint32)
                # bf16 scale/zero: halves the per-group metadata stream
                meta = getattr(jnp, os.environ.get("BENCH_META",
                                                   "bfloat16"))
                out[f"{name}/{ci}/scale"] = (jax.random.uniform(
                    k2, (Lc, Kp // GROUP, Np), jnp.float32) * 0.02
                ).astype(meta)
                out[f"{name}/{ci}/zero"] = (jax.random.uniform(
                    k3, (Lc, Kp // GROUP, Np), jnp.float32) * (2**w - 1)
                ).astype(meta)
        key, k1, k2 = jax.random.split(key, 3)
        out["embed"] = (jax.random.normal(k1, (cfg.vocab_size, H), jnp.float32)
                        * 0.02).astype(jnp.bfloat16)
        if HEAD_BITS:
            Vp = cfg.vocab_size + (-cfg.vocab_size % 2048)
            key, h1, h2, h3 = jax.random.split(key, 4)
            out["head_packed"] = jax.random.bits(
                h1, (H * HEAD_BITS // 32, Vp), jnp.uint32)
            out["head_scale"] = (jax.random.uniform(
                h2, (H // GROUP, Vp), jnp.float32) * 0.02
            ).astype(jnp.bfloat16)
            out["head_zero"] = (jax.random.uniform(
                h3, (H // GROUP, Vp), jnp.float32) * (2**HEAD_BITS - 1)
            ).astype(jnp.bfloat16)
        else:
            out["head"] = (jax.random.normal(
                k2, (cfg.vocab_size, H), jnp.float32) * 0.02
            ).astype(jnp.bfloat16)
        return out

    arrs = gen(jax.random.PRNGKey(0))
    sites, biases, select = {}, {}, {}
    for name, (N, K) in site_shapes.items():
        sb, _ = pick_superblock_padded(K, GROUP)
        sites[name] = tuple(
            StackedQuant(packed=arrs[f"{name}/{ci}/packed"],
                         scale=arrs[f"{name}/{ci}/scale"],
                         zero=arrs[f"{name}/{ci}/zero"],
                         nbits=w, group_size=GROUP, shape=(N, K),
                         superblock=sb)
            for ci, w in enumerate(containers))
        biases[name] = None
        select[name] = jnp.asarray(layer_cont, jnp.int32)

    head_qt = None
    if HEAD_BITS:
        from amq_tpu.core.quantize import QuantizedTensor
        hsb, _ = pick_superblock_padded(H, GROUP)
        head_qt = QuantizedTensor(
            packed=arrs["head_packed"], scale=arrs["head_scale"],
            zero=arrs["head_zero"], nbits=HEAD_BITS, group_size=GROUP,
            shape=(cfg.vocab_size, H), superblock=hsb)
    model = StackedModel(
        embed=arrs["embed"], final_norm=jnp.ones((H,), jnp.bfloat16),
        lm_head=None if HEAD_BITS else arrs["head"],
        lm_head_qt=head_qt,
        input_norm=jnp.ones((L, H), jnp.bfloat16),
        post_norm=jnp.ones((L, H), jnp.bfloat16),
        sites=sites, biases=biases, select=select,
        bits_range=tuple(containers), num_layers=L, uniform_select=True,
        slots=jnp.asarray(slots))
    return model


def weight_bytes_per_token(cfg, streamed: bool = True) -> float:
    """HBM bytes touched per decode token (packed weights + scale/zero).

    ``streamed=True`` counts what the kernels actually read: container
    widths (3-bit in nibble containers by default) plus tile padding.
    ``streamed=False`` counts capacity-optimal NATIVE storage at the
    logical widths with no pads — the "b bits/weight" accounting of the
    reference (utils/func.py:101-114).  BENCH reports both so the nibble
    container's +1/3 stream-vs-capacity tradeoff is explicit (VERDICT r2
    weakness 2)."""
    total = 0.0
    for name, (N, K) in _bench_sites(cfg).items():
        Np, Kp = _padded_site(N, K) if streamed else (N, K)
        for i in range(cfg.num_layers):
            b = BITS_RANGE[i % len(BITS_RANGE)]
            if streamed:
                b = CONTAINER[b]
            total += Kp * Np * b / 8 + (Kp // GROUP) * Np * 2 * 2  # bf16 s/z
    if HEAD_BITS:
        Vp = cfg.vocab_size + (-cfg.vocab_size % 2048) if streamed \
            else cfg.vocab_size
        total += (cfg.hidden_size * Vp * HEAD_BITS / 8
                  + (cfg.hidden_size // GROUP) * Vp * 2 * 2)
    else:
        total += cfg.vocab_size * cfg.hidden_size * 2  # head bf16
    total += cfg.hidden_size * 2                       # one embed row/token
    return total


def decoder_linear_weights(cfg) -> float:
    """Logical weight count of the decoder linears + served head."""
    n = sum(N * K for N, K in _bench_sites(cfg).values()) * cfg.num_layers
    return n + cfg.vocab_size * cfg.hidden_size


def prefill_flops(cfg, S: int) -> tuple:
    """(linear_flops, attention_flops) of one prefill at prompt length S.

    Linears: 2*N*K MACs->FLOPs per token per site (+ the lm_head on every
    position).  Attention: QK^T + PV are each 2*S*S*hd per head, causal
    masking halves the useful half -> factor 2 total (the flash kernel
    skips fully-masked tiles, so count the causal half only)."""
    lin = 2 * S * decoder_linear_weights(cfg)
    att = cfg.num_layers * cfg.num_heads * 2 * 2 * S * S * cfg.head_dim_ / 2
    return lin, att


def main():
    log(f"devices: {jax.devices()}  model={MODEL} pallas={USE_PALLAS}")
    cfg = get_config(MODEL)
    rng = np.random.default_rng(0)
    t0 = time.time()
    model = random_stacked_model(cfg, rng)
    jax.block_until_ready(model.embed)
    log(f"model built in {time.time() - t0:.1f}s")

    eng = Engine(model, cfg, batch_size=1, max_len=PROMPT_LEN + GEN_LEN + 8,
                 compute_dtype=jnp.bfloat16, use_pallas=USE_PALLAS)
    prompt = rng.integers(0, cfg.vocab_size, (1, PROMPT_LEN)).astype(np.int32)

    def sync(x):
        # block_until_ready does not reliably synchronize on the tunneled
        # axon backend; a host transfer does
        return np.asarray(x)

    # --- prefill (TTFT) ---
    # TTFT = prefill + first-token argmax, ONE dispatch, and only the
    # 4-byte token crosses the ~10 MB/s dev->host tunnel.  The KV cache
    # is preallocated outside the timed region — the reference likewise
    # preallocates its FT cache buffers at model setup
    # (monkeypatch/ftllama_modeling.py:61-68), its TTFT times
    # tokenization + generate, not allocation.  (Pulling the full [1, V]
    # logits row instead costs ~10 ms of pure transfer at 128 KB.)
    # Engine._prefill_token is that dispatch (shared with the speed CLI).
    cache = eng.new_cache()
    t0 = time.time()
    first, cache = eng._prefill_token(eng.params, jnp.asarray(prompt), cache)
    sync(first)
    log(f"prefill compile+run: {time.time() - t0:.1f}s")
    c2 = eng.new_cache()
    t0 = time.time()
    first, c2 = eng._prefill_token(eng.params, jnp.asarray(prompt), c2)
    sync(first)
    ttft = time.time() - t0
    log(f"TTFT (prefill {PROMPT_LEN}): {ttft*1e3:.1f}ms")

    # --- decode ---
    t0 = time.time()
    toks, _ = eng._decode_n(eng.params, first, c2, n_steps=GEN_LEN)
    tok_host = sync(toks)
    log(f"decode compile+run: {time.time() - t0:.1f}s; "
        f"sample tokens {tok_host[0, :8].tolist()}")
    assert tok_host.shape == (1, GEN_LEN)
    assert (tok_host >= 0).all() and (tok_host < cfg.vocab_size).all()

    best = np.inf
    for rep in range(3):
        c3 = eng.new_cache()
        last, c3 = eng._prefill(eng.params, jnp.asarray(prompt), c3)
        first = jnp.argmax(last, axis=-1).astype(jnp.int32)
        sync(first)
        t0 = time.time()
        toks, _ = eng._decode_n(eng.params, first, c3, n_steps=GEN_LEN)
        sync(toks)
        dt = time.time() - t0
        best = min(best, dt)
        log(f"rep {rep}: {GEN_LEN} tokens in {dt*1e3:.1f}ms "
            f"({GEN_LEN/dt:.1f} tok/s)")

    tps = GEN_LEN / best
    per_tok = best / GEN_LEN
    bw = weight_bytes_per_token(cfg) / per_tok / 1e9
    log(f"per-token {per_tok*1e3:.2f}ms -> weight stream {bw:.0f} GB/s "
        f"(v5e HBM ~819 GB/s => {bw/819*100:.0f}% roofline incl. dispatch)")

    # capacity vs stream accounting (VERDICT r2 weakness 2): the nibble
    # container trades +1/3 streamed bytes on 3-bit layers for ~2x faster
    # extraction; stored bits stay capacity-optimal only with BENCH_NATIVE3
    n_w = decoder_linear_weights(cfg)
    stored_bits = weight_bytes_per_token(cfg, streamed=False) * 8 / n_w
    streamed_bits = weight_bytes_per_token(cfg, streamed=True) * 8 / n_w
    log(f"avg stored bits/weight {stored_bits:.2f} (native widths, +32/g "
        f"meta) | avg streamed bits/weight {streamed_bits:.2f} "
        f"(containers + pads)")

    # --- prefill MFU at the eval shape (VERDICT r2 item 6) ---
    prefill_mfu = None
    if os.environ.get("BENCH_PREFILL_MFU", "1") == "1":
        S_MFU = int(os.environ.get("BENCH_MFU_PROMPT", "2048"))
        # max_len 64-aligned: the flash prefill kernel requires T % 64 == 0
        # (llama._flash_ok) — at +8 the 2048-prefill silently fell back to
        # the einsum path (540 MB score materialization, 29% MFU)
        eng_p = Engine(model, cfg, batch_size=1, max_len=S_MFU + 64,
                       compute_dtype=jnp.bfloat16, use_pallas=USE_PALLAS)
        long_prompt = rng.integers(0, cfg.vocab_size,
                                   (1, S_MFU)).astype(np.int32)
        t0 = time.time()
        cp = eng_p.new_cache()
        last_p, cp = eng_p._prefill(eng_p.params, jnp.asarray(long_prompt),
                                    cp)
        sync(last_p)
        log(f"prefill-{S_MFU} compile+run: {time.time() - t0:.1f}s")
        best_p = np.inf
        for _ in range(2):
            cp = eng_p.new_cache()
            t0 = time.time()
            last_p, cp = eng_p._prefill(eng_p.params,
                                        jnp.asarray(long_prompt), cp)
            sync(last_p)
            best_p = min(best_p, time.time() - t0)
        lin_f, att_f = prefill_flops(cfg, S_MFU)
        # v5e MXU peak: ~197 TFLOP/s bf16 per chip
        prefill_mfu = (lin_f + att_f) / best_p / 197e12
        log(f"prefill {S_MFU}: {best_p*1e3:.0f}ms  "
            f"{(lin_f+att_f)/best_p/1e12:.1f} TFLOP/s = "
            f"{prefill_mfu*100:.0f}% MFU incl. dispatch "
            f"(linear {lin_f/1e12:.2f} TF + attn {att_f/1e12:.2f} TF; "
            f"attn share {att_f/(lin_f+att_f)*100:.0f}%)")

    out = {
        "metric": f"decode_tokens_per_s_{MODEL}_avg3bit_chip",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / BASELINE_TPS, 3),
        "ttft_ms": round(ttft * 1e3, 1),
        "weight_stream_gbps": round(bw, 1),
        "avg_stored_bits": round(stored_bits, 3),
        "avg_streamed_bits": round(streamed_bits, 3),
    }
    if prefill_mfu is not None:
        out["prefill_mfu_pct"] = round(prefill_mfu * 100, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
