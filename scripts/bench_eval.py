"""Search-stage evaluation throughput on the real chip (VERDICT item 3).

Builds a 7B-shaped ProxySwitch evaluator with synthetic weights/tokens,
measures s/sample of the JSD eval step (B x 2048 forward through the
stacked switch model) and projects the sensitivity stage (224 evals x
n_sample) and one search iteration (50 evals).

Reference anchor: the sensitivity stage took 377 s for 224 evals x 128
samples on the reference's (multi-)GPU run
(amq/sensitivity/Llama-2-7b-hf_...json "time_elapsed"); one v5e chip has
~197 bf16 TFLOP/s peak, so the 1-chip target is utilization, and the
wall-clock target is reached by --data_parallel over chips.

Env: EVAL_MODEL (default Llama-2-7b-hf), EVAL_B (8), EVAL_N (16 samples),
EVAL_SEQLEN (2048).
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # model builder reuse (synthetic stacked proxies)
from amq_tpu.evaluation import Evaluator
from amq_tpu.models import get_config

MODEL = os.environ.get("EVAL_MODEL", "Llama-2-7b-hf")
B = int(os.environ.get("EVAL_B", "8"))
N_SAMPLE = int(os.environ.get("EVAL_N", "16"))
SEQLEN = int(os.environ.get("EVAL_SEQLEN", "2048"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}  model={MODEL} B={B} "
        f"n={N_SAMPLE} seqlen={SEQLEN}")
    cfg = get_config(MODEL)
    rng = np.random.default_rng(0)

    # Evaluator with the stacked switch model built from bench's synthetic
    # generator (per-bit stacks on device; dense logit cache skipped — the
    # loss step's cost is the quantized forward, dense logits are an input)
    ev = Evaluator.__new__(Evaluator)
    ev.cfg = cfg
    ev.topology = cfg.topology()
    ev.bits_range = [2, 3, 4]
    ev.group_size = 128
    ev.batch_size = B
    ev.search = True
    ev.mesh = None
    ev.compute_dtype = jnp.bfloat16
    ev.datasets = {}
    ev.dense_params = None
    ev.quantize_fn = None
    ev.dense_cache_bytes = int(
        float(os.environ.get("AMQ_DENSE_CACHE_GIB", "4")) * 2**30)
    ev._dense_dev = {}
    ev._dense_dev_bytes = 0
    from amq_tpu.evaluation import metrics
    ev._fwd = jax.jit(ev._forward_logits)
    ev._loss_step = jax.jit(
        lambda p, t, d: metrics.jsd_shifted_per_sample(
            ev._forward_logits(p, t), d))
    from amq_tpu.models import stacked as stacked_mod
    ev._stacked = stacked_mod

    # bench builds fused-site models; eval needs the 7-site layout the
    # search archs use -> keep fused (uniform cycle arch) for throughput
    model = bench.random_stacked_model(cfg, rng)
    jax.block_until_ready(model.embed)
    log("model built")

    tokens = rng.integers(0, cfg.vocab_size,
                          (N_SAMPLE, SEQLEN)).astype(np.int32)
    dense = rng.normal(size=(N_SAMPLE, SEQLEN, cfg.vocab_size)
                       ).astype(np.float16) * 0.1

    dense16 = dense.astype(np.float16)
    t0 = time.time()
    loss = ev.eval_loss(model, tokens, dense16, cache_key="bench")
    log(f"first eval (compile+run+transfer): {time.time()-t0:.1f}s "
        f"loss={loss:.4f}")

    # steady state: dense batches pinned on device (the search loop's
    # regime — same token batches across ~10k arch evals)
    t0 = time.time()
    loss = ev.eval_loss(model, tokens, dense16, cache_key="bench")
    dt = time.time() - t0
    per_sample = dt / N_SAMPLE
    tflops = 2 * 6.74e9 * SEQLEN / per_sample / 1e12
    log(f"eval (dense cached on device): {dt:.2f}s for {N_SAMPLE} samples "
        f"-> {per_sample*1e3:.0f} ms/sample ({tflops:.0f} TFLOP/s)")
    # streaming regime (cache disabled): chunked fp16 puts + prefetch
    ev._dense_dev.clear(); ev._dense_dev_bytes = 0
    ev.dense_cache_bytes = 0
    t0 = time.time()
    loss = ev.eval_loss(model, tokens, dense16)
    dts = time.time() - t0
    log(f"eval (dense streamed, chunked+prefetch): {dts:.2f}s "
        f"-> {dts/N_SAMPLE*1e3:.0f} ms/sample")
    sens_1chip = 224 * 128 * per_sample
    log(f"sensitivity stage (224 evals x 128 samples, cached): "
        f"{sens_1chip/60:.1f} min on 1 chip, "
        f"{sens_1chip/60/8:.1f} min on 8 chips (--data_parallel)")
    log(f"search iteration (50 evals x 128): "
        f"{50*128*per_sample/60:.1f} min on 1 chip")
    import json
    print(json.dumps({
        "eval_s_per_sample_cached": round(per_sample, 4),
        "eval_s_per_sample_streamed": round(dts / N_SAMPLE, 4),
        "effective_tflops": round(tflops, 1),
        "sensitivity_stage_min_1chip": round(sens_1chip / 60, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
