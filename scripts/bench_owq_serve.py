"""OWQ packed serving vs HQQ-container serving, same model + arch
(VERDICT r4 item 6 'done' criterion: e2e TPS within ~10%).

Uses Llama-2-7B layer SHAPES at truncated depth (OWQ_LAYERS, default 8):
the OWQ path serves through the unrolled per-layer forward, which at full
7B depth exceeds the remote compiler's program-size limit (the stacked
scan model exists precisely to avoid that) — same-depth comparison is
what the criterion needs.  Weights are synthetic; OWQ calibration is
synthetic tokens (hub-less env).

    python scripts/bench_owq_serve.py             # real TPU
    OWQ_PLATFORM=cpu OWQ_MODEL=tiny-llama python scripts/bench_owq_serve.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("OWQ_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["OWQ_PLATFORM"])

from amq_tpu.models import get_config, init_params  # noqa: E402
from amq_tpu.evaluation.data import synthetic_tokens  # noqa: E402
from amq_tpu.serving import Engine  # noqa: E402

MODEL = os.environ.get("OWQ_MODEL", "Llama-2-7b-hf")
LAYERS = int(os.environ.get("OWQ_LAYERS", "8"))
PROMPT = int(os.environ.get("OWQ_PROMPT", "32"))
GEN = int(os.environ.get("OWQ_GEN", "64"))
N_CALIB = int(os.environ.get("OWQ_CALIB", "4"))
TARGET_BITS = float(os.environ.get("OWQ_TARGET_BITS", "3.0"))


def tps(eng, prompt):
    out = eng.generate(prompt, max_new_tokens=GEN)   # warmup/compile
    t0 = time.perf_counter()
    out = eng.generate(prompt, max_new_tokens=GEN)
    dt = time.perf_counter() - t0
    return GEN / dt, out


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = get_config(MODEL)
    cfg = dataclasses.replace(cfg, num_layers=LAYERS,
                              name=f"{cfg.name}-L{LAYERS}")
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    from amq_tpu.models.config import cycled_arch
    arch = cycled_arch(LAYERS)
    prompt = rng.integers(0, cfg.vocab_size, (1, PROMPT)).astype(np.int32)
    calib = synthetic_tokens(cfg.vocab_size, n_sample=N_CALIB, seqlen=512,
                             seed=7)

    # --- OWQ packed serving (unrolled forward, OWQLinear leaves) ---
    from amq_tpu.quantization.owq import owq_quantize_model
    t0 = time.time()
    owq_params = owq_quantize_model(params, cfg, arch, TARGET_BITS,
                                    calib, packed=True, progress=True)
    print(f"owq packed realization: {time.time()-t0:.0f}s", flush=True)
    # quantized layers are host-committed (calib.layer_to_host) — move
    # them to the chip or the "TPU" numbers measure the CPU backend
    owq_params = jax.device_put(owq_params, jax.devices()[0])
    eng_owq = Engine(owq_params, cfg, batch_size=1,
                     max_len=PROMPT + GEN + 8, compute_dtype=jnp.bfloat16,
                     use_pallas=True)
    t_owq, out_owq = tps(eng_owq, prompt)
    print(f"OWQ packed: {t_owq:.1f} tok/s", flush=True)
    del eng_owq, owq_params

    # --- HQQ container serving (stacked scan model, same arch) ---
    from amq_tpu.models import quantize_model
    from amq_tpu.models.stacked import (SERVE_CONTAINERS, merge_containers,
                                        stack_proxies)
    proxies = [(lambda b=b: quantize_model(params, cfg, b, group_size=128,
                                           device=jax.devices()[0]))
               for b in (2, 3, 4)]
    model = stack_proxies(proxies, [2, 3, 4], arch,
                          container_bits=SERVE_CONTAINERS, head_bits=8)
    if model.uniform_select:
        model = merge_containers(model)
    eng_hqq = Engine(model, cfg, batch_size=1, max_len=PROMPT + GEN + 8,
                     compute_dtype=jnp.bfloat16, use_pallas=True)
    t_hqq, _ = tps(eng_hqq, prompt)
    print(f"HQQ containers: {t_hqq:.1f} tok/s", flush=True)
    print(f"ratio owq/hqq = {t_owq / t_hqq:.3f}", flush=True)


if __name__ == "__main__":
    if os.environ.get("OWQ_PLATFORM") == "cpu":   # CPU smoke: interpret
        from jax.experimental.pallas import tpu as _pltpu
        with _pltpu.force_tpu_interpret_mode():
            main()
    else:
        main()
