"""OWQ packed-serving decode bench: fused dequant-GEMV + fp16 outlier tail.

The reference ships QEFT mixed outlier-column kernels but never compiles
or binds them (ft/quantization_new/gemv/gemv_cuda_qeft.cu:392 is excluded
from ft/setup.py sources) — upstream, OWQ models can only be *evaluated*
fake-quant, never served packed.  Here the packed form is a first-class
serving path (`quantization/owq.owq_matmul`): gather the permuted
non-outlier input columns, run the fused Pallas dequant-GEMV over the
packed body, add a dense bf16 tail matmul over the outlier columns.

This measures that path at Llama-2-7B decode shapes with the real OWQ
outlier budgets (compute_n_out at the avg-bits target), chained GEMVs
like scripts/kernel_roofline.py, and parity-checks the kernel path vs
the XLA reference on identical packed data.  Weight contents are
synthetic (irrelevant for throughput; parity is packed-vs-packed).

    python scripts/bench_owq.py            # real TPU
    KR_SCALE=16 python scripts/bench_owq.py  # CPU smoke (interpret mode)
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
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.experimental.pallas import tpu as pltpu                 # noqa: E402

from amq_tpu.core import bitpack                                 # noqa: E402
from amq_tpu.core.quantize import QuantizedTensor                # noqa: E402
from amq_tpu.models import get_config                            # noqa: E402
from amq_tpu.quantization.owq import (OWQPacked, compute_n_out,  # noqa: E402
                                      outlier_segments, owq_matmul)

if jax.default_backend() == "cpu":                               # CPU smoke
    _interp = pltpu.force_tpu_interpret_mode()
    _interp.__enter__()

HBM_PEAK = float(os.environ.get("HBM_PEAK_GBS", "819")) * 1e9    # v5e
STEPS = int(os.environ.get("KR_STEPS", "64"))
REPS = int(os.environ.get("KR_REPS", "10"))
SCALE = int(os.environ.get("KR_SCALE", "1"))
GROUP = 128
BITS = int(os.environ.get("OWQ_BITS", "4"))
AVG_BITS = float(os.environ.get("OWQ_AVG_BITS", "3.0"))


def synth_packed(rng, N, K, n_out, bits):
    """Build an OWQPacked with synthetic contents at real serving shapes
    (codes uniform in [0, 2^b), bf16-scale meta as owq_pack emits)."""
    n_nonout = K - n_out
    Kp = -(-n_nonout // GROUP) * GROUP
    codes = jnp.asarray(
        rng.integers(0, 2**bits, size=(Kp, N)).astype(np.uint32))
    superblock = bitpack.pick_superblock(Kp, GROUP)
    qt = QuantizedTensor(
        packed=bitpack.pack(codes, bits, superblock),
        scale=jnp.asarray(
            rng.uniform(0.005, 0.02, size=(Kp // GROUP, N)
                        ).astype(np.float32)),
        zero=jnp.asarray(
            rng.uniform(0, 2**bits - 1, size=(Kp // GROUP, N)
                        ).astype(np.float32)),
        nbits=bits, group_size=GROUP, shape=(N, Kp), superblock=superblock)
    # permutation: non-outliers in original order (OWQ's stable argsort)
    out_ids = np.sort(rng.choice(K, size=n_out, replace=False)).astype(int)
    return OWQPacked(
        qt=qt,
        w_out=jnp.asarray(rng.normal(size=(n_out, N)).astype(np.float32),
                          jnp.bfloat16),
        segments=outlier_segments(out_ids, K),
        out_ids=tuple(int(i) for i in out_ids))


def bench_site(label, N, K, n_out):
    rng = np.random.default_rng(0)
    p = synth_packed(rng, N, K, n_out, BITS)
    x0 = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32),
                     jnp.bfloat16)

    # parity: kernel path vs XLA dequant-reference on the SAME packed data
    y_k = np.asarray(owq_matmul(x0, p, use_kernel=True), np.float32)
    y_r = np.asarray(owq_matmul(x0, p, use_kernel=False), np.float32)
    denom = max(1e-3, float(np.abs(y_r).max()))
    rel = float(np.abs(y_k - y_r).max()) / denom
    assert rel < 3e-2, f"{label}: kernel/reference mismatch rel={rel}"

    def step(x, _):
        y = owq_matmul(x, p)                               # [1, N]
        reps = -(-K // N)
        xn = jnp.tile(y, (1, reps))[:, :K] if reps > 1 else y[:, :K]
        return (xn * 1e-3).astype(jnp.bfloat16), None

    run = jax.jit(lambda x: jax.lax.scan(step, x, None, length=STEPS)[0])
    np.asarray(run(x0))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(run(x0))
        best = min(best, time.time() - t0)
    per = best / STEPS
    qtb = p.qt.packed.nbytes + p.qt.scale.nbytes + p.qt.zero.nbytes
    bytes_step = qtb + p.w_out.nbytes
    gbs = bytes_step / per
    print(f"{label:8s} {BITS}b n_out={n_out:4d}: {per*1e6:7.1f} us/gemv  "
          f"{gbs/1e9:6.1f} GB/s  {gbs/HBM_PEAK*100:5.1f}% of HBM peak  "
          f"(parity rel={rel:.1e})", flush=True)
    return {"site": label, "nbits": BITS, "n_out": n_out, "us": per * 1e6,
            "gbs": gbs / 1e9, "roofline_pct": gbs / HBM_PEAK * 100,
            "parity_rel": rel}


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = get_config(os.environ.get("OWQ_MODEL", "Llama-2-7b-hf"))
    n_out = compute_n_out(cfg, AVG_BITS, GROUP)
    sites = [("o_proj", "self_attn.o_proj"), ("down", "mlp.down_proj")]
    out = []
    for label, name in sites:
        N, K = cfg.linear_shape(name)
        N, K = N // SCALE, (K // SCALE // GROUP) * GROUP
        no = max(2, n_out[name] // SCALE)
        out.append(bench_site(label, N, K, no))
        out.append(bench_site(label, N, K, 0))    # n_out=0 overhead ref
    print(json.dumps(out))


if __name__ == "__main__":
    main()
