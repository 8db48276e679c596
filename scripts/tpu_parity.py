"""On-chip numerical parity: fused Pallas kernels vs the XLA reference
path, for every bit-width and the GEMV/GEMM/indexed/swiglu variants,
including tile-padded shapes (K=11008-style).  Run on the real TPU."""
import os, sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amq_tpu.core.quantize import quantize
from amq_tpu.ops.quant_matmul import (
    quant_matmul, quant_matmul_reference, quant_matmul_indexed,
    quant_matmul_swiglu_indexed)


def log(m):
    print(m, file=sys.stderr, flush=True)


def check(tag, got, want, tol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = max(1e-6, float(np.abs(want).max()))
    err = float(np.abs(got - want).max()) / scale
    status = "ok " if err <= tol else "FAIL"
    log(f"{status} {tag}: rel-err {err:.2e} (tol {tol:.0e})")
    return err <= tol


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    ok = True

    for (N, K) in ((512, 11008), (1024, 4096)):
        W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.02)
        for nbits in (2, 3, 4, 8):
            qt = quantize(W, nbits=nbits, meta_dtype=jnp.bfloat16)
            for M in (1, 64):
                x = jnp.asarray(
                    rng.normal(size=(M, K)).astype(np.float32)
                ).astype(jnp.bfloat16)
                want = quant_matmul_reference(x, qt, out_dtype=jnp.float32)
                got = quant_matmul(x, qt, out_dtype=jnp.float32)
                # bf16 x + bf16 codes path: error ~2^-8 relative
                ok &= check(f"packed  b={nbits} M={M} K={K}", got, want, 3e-2)

    # indexed + swiglu against per-layer packed calls
    L, N, K = 3, 1024, 11008
    Ws = [jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.02)
          for _ in range(L)]
    qts = [quantize(W, nbits=3, meta_dtype=jnp.bfloat16) for W in Ws]
    packed = jnp.stack([q.packed for q in qts])
    scale = jnp.stack([q.scale for q in qts])
    zero = jnp.stack([q.zero for q in qts])
    x = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    for li in range(L):
        want = quant_matmul(x, qts[li], out_dtype=jnp.float32)
        got = quant_matmul_indexed(
            x, packed, scale, zero, jnp.int32(li), nbits=3, group_size=128,
            shape=(N, K), superblock=qts[li].superblock,
            acc_dtype=jnp.bfloat16, out_dtype=jnp.float32)
        ok &= check(f"indexed l={li}", got, want, 1e-5)

    g = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    u = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    act = (jax.nn.silu(g.astype(jnp.float32)) *
           u.astype(jnp.float32)).astype(jnp.bfloat16)
    want = quant_matmul(act, qts[0], out_dtype=jnp.float32)
    got = quant_matmul_swiglu_indexed(
        g, u, packed, scale, zero, jnp.int32(0), nbits=3, group_size=128,
        shape=(N, K), superblock=qts[0].superblock,
        acc_dtype=jnp.bfloat16, out_dtype=jnp.float32)
    ok &= check("swiglu  l=0", got, want, 3e-2)

    log("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
