"""Bisect stage 9: tile-size sweep for the decode GEMV after the
value-operand rewrite.

With extraction at ~3 VPU ops / 2 values and DMA overlapped, per-grid-
step fixed cost is next: o_proj chain (L=32, N=K=4096) at nbits 2/4 with
(superblock, block_n) in {1024, 2048} x {1024, 2048, 4096}.  VMEM for
the concatenated codes operand is sb*bn*2 bytes (8 MB at 2048x2048).
"""
import os, sys, time, functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amq_tpu.core.bitpack import pack
from amq_tpu.ops.quant_matmul import quant_matmul_indexed

L, N, K, G = 32, 4096, 4096, 128


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, n1, n2, reps=12):
    np.asarray(fn(n1)); np.asarray(fn(n2))
    def best(n):
        b = np.inf
        for _ in range(reps):
            t0 = time.time(); np.asarray(fn(n)); b = min(b, time.time() - t0)
        return b
    return (best(n2) - best(n1)) / (n2 - n1)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x0 = jnp.ones((1, K), jnp.bfloat16) * 0.01

    for bit in (4, 2):
        codes = rng.integers(0, 2 ** bit, (L, K, N)).astype(np.uint8)
        scale = (np.ones((L, K // G, N)) * 0.01).astype(np.float32)
        zero = np.zeros((L, K // G, N), np.float32)
        for sb in (1024, 2048):
            packed = jnp.stack([pack(jnp.asarray(codes[i]), bit,
                                     group_size=sb) for i in range(L)])
            Sb = jnp.asarray(scale, jnp.bfloat16)
            Zb = jnp.asarray(zero, jnp.bfloat16)
            jax.block_until_ready(packed)
            mb = packed.shape[1] * N * 4 / 1e6
            for bn in (1024, 2048, 4096):
                @functools.partial(jax.jit, static_argnames="n")
                def run(P, S, Z, n, bn=bn, sb=sb, bit=bit):
                    def step(x, i):
                        y = quant_matmul_indexed(
                            x, P, S, Z, i % L, nbits=bit, group_size=G,
                            shape=(N, K), superblock=sb, block_n=bn,
                            acc_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16)
                        return y * 0.001, None
                    x, _ = jax.lax.scan(step, x0,
                                        jnp.arange(n, dtype=jnp.int32))
                    return x
                try:
                    t = timed(lambda n: run(packed, Sb, Zb, n), 32, 224)
                    log(f"B{bit} sb={sb} bn={bn}: {t*1e6:6.1f} us "
                        f"({mb/t/1e3:4.0f} GB/s, {mb/t/1e3/819*100:3.0f}%)")
                except Exception as e:
                    log(f"B{bit} sb={sb} bn={bn}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
