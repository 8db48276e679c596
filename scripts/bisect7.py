"""Bisect stage 7: what bounds the decode GEMV — VPU extraction or
per-step overheads?

Same 32-call o_proj chain as bisect6 (scan over steps, indexed kernels,
cycling layer), at nbits = 2 / 3 / 4 and bn = 1024 / 2048.  If GB/s rises
sharply with fewer extraction ops (4-bit has one plane, half the chunk
ops of 3-bit), the VPU extraction is the bound and a cheaper 3-bit layout
pays; if GB/s is flat, per-step overhead dominates and tile sizing /
pipelining pays.
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

from amq_tpu.ops.quant_matmul import quant_matmul_indexed

L, N, K, SB, G = 32, 4096, 4096, 1024, 128


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
    k0 = jax.random.PRNGKey(0)
    x0 = jnp.ones((1, K), jnp.bfloat16) * 0.01

    for bit in (2, 3, 4):
        rows = K * bit // 32
        packed = jax.random.randint(k0, (L, rows, N), 0, 2**31 - 1,
                                    jnp.int32).astype(jnp.uint32)
        scale = (jnp.ones((L, K // G, N), jnp.float32) * 0.01
                 ).astype(jnp.bfloat16)
        zero = jnp.zeros((L, K // G, N), jnp.bfloat16)
        jax.block_until_ready(packed)
        mb = (rows * N * 4 + 2 * (K // G) * N * 2) / 1e6

        for bn in (1024, 2048):
            @functools.partial(jax.jit, static_argnames="n")
            def run(P, S, Z, n, bn=bn, bit=bit):
                def step(x, i):
                    y = quant_matmul_indexed(
                        x, P, S, Z, i % L, nbits=bit, group_size=G,
                        shape=(N, K), superblock=SB, block_n=bn,
                        acc_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16)
                    return y * 0.001, None
                x, _ = jax.lax.scan(step, x0,
                                    jnp.arange(n, dtype=jnp.int32))
                return x

            t = timed(lambda n: run(packed, scale, zero, n), 32, 224)
            log(f"B{bit} bn={bn}: {t*1e6:7.1f} us ({mb/t/1e3:4.0f} GB/s, "
                f"{mb/t/1e3/819*100:3.0f}% HBM)")


if __name__ == "__main__":
    main()
