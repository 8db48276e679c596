"""Bisect stage 3: platform control.  D/F showed streaming *different*
weight buffers per scan step runs ~195-200 GB/s while re-reading the
same buffer runs ~370 GB/s.  Is ~200 GB/s the platform ceiling for
cycling dense reads, or a kernel artifact?

  H_dense_cycle   flat scan, dense bf16 [L,N,K] stack, W[i%L] @ x
  I_dense_fixed   flat scan, dense bf16, W[0] @ x
  J_dense_big     same as H but one fat [L*N,K] matmul every L steps? no —
                  instead: H with L=32 to rule out small-L DMA reuse
  K_idx_bigtile   indexed quant kernel with 2x block_n (amortize grid)
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

H = 4096


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, n1, n2, reps=3):
    np.asarray(fn(n1)); np.asarray(fn(n2))
    best = np.inf
    for _ in range(reps):
        t0 = time.time(); np.asarray(fn(n1)); t1 = time.time()
        np.asarray(fn(n2)); t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


def dense(L, tag_extra=""):
    k = jax.random.PRNGKey(0)
    W = jax.random.normal(k, (L, H, H), jnp.bfloat16) * 0.01
    jax.block_until_ready(W)
    x0 = jnp.ones((1, H), jnp.bfloat16) * 0.01
    mb = H * H * 2 / 1e6

    @functools.partial(jax.jit, static_argnames="n")
    def cyc(W, n):
        def step(x, i):
            Wi = jax.lax.dynamic_index_in_dim(W, i % L, keepdims=False)
            return (x @ Wi.T) * 0.001, None
        x, _ = jax.lax.scan(step, x0, jnp.arange(n, dtype=jnp.int32))
        return x

    @functools.partial(jax.jit, static_argnames="n")
    def fix(W, n):
        def step(x, _):
            Wi = jax.lax.dynamic_index_in_dim(W, 0, keepdims=False)
            return (x @ Wi.T) * 0.001, None
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x

    t = timed(lambda n: cyc(W, n), 16, 128)
    log(f"H dense cycle L={L:2d}{tag_extra}: {t*1e6:7.1f} us/call "
        f"({mb/t/1e3:4.0f} GB/s)")
    t = timed(lambda n: fix(W, n), 16, 128)
    log(f"I dense fixed L={L:2d}{tag_extra}: {t*1e6:7.1f} us/call "
        f"({mb/t/1e3:4.0f} GB/s)")


def main():
    log(f"devices: {jax.devices()}")
    dense(4)
    dense(32)


if __name__ == "__main__":
    main()
