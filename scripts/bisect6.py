"""Bisect stage 6: scan+indexed vs UNROLLED constant-index kernel chains.

The round-2 question: the same o_proj kernel measured (noisily)
  ~47 us in-scan with a varying scalar-prefetch layer index
  ~20 us as a flat call with a constant index
Does an unrolled 32-call chain with per-layer separate buffers (no
scalar-prefetch indexing, no layer scan) actually run at the flat-call
rate?  If yes, the decode step should unroll over layers.

Probes (o_proj shape N=K=4096, 3-bit, sb=1024, bn=1024, L=32):
  U1 unrolled chain, 32 separate weight buffers, _quant_matmul_packed
  I1 scan over layers, quant_matmul_indexed cycling li  (current model)
  I2 unrolled chain of quant_matmul_indexed with CONSTANT li=i (python int)
Per-call us = marginal step-scan cost / 32.
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

from amq_tpu.ops.quant_matmul import _quant_matmul_packed, quant_matmul_indexed

L, N, K, BIT, SB, G = 32, 4096, 4096, 3, 1024, 128
ROWS = K * BIT // 32


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
    packed = jax.random.randint(k0, (L, ROWS, N), 0, 2**31 - 1,
                                jnp.int32).astype(jnp.uint32)
    scale = jnp.ones((L, K // G, N), jnp.float32) * 0.01
    zero = jnp.zeros((L, K // G, N), jnp.float32)
    jax.block_until_ready(packed)
    x0 = jnp.ones((1, K), jnp.bfloat16) * 0.01
    mb = (ROWS * N * 4 + 2 * (K // G) * N * 4) / 1e6

    kw = dict(nbits=BIT, group_size=G, shape=(N, K), superblock=SB,
              acc_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16)

    # U1: unrolled, separate per-layer buffers, no indexing
    @functools.partial(jax.jit, static_argnames="n")
    def run_u1(P, S, Z, n):
        Ps = [P[i] for i in range(L)]
        Ss = [S[i] for i in range(L)]
        Zs = [Z[i] for i in range(L)]
        def step(x, _):
            for i in range(L):
                x = _quant_matmul_packed(x, Ps[i], Ss[i], Zs[i], **kw) * 0.001
            return x, None
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x

    # I1: current model form — scan over layers, dynamic index
    @functools.partial(jax.jit, static_argnames="n")
    def run_i1(P, S, Z, n):
        def step(x, _):
            def layer(xx, i):
                y = quant_matmul_indexed(xx, P, S, Z, i, **kw)
                return y * 0.001, None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
            return x, None
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x

    # I2: unrolled, stacked buffer, constant python-int index
    @functools.partial(jax.jit, static_argnames="n")
    def run_i2(P, S, Z, n):
        def step(x, _):
            for i in range(L):
                x = quant_matmul_indexed(x, P, S, Z, jnp.int32(i), **kw) * 0.001
            return x, None
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x

    for name, run in (("U1 unrolled sep-buf ", run_u1),
                      ("I1 scan dyn-idx     ", run_i1),
                      ("I2 unrolled const-idx", run_i2)):
        f = lambda n: run(packed, scale, zero, n)
        t = timed(f, 16, 64) / L
        log(f"{name}: {t*1e6:7.1f} us/call ({mb/t/1e3:4.0f} GB/s)")


if __name__ == "__main__":
    main()
