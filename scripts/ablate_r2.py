"""Round-2 ablation: attribute the in-scan vs isolated kernel gap.

Each variant times a lax.scan whose body approximates more of the real
decode layer; marginal per-iter time = (t(N2)-t(N1))/(N2-N1) cancels the
~25 ms dispatch overhead of the axon tunnel (see memory: timing via
marginals).

Variants:
  v1_single   one 4096x4096 3-bit kernel per iter (isolated in-scan rate)
  v2_chain    the 4 fused sites of one Llama-2-7B layer chained
              (qkv 12288x4096, o 4096x4096, gateup 22016x4096 wait -> see
              shapes below; down via swiglu kernel), layer 0 only
  v3_switch   v2 + uniform lax.switch over 3 bit-stacks (selector cycles)
  v4_layer    the real forward_stacked layer body incl. norms/rope/
              attention/cache at T=200
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

from amq_tpu.core.bitpack import pick_superblock
from amq_tpu.ops.quant_matmul import (quant_matmul_indexed,
                                      quant_matmul_swiglu_indexed)

H, I = 4096, 11008
QKV_N, GU_N = 12288, 2 * I
GROUP = 128
L = 4  # stacked depth (DMA from stacked buffers like the real model)
BITS = (2, 3, 4)


def log(m):
    print(m, file=sys.stderr, flush=True)


SHAPES = {"qkv": (QKV_N, H), "o": (H, H), "gu": (GU_N, H), "down": (H, I)}


@jax.jit
def _build_arrays(key):
    out = {}
    for name, (N, K) in SHAPES.items():
        for b in BITS:
            key, k1, k2, k3 = jax.random.split(key, 4)
            rows = K * b // 32
            out[(name, b)] = dict(
                packed=jax.random.bits(k1, (L, rows, N), jnp.uint32),
                scale=(jax.random.uniform(k2, (L, K // GROUP, N)) * 0.02
                       ).astype(jnp.bfloat16),
                zero=(jax.random.uniform(k3, (L, K // GROUP, N)) * (2**b - 1)
                      ).astype(jnp.bfloat16))
    return out


def build(key):
    arrs = _build_arrays(key)
    for (name, b), d in arrs.items():
        N, K = SHAPES[name]
        d.update(nbits=b, shape=(N, K), sb=pick_superblock(K, GROUP))
    return arrs


def apply_site(st, x, li):
    return quant_matmul_indexed(
        x, st["packed"], st["scale"], st["zero"], li,
        nbits=st["nbits"], group_size=GROUP, shape=st["shape"],
        superblock=st["sb"], acc_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16)


def apply_down(st, g, u, li):
    return quant_matmul_swiglu_indexed(
        g, u, st["packed"], st["scale"], st["zero"], li,
        nbits=st["nbits"], group_size=GROUP, shape=st["shape"],
        superblock=st["sb"], acc_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16)


def chain_body(stacks, b, x, li):
    qkv = apply_site(stacks[("qkv", b)], x, li)
    att = qkv[:, :H]                      # stand-in for attention output
    o = apply_site(stacks[("o", b)], att, li)
    x = x + o
    gu = apply_site(stacks[("gu", b)], x, li)
    down = apply_down(stacks[("down", b)], gu[:, :I], gu[:, I:], li)
    return x + down


def timed(fn, x, n1, n2, reps=3):
    # fn(x, n) -> array; marginal per-iter
    r = fn(x, n1); np.asarray(r)
    r = fn(x, n2); np.asarray(r)
    best = np.inf
    for _ in range(reps):
        t0 = time.time(); np.asarray(fn(x, n1)); t1 = time.time()
        np.asarray(fn(x, n2)); t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


def main():
    log(f"devices: {jax.devices()}")
    stacks = build(jax.random.PRNGKey(0))
    jax.block_until_ready(stacks[("o", 3)]["packed"])
    x0 = jnp.ones((8, H), jnp.bfloat16) * 0.01

    mb3 = lambda N, K, b: (N * K * b / 8 + K // GROUP * N * 4) / 1e6

    # --- v1: single o-proj kernel (4096^2) per bit ---
    for b in (3,):
        st = stacks[("o", b)]

        @functools.partial(jax.jit, static_argnames="n")
        def v1(x, n, st=st):
            def body(c, li):
                return apply_site(st, c, li % L), None
            y, _ = jax.lax.scan(body, x, jnp.arange(n, dtype=jnp.int32))
            return y
        t = timed(v1, x0, 64, 512)
        log(f"v1 single 4096^2 {b}-bit: {t*1e6:.1f} us/iter "
            f"({mb3(H, H, b)/t/1e3:.0f} GB/s)")

    # --- v2: chained 4 sites, fixed bit ---
    layer_mb = {b: (mb3(QKV_N, H, b) + mb3(H, H, b) + mb3(GU_N, H, b)
                    + mb3(H, I, b)) for b in BITS}
    for b in (3,):
        @functools.partial(jax.jit, static_argnames="n")
        def v2(x, n, b=b):
            def body(c, li):
                return chain_body(stacks, b, c, li % L), None
            y, _ = jax.lax.scan(body, x, jnp.arange(n, dtype=jnp.int32))
            return y
        t = timed(v2, x0, 32, 256)
        log(f"v2 chain {b}-bit: {t*1e6:.1f} us/iter "
            f"({layer_mb[b]/t/1e3:.0f} GB/s)")

    return
    # --- v3: chain under uniform switch (cycling selector) ---
    sel = jnp.asarray([i % 3 for i in range(256)], jnp.int32)

    @functools.partial(jax.jit, static_argnames="n")
    def v3(x, n):
        def body(c, i):
            li = i % L
            c = jax.lax.switch(
                sel[i], [lambda xx, bb=b: chain_body(stacks, bb, xx, li)
                         for b in BITS], c)
            return c, None
        y, _ = jax.lax.scan(body, x, jnp.arange(n, dtype=jnp.int32))
        return y
    t = timed(v3, x0, 16, 64)
    avg_mb = sum(layer_mb.values()) / 3
    log(f"v3 chain+switch avg-bit: {t*1e6:.1f} us/iter "
        f"({avg_mb/t/1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()
