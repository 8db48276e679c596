"""Bisect the in-model kernel slowdown (140 GB/s in-model vs 420-630
isolated).  Same nested-scan structure as the real decode (outer steps,
inner layers, stacked 4-layer 7B-shape buffers), with the layer body
progressively stripped:

  A_kernels_only   qkv -> o -> gu -> down (no attention/norm/rope/cache)
  B_plus_cache     A + kv cache riding the inner scan as xs/ys
  C_one_kernel     only o_proj per layer, no cache
  D_full           the real forward_stacked layer body (reference point)
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

import bench
from amq_tpu.ops.quant_matmul import (quant_matmul_indexed,
                                      quant_matmul_swiglu_indexed)

L = 4
BIT = 3
H, I = 4096, 11008


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    import dataclasses
    cfg = dataclasses.replace(bench.get_config(bench.MODEL), num_layers=L,
                              name=f"bisect-{L}")
    bench.BITS_RANGE = (BIT,)
    rng = np.random.default_rng(0)
    model = bench.random_stacked_model(cfg, rng)
    jax.block_until_ready(model.embed)
    sites = {n: model.sites[n][0] for n in model.sites}
    meta = {n: (st.nbits, st.group_size, st.shape, st.superblock)
            for n, st in sites.items()}

    def site(S, name, x, li):
        st = S[name]
        nb, g, shp, sb = meta[name]
        return quant_matmul_indexed(
            x, st.packed, st.scale, st.zero, li, nbits=nb,
            group_size=g, shape=shp,
            superblock=sb, acc_dtype=jnp.bfloat16,
            out_dtype=jnp.bfloat16)

    def down(S, g_, u, li):
        st = S["mlp.down_proj"]
        nb, g, shp, sb = meta["mlp.down_proj"]
        return quant_matmul_swiglu_indexed(
            g_, u, st.packed, st.scale, st.zero, li, nbits=nb,
            group_size=g, shape=shp,
            superblock=sb, acc_dtype=jnp.bfloat16,
            out_dtype=jnp.bfloat16)

    def kernels_body(S, x, li):
        qkv = site(S, "self_attn.qkv_proj", x, li)
        o = site(S, "self_attn.o_proj", qkv[:, :H], li)
        x = x + o
        gu = site(S, "mlp.gateup_proj", x, li)
        return x + down(S, gu[:, :I], gu[:, I:2 * I], li)

    x0 = jnp.ones((1, H), jnp.bfloat16) * 0.01
    kshape = (L, 1, cfg.num_kv_heads, 200, cfg.head_dim_)
    kbuf = jnp.zeros(kshape, jnp.bfloat16)

    layer_mb = sum(
        (N * K * BIT / 8 + K // 128 * N * 4) / 1e6
        for N, K in [(12288, H), (H, H), (2 * I, H), (H, I)])

    def timed(fn, n1, n2, reps=3):
        np.asarray(fn(n1)); np.asarray(fn(n2))
        best = np.inf
        for _ in range(reps):
            t0 = time.time(); np.asarray(fn(n1)); t1 = time.time()
            np.asarray(fn(n2)); t2 = time.time()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
        return best

    # --- A: kernels only, nested scans, no cache ---
    @functools.partial(jax.jit, static_argnames="n")
    def vA(S, n):
        def step(x, _):
            def layer(x, li):
                return kernels_body(S, x, li), None
            x, _ = jax.lax.scan(layer, x,
                                jnp.arange(L, dtype=jnp.int32))
            return x * 0.001, None
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x
    t = timed(lambda n: vA(sites, n), 8, 64)
    log(f"A kernels-only  : {t*1e6/L:7.1f} us/layer "
        f"({layer_mb/(t/L)/1e3:4.0f} GB/s)")

    # --- B: + kv cache xs/ys through the inner scan ---
    @functools.partial(jax.jit, static_argnames="n")
    def vB(S, n):
        def step(carry, _):
            x, kb, vb = carry
            def layer(x, xs):
                li, k1, v1 = xs
                x = kernels_body(S, x, li)
                # touch the cache slices so they stay live xs/ys
                k1 = k1 + 0
                v1 = v1 + 0
                return x, (k1, v1)
            x, (k2, v2) = jax.lax.scan(
                layer, x, (jnp.arange(L, dtype=jnp.int32), kb, vb))
            return (x * 0.001, k2, v2), None
        (x, _, _), _ = jax.lax.scan(step, (x0, kbuf, kbuf), None, length=n)
        return x
    t = timed(lambda n: vB(sites, n), 8, 64)
    log(f"B +cache-xs     : {t*1e6/L:7.1f} us/layer "
        f"({layer_mb/(t/L)/1e3:4.0f} GB/s)")

    # --- C: one kernel per layer, nested scans ---
    o_mb = (H * H * BIT / 8 + H // 128 * H * 4) / 1e6

    @functools.partial(jax.jit, static_argnames="n")
    def vC(S, n):
        def step(x, _):
            def layer(x, li):
                return site(S, "self_attn.o_proj", x, li), None
            x, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
            return x * 0.001, None
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x
    t = timed(lambda n: vC(sites, n), 16, 128)
    log(f"C one-kernel    : {t*1e6/L:7.1f} us/layer "
        f"({o_mb/(t/L)/1e3:4.0f} GB/s)")


if __name__ == "__main__":
    main()
