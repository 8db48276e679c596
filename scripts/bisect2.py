"""Bisect stage 2: C (one indexed kernel in nested scan) runs 145 GB/s
vs 420-630 isolated.  Discriminate the mechanism:

  C_nested_idx    nested scan, li from inner scan xs        (slow ref pt)
  D_flat_idx      flat scan, li = i % L traced
  E_flat_idx0     flat scan, li = 0 constant
  F_flat_packed   flat scan, non-indexed kernel, single-layer buffer
  G_bare_loop     python loop of 64 dispatches, indexed, li cycling
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
                                      _quant_matmul_packed)

L = 4
BIT = 3
H = 4096


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
    st = model.sites["self_attn.o_proj"][0]
    meta = (st.nbits, st.group_size, st.shape, st.superblock)
    o_mb = (H * H * BIT / 8 + H // 128 * H * 4 * 2) / 1e6

    def site(S, x, li):
        nb, g, shp, sb = meta
        return quant_matmul_indexed(
            x, S.packed, S.scale, S.zero, li, nbits=nb, group_size=g,
            shape=shp, superblock=sb, acc_dtype=jnp.bfloat16,
            out_dtype=jnp.bfloat16)

    x0 = jnp.ones((1, H), jnp.bfloat16) * 0.01

    def timed(fn, n1, n2, reps=3):
        np.asarray(fn(n1)); np.asarray(fn(n2))
        best = np.inf
        for _ in range(reps):
            t0 = time.time(); np.asarray(fn(n1)); t1 = time.time()
            np.asarray(fn(n2)); t2 = time.time()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
        return best

    def report(tag, t_call):
        log(f"{tag}: {t_call*1e6:7.1f} us/call ({o_mb/t_call/1e3:4.0f} GB/s)")

    # --- D: flat scan, li = i % L ---
    @functools.partial(jax.jit, static_argnames="n")
    def vD(S, n):
        def step(x, i):
            return site(S, x, i % L) * 0.001, None
        x, _ = jax.lax.scan(step, x0, jnp.arange(n, dtype=jnp.int32))
        return x
    report("D flat li=i%L  ", timed(lambda n: vD(st, n), 16, 128))

    # --- E: flat scan, li = 0 ---
    @functools.partial(jax.jit, static_argnames="n")
    def vE(S, n):
        def step(x, _):
            return site(S, x, jnp.int32(0)) * 0.001, None
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x
    report("E flat li=0    ", timed(lambda n: vE(st, n), 16, 128))

    # --- F: flat scan, non-indexed kernel, single-layer buffer ---
    p1, s1, z1 = st.packed[0], st.scale[0], st.zero[0]
    jax.block_until_ready(p1)
    nb, g, shp, sb = meta

    @functools.partial(jax.jit, static_argnames="n")
    def vF(p, s, z, n):
        def step(x, _):
            y = _quant_matmul_packed(
                x, p, s, z, nbits=nb, group_size=g, shape=shp,
                superblock=sb, acc_dtype=jnp.bfloat16,
                out_dtype=jnp.bfloat16)
            return y * 0.001, None
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x
    report("F flat packed  ", timed(lambda n: vF(p1, s1, z1, n), 16, 128))


if __name__ == "__main__":
    main()
