"""Primitive-rate probe: what does each stage of the decode GEMV cost
with NO DMA in the way?

Everything operates on VMEM-resident buffers inside one pallas_call; a
fori_loop repeats the body R times (the packed words are XOR-ed with the
loop index so Mosaic cannot hoist the extraction).  Marginal time per
iteration = (t(R2)-t(R1))/(R2-R1).

Tile: sb=1024, bn=2048 (2M values — the production decode tile).

  DOT     xd build + dot against resident bf16 codes     (MXU feed floor)
  EXT4    4-bit pair extraction (4 chunks) + concat + dot
  EXT3    3-bit combined extraction (16 chunks) + concat + dot
  EXT2    2-bit pair extraction (8 chunks) + concat + dot
  EXT2Q   2-bit quad extraction to int8 (4 shift+and, bitcast i8,
          4 converts to bf16) + concat + dot
  EXT2QD  like EXT2Q but 4 separate dots (no concat)
  EXT2U16 2-bit extraction in u16 space (bitcast once, 8 single
          shift+and+or at u16 width) + concat + dot
  CVT     resident int8 codes -> bf16 convert + dot      (convert rate)

Then two XLA-level references (outside pallas, cycling L=8 buffers):
  XDENSE  dense bf16 [4096,4096] matmul      (XLA streaming ceiling)
  XINT8   int8 [4096,4096] astype(bf16) matmul  (XLA fused convert rate)
"""
import os, sys, time, functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SB, BN, G = 1024, 2048, 128
T = SB // G


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, n1, n2, reps=10):
    np.asarray(fn(n1)); np.asarray(fn(n2))
    def best(n):
        b = np.inf
        for _ in range(reps):
            t0 = time.time(); np.asarray(fn(n)); b = min(b, time.time() - t0)
        return b
    return (best(n2) - best(n1)) / (n2 - n1)


def _xd(i):
    # block-diagonal x rebuilt each iteration (depends on i -> not hoisted);
    # mask built arithmetically (a boolean where() inside the fori_loop hits
    # a Mosaic relayout bug on this backend)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (T, SB), 1) // G
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (T, SB), 0)
    m = (1 - jnp.abs(jnp.clip(k_ids - g_ids, -1, 1))).astype(jnp.float32)
    s = jnp.float32(0.01) + jnp.float32(1e-6) * i.astype(jnp.float32)
    return (m * s).astype(jnp.bfloat16)


def _pairs(words, field_bits, shifts, const=0x43004300):
    mask = (1 << field_bits) - 1
    pm = jnp.uint32((mask << 16) | mask)
    return [pltpu.bitcast(((words >> jnp.uint32(s)) & pm) | jnp.uint32(const),
                          jnp.bfloat16) for s in shifts]


def make_body(mode):
    """Returns fn(words_u32, codes_bf16, codes_i8, i) -> [T, BN] f32."""
    def dot(xd, codes):
        return jnp.dot(xd, codes, preferred_element_type=jnp.float32)

    if mode == "DOT":
        def body(w, cb, ci, i):
            return dot(_xd(i), cb)
    elif mode == "CVT":
        def body(w, cb, ci, i):
            return dot(_xd(i), ci.astype(jnp.bfloat16))
    elif mode == "EXT4":
        def body(w, cb, ci, i):
            ww = w[:128] ^ jnp.uint32(i)
            chunks = _pairs(ww, 4, (0, 4, 8, 12))
            return dot(_xd(i), jnp.concatenate(chunks, axis=0))
    elif mode == "EXT3":
        def body(w, cb, ci, i):
            hw = w[:64] ^ jnp.uint32(i)
            lw = w[64:96] ^ jnp.uint32(i)
            pm2 = jnp.uint32(0x00030003)
            c256 = jnp.uint32(0x43804380)
            hi = [pltpu.bitcast((hw >> jnp.uint32(2 * p)) & pm2 | c256,
                                jnp.bfloat16) for p in range(8)]
            lo = _pairs(lw, 1, range(16))
            half = hi[0].shape[0] // 2
            b256 = jnp.bfloat16(256.0)
            comb = []
            for j, h in enumerate(hi):
                comb.append((h[:half] - b256) + lo[2 * j])
                comb.append((h[half:] - b256) + lo[2 * j + 1])
            return dot(_xd(i), jnp.concatenate(comb, axis=0))
    elif mode == "EXT2":
        def body(w, cb, ci, i):
            ww = w[:64] ^ jnp.uint32(i)
            chunks = _pairs(ww, 2, range(0, 16, 2))
            return dot(_xd(i), jnp.concatenate(chunks, axis=0))
    elif mode in ("EXT2Q", "EXT2QD"):
        def body(w, cb, ci, i, sep=(mode == "EXT2QD")):
            ww = w[:64] ^ jnp.uint32(i)
            qm = jnp.uint32(0x03030303)
            offs = jnp.int8(0)
            chunks = []
            for s in (0, 2, 4, 6):
                q = pltpu.bitcast((ww >> jnp.uint32(s)) & qm, jnp.int8)
                chunks.append((q + offs).astype(jnp.bfloat16)
                              + jnp.bfloat16(128.0))
            xd = _xd(i)
            if sep:
                acc = jnp.zeros((T, BN), jnp.float32)
                for j, ch in enumerate(chunks):
                    acc += jnp.dot(xd[:, j * 256:(j + 1) * 256], ch,
                                   preferred_element_type=jnp.float32)
                return acc
            return dot(xd, jnp.concatenate(chunks, axis=0))
    elif mode == "EXT2U16":
        def body(w, cb, ci, i):
            ww = w[:64] ^ jnp.uint32(i)
            w16 = pltpu.bitcast(ww, jnp.uint16)          # [128, BN]
            m = jnp.uint16(0x3)
            c = jnp.uint16(0x4300)
            chunks = [pltpu.bitcast(((w16 >> jnp.uint16(s)) & m) | c,
                                    jnp.bfloat16)
                      for s in range(0, 16, 2)]
            return dot(_xd(i), jnp.concatenate(chunks, axis=0))
    else:
        raise ValueError(mode)
    return body


def runner(mode):
    body = make_body(mode)

    def kern(r_ref, w_ref, cb_ref, ci_ref, o_ref):
        R = r_ref[0]

        def it(i, acc):
            return acc + body(w_ref[:], cb_ref[:], ci_ref[:], i)

        o_ref[:] = jax.lax.fori_loop(0, R, it,
                                     jnp.zeros((T, BN), jnp.float32))

    @functools.partial(jax.jit, static_argnames=())
    def call(w, cb, ci, r):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((T, BN), jnp.float32),
        )(jnp.asarray(r, jnp.int32).reshape(1), w, cb, ci)
    return call


def main():
    log(f"devices: {jax.devices()}")
    k0 = jax.random.PRNGKey(0)
    words = jax.random.randint(k0, (128, BN), 0, 2**31 - 1,
                               jnp.int32).astype(jnp.uint32)
    codes_b = (jax.random.uniform(k0, (SB, BN), jnp.float32) * 8
               ).astype(jnp.bfloat16)
    codes_i = jax.random.randint(k0, (SB, BN), 0, 4, jnp.int32
                                 ).astype(jnp.int8)
    jax.block_until_ready((words, codes_b, codes_i))

    base = None
    for mode in ("DOT", "CVT", "EXT4", "EXT3", "EXT2", "EXT2Q", "EXT2QD",
                 "EXT2U16"):
        call = runner(mode)
        t = timed(lambda r: call(words, codes_b, codes_i, r), 64, 256)
        extra = "" if base is None else f"  (+{(t-base)*1e6:5.2f} us vs DOT)"
        if mode == "DOT":
            base = t
        log(f"{mode:8s}: {t*1e6:6.2f} us/tile (2M values){extra}")

    # XLA-level references
    L, N, K = 8, 4096, 4096
    Wd = (jax.random.normal(k0, (L, K, N), jnp.float32) * 0.01
          ).astype(jnp.bfloat16)
    Wi = jax.random.randint(k0, (L, K, N), -127, 127, jnp.int32
                            ).astype(jnp.int8)
    x0 = jnp.full((8, K), 0.01, jnp.bfloat16)
    jax.block_until_ready((Wd, Wi))

    @functools.partial(jax.jit, static_argnames="n")
    def xdense(W, n):
        def step(x, i):
            y = jnp.dot(x, W[i % L], preferred_element_type=jnp.float32)
            return (y[:, :K] * 1e-4).astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(step, x0, jnp.arange(n, dtype=jnp.int32))
        return x

    @functools.partial(jax.jit, static_argnames="n")
    def xint8(W, n):
        def step(x, i):
            y = jnp.dot(x, W[i % L].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return (y[:, :K] * 1e-4).astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(step, x0, jnp.arange(n, dtype=jnp.int32))
        return x

    t = timed(lambda n: xdense(Wd, n), 32, 160)
    mb = K * N * 2 / 1e6
    log(f"XDENSE  : {t*1e6:6.2f} us/call ({mb/t/1e3:5.0f} GB/s bf16, "
        f"{K*N/t/1e12:.2f} Tval/s)")
    t = timed(lambda n: xint8(Wi, n), 32, 160)
    mb = K * N / 1e6
    log(f"XINT8   : {t*1e6:6.2f} us/call ({mb/t/1e3:5.0f} GB/s i8, "
        f"{K*N/t/1e12:.2f} Tval/s)")


if __name__ == "__main__":
    main()
