"""Fused unpack -> dequantize -> matmul Pallas kernels (the serving hot path).

TPU-native replacement for the reference's three CUDA kernel families —
FT w4a16 GEMM/GEMV (ft/quantization_new/{gemm,gemv}) and the AutoGPTQ
2/3-bit ``vecquant*matmul_faster_old`` GEMV (AutoGPTQ/auto_gptq_kernel.cu)
— as ONE kernel template parameterized by ``nbits`` at trace time, so a
mixed-bit model is just different constants per layer inside one jitted
step (replacing the reference's per-layer module dispatch).

Design:
* weights stay packed in HBM in the :mod:`amq_tpu.core.bitpack` layout
  (``[K*b/32, N]`` uint32, planar over a superblock = this kernel's K
  tile), so HBM traffic is exactly ``b`` bits/weight — the roofline for
  weight-only quantization,
* grid ``(n, k, m)``: per (n, k) step the packed superblock is unpacked
  with full-slab static-shift plane extractions and dequantized; with
  multiple m tiles (prefill/eval) the dequantized tile persists in VMEM
  scratch and is reused across m; a single MXU matmul accumulates into
  the output tile per step,
* 3-bit is a 2-bit plane + 1-bit plane recombination — all power-of-two
  strides (the reference's 10-per-int32 layout cannot vectorize here),
* ``quant_matmul_indexed`` / ``quant_matmul_swiglu_indexed`` additionally
  take a layer index as a scalar-prefetch BlockSpec input, DMA-ing
  straight out of stacked ``[L, ...]`` weight buffers (the scan-over-
  layers serving model), with SwiGLU optionally fused into the x
  prologue.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.bitpack import packed_rows
from ..core.quantize import QuantizedTensor, dequantize_kn


def _pick_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dimension {dim} not tileable by {candidates}")


#: bf16 bit pattern 0x4300 = 128.0 with a 7-bit-mantissa ulp of 1 —
#: OR-ing a code c <= 127 into the mantissa yields exactly 128 + c
_BF16_128 = 0x43004300


#: the single-m (decode GEMV) path feeds code planes to the dot as values
#: (no scratch round-trip — bisect8.py); pallas still wants a scratch
#: entry, so it gets a minimal placeholder
_DUMMY_SCRATCH = pltpu.VMEM((8, 128), jnp.bfloat16)

#: superblocks per decode grid step (AMQ_KSUB, power of two).  Each extra
#: slab amortizes the per-grid-step fixed cost (semaphores / revolving-
#: buffer switch, ~0.3 us measured) over another sb*bn dot while keeping
#: each codes operand at [sb, bn]; sites whose K isn't divisible fall back
#: per-site.  In-model measurement: docs/ROADMAP.md round 3.
import os as _os  # noqa: E402

_KSUB_DEFAULT = int(_os.environ.get("AMQ_KSUB", "2"))

#: software-pipelined decode GEMV (AMQ_PIPE=1): per grid step, dot the
#: codes extracted in the PREVIOUS step (VMEM scratch) while extracting
#: the current packed tile — the dot (MXU) and extraction (VPU) are
#: data-independent, so Mosaic may co-issue them and the step cost drops
#: from ext+dot toward max(ext, dot).  One extra grid step per n-tile
#: drains the pipeline; its clamped index maps repeat the previous block
#: indices so Pallas skips the re-copy (no extra HBM traffic).
_PIPE_DEFAULT = int(_os.environ.get("AMQ_PIPE", "0"))


def _extract_pairs_bf16(words, field_bits, shifts):
    """Pair extraction: ``[R, bn]`` uint32 -> list of bf16 ``[2R, bn]``.

    For each shift s: ``(w >> s) & pair_mask | 0x4300_4300`` bitcast to
    bf16 gives TWO exact values ``128 + c`` per word (codes sit 16 bits
    apart in the pair-planar layout, and Mosaic's 32->16-bit bitcast maps
    word row r to rows (2r, 2r+1) = (low, high) — probe_bitcast.py).
    Cost: 3 VPU ops per 2 values.
    """
    mask = (1 << field_bits) - 1
    pm = jnp.uint32((mask << 16) | mask)
    const = jnp.uint32(_BF16_128)
    return [pltpu.bitcast(((words >> jnp.uint32(s)) & pm) | const,
                          jnp.bfloat16)
            for s in shifts]


def _codes_chunks_bf16(w_blk, nbits, sb):
    """Extract one superblock's raw ``128 + c`` bf16 code chunks.

    Returns (chunk_list, plane_splits, zoff): concatenating the chunks row-
    wise gives the code matrix in K order.  ``plane_splits`` is a list of
    (n_chunks, weight): for 1/2/3/4-bit ONE plane of weight 1 (3-bit's two
    bit-planes recombine exactly during extraction); for 8-bit two nibble
    planes (16, 1) — 16*hi + lo exceeds bf16's 7-bit mantissa.
    VPU cost: extraction only (~1.5-2.5 ops/value).
    """
    if nbits == 3:
        # recombine the 2-bit and 1-bit planes into full 3-bit codes AT
        # EXTRACTION so the GEMV needs ONE dot instead of two (the dots
        # are MXU weight-load bound, so plane count is dot cost).  The
        # 2-bit field is extracted to bit 0 under an OR with 0x4380
        # (= bf16 256.0, whose mantissa LSB weighs 2): the bitcast yields
        # exactly 256 + 2*c_hi; then (hi - 256) + (128 + c_lo) =
        # 128 + (2*c_hi + c_lo) is exact at every step (values <= 135).
        hi_rows = packed_rows(sb, 2)
        hw = w_blk[:hi_rows, :]
        pm2 = jnp.uint32(0x00030003)
        c256 = jnp.uint32(0x43804380)
        hi = [pltpu.bitcast((hw >> jnp.uint32(2 * p)) & pm2 | c256,
                            jnp.bfloat16)
              for p in range(8)]
        lo = _extract_pairs_bf16(w_blk[hi_rows:, :], 1, range(16))
        half = hi[0].shape[0] // 2
        b256 = jnp.bfloat16(256.0)
        comb = []
        for j, h in enumerate(hi):
            comb.append((h[:half] - b256) + lo[2 * j])
            comb.append((h[half:] - b256) + lo[2 * j + 1])
        chunks, splits = comb, [(len(comb), 1.0)]
        zoff = 128.0
    elif nbits == 8:
        hi = _extract_pairs_bf16(w_blk, 4, (4, 12))
        lo = _extract_pairs_bf16(w_blk, 4, (0, 8))
        chunks, splits = hi + lo, [(len(hi), 16.0), (len(lo), 1.0)]
        zoff = 17 * 128.0
    else:
        P = 16 // nbits
        chunks = _extract_pairs_bf16(w_blk, nbits,
                                     [nbits * p for p in range(P)])
        splits = [(len(chunks), 1.0)]
        zoff = 128.0
    return chunks, splits, zoff


def _gemv_blockdiag(x, w_blk, s_blk, z_blk, nbits, group_size, T, bn,
                    acc_dtype=jnp.bfloat16, m_real=None):
    """Decode-regime (small m) dequant-matmul of one superblock tile.

    Per-group scale cannot ride a single plain matmul, and per-group
    small matmuls cost ~1 us each in Mosaic (measured,
    scripts/kernel_variants.py) — so the groups become ROW-BLOCKS of a
    block-diagonal x:

        X'[g*m + i, k] = x[i, k] if k in group g else 0
        y_p = X' @ (c + 128)        -> [T*m, bn], ONE dot per plane
        y   = sum_g s_g * y_p[g] - s_g * (z_g + zoff) * xsum_g

    The code planes feed the dot as a VALUE (concatenated extraction
    chunks), NOT via a VMEM scratch round-trip — the store+reload
    serializes extraction against the dot and was measured 25% slower
    (scripts/bisect8.py: S1 40.4 us vs S2 30.3 us on the 3-bit o_proj
    chain).

    ``m_real`` is the true (unpadded) batch: the block-diagonal X' is
    built from only those rows, rounded up so ``T * m_eff`` stays
    sublane-aligned — at decode (M=1, T=8) the dot streams 8 MXU rows
    instead of 64 (building X' from the zero-padded [8, sb] x block was
    measured 8x more MXU traffic for nothing).
    """
    bm, sb = x.shape
    m_eff = m_real or bm
    while (T * m_eff) % 8 and m_eff < bm:
        m_eff += 1
    xb = x[:m_eff].astype(acc_dtype)
    # the 128-offset correction must see EXACTLY the values the matmul
    # sees: xsum from the (possibly bf16-rounded) x the dot consumes — a
    # full-precision xsum leaves a 128 * rounding-residual in the output
    xf = xb.astype(jnp.float32)
    xsum = jnp.sum(xf.reshape(m_eff, T, group_size), axis=2)     # [m, T]
    # block-diagonal X': [T, m_eff, sb] masked copies -> [T*m_eff, sb]
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, sb), 2) // group_size
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, sb), 0)
    xd = jnp.where(k_ids == g_ids, xb[None],
                   jnp.zeros((), acc_dtype)).reshape(T * m_eff, sb)

    chunks, splits, zoff = _codes_chunks_bf16(w_blk, nbits, sb)
    yp = jnp.zeros((T * m_eff, bn), jnp.float32)
    off = 0
    for n_chunks, weight in splits:
        codes = jnp.concatenate(chunks[off:off + n_chunks], axis=0)
        yp += weight * jnp.dot(xd, codes,
                               preferred_element_type=jnp.float32)
        off += n_chunks
    yp = yp.reshape(T, m_eff, bn)
    s = s_blk.reshape(T, 1, bn).astype(jnp.float32)
    z = z_blk.reshape(T, 1, bn).astype(jnp.float32)
    corr = (z + zoff) * s                                        # [T, 1, bn]
    y = jnp.sum(s * yp - xsum.T[:, :, None] * corr, axis=0)      # [m, bn]
    if m_eff < bm:
        y = jnp.concatenate(
            [y, jnp.zeros((bm - m_eff, bn), y.dtype)], axis=0)
    return y


def _gemv_dot_codes(x, codes, s_blk, z_blk, group_size, T, bn,
                    zoff=128.0, m_real=None):
    """The dot+correction half of :func:`_gemv_blockdiag`, with the raw
    ``128 + c`` code matrix supplied (from a VMEM scratch filled by an
    earlier grid step) instead of extracted inline.  Single-plane codes
    only (nbits 1/2/3/4 — 3-bit recombines at extraction)."""
    bm, sb = x.shape
    m_eff = m_real or bm
    while (T * m_eff) % 8 and m_eff < bm:
        m_eff += 1
    xb = x[:m_eff].astype(jnp.bfloat16)
    xf = xb.astype(jnp.float32)
    xsum = jnp.sum(xf.reshape(m_eff, T, group_size), axis=2)     # [m, T]
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, sb), 2) // group_size
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, sb), 0)
    xd = jnp.where(k_ids == g_ids, xb[None],
                   jnp.zeros((), jnp.bfloat16)).reshape(T * m_eff, sb)
    yp = jnp.dot(xd, codes, preferred_element_type=jnp.float32)
    yp = yp.reshape(T, m_eff, bn)
    s = s_blk.reshape(T, 1, bn).astype(jnp.float32)
    z = z_blk.reshape(T, 1, bn).astype(jnp.float32)
    corr = (z + zoff) * s
    y = jnp.sum(s * yp - xsum.T[:, :, None] * corr, axis=0)
    if m_eff < bm:
        y = jnp.concatenate(
            [y, jnp.zeros((bm - m_eff, bn), y.dtype)], axis=0)
    return y


def _extract_into(cbuf, slot, w_blk, nbits, sb):
    """Extract one packed tile's raw code chunks into scratch row-slab
    ``slot`` (chunk-wise stores — no in-register concatenation)."""
    chunks, splits, zoff = _codes_chunks_bf16(w_blk, nbits, sb)
    assert len(splits) == 1 and splits[0][1] == 1.0, splits
    off = 0
    for c in chunks:
        cbuf[slot, pl.ds(off, c.shape[0])] = c
        off += c.shape[0]


def _dequant_tile(w_blk, s_blk, z_blk, nbits, group_size, T, bn, acc_dtype):
    """Unpack+dequantize one superblock tile -> ``[T, group_size, bn]``.

    Pair-planar extraction (see core/bitpack.py): codes come out of the
    bitcast as exact bf16 values ``128 + c`` in natural K order, so
    dequantization is one fused multiply-add per value with the offset
    folded into the zero-point:

        w = (c - z) * s = fma(c_bf, s, -(z + 128) * s)

    ``acc_dtype`` = bf16 runs the fma in bf16 (serving; meta rounding
    ~2^-8 relative), f32 casts up first (eval parity with the XLA
    reference path).
    """
    s = s_blk.reshape(T, 1, bn)
    z = z_blk.reshape(T, 1, bn)
    sb = T * group_size
    bf16 = acc_dtype == jnp.bfloat16
    # in bf16 the 128-offset must be subtracted BEFORE scaling: 128 + c is
    # exact (ulp 1 in [128, 256)), and (128 + c) - 128 = c is exact, so
    # the remaining (c - z) * s carries only quant-step-scale rounding;
    # an fma against (z + 128) * s instead would round at the 128*s
    # magnitude (~half a quantization step of error)
    c128 = jnp.bfloat16(128.0)

    if nbits == 3:
        hi_rows = packed_rows(sb, 2)
        hi = _extract_pairs_bf16(w_blk[:hi_rows, :], 2, range(0, 16, 2))
        lo = _extract_pairs_bf16(w_blk[hi_rows:, :], 1, range(16))
        cat_hi = jnp.concatenate(hi, axis=0)               # 128 + (c >> 1)
        cat_lo = jnp.concatenate(lo, axis=0)               # 128 + (c & 1)
        if bf16:
            codes = (cat_hi - c128) * jnp.bfloat16(2.0) + (cat_lo - c128)
        else:
            codes = ((cat_hi.astype(jnp.float32) - 128.0) * 2.0
                     + (cat_lo.astype(jnp.float32) - 128.0))
    elif nbits == 8:
        # two exact-bf16 nibble planes recombined as 16*hi4 + lo4 in f32
        # (a single 8-bit field would overflow the 7-bit mantissa)
        hi = _extract_pairs_bf16(w_blk, 4, (4, 12))
        lo = _extract_pairs_bf16(w_blk, 4, (0, 8))
        codes = ((jnp.concatenate(hi, axis=0).astype(jnp.float32) - 128.0)
                 * 16.0
                 + jnp.concatenate(lo, axis=0).astype(jnp.float32) - 128.0)
        bf16 = False
    else:
        P = 16 // nbits
        chunks = _extract_pairs_bf16(w_blk, nbits,
                                     [nbits * p for p in range(P)])
        cat = jnp.concatenate(chunks, axis=0)              # 128 + c
        codes = cat - c128 if bf16 else cat.astype(jnp.float32) - 128.0
    codes = codes.reshape(T, group_size, bn)

    if bf16:
        return (codes - z.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16)
    return ((codes - z.astype(jnp.float32))
            * s.astype(jnp.float32)).astype(acc_dtype)


def _meta_tile(ref, k, T, meta_full, stacked):
    """This k-tile's [T, bn] scale/zero slice.

    ``meta_full=False``: the wrapper pre-reshaped meta to a 4-D
    [(L,) n_ktiles, T, N] view and the BlockSpec delivers exactly one
    tile.  That view is only layout-free when T is a whole number of
    sublane tiles — for T < 8 XLA materializes a sublane-padded COPY of
    the whole array inside every scan cond (~45 us/layer/array measured
    on Llama-2-13B's sb=512 down-proj).  ``meta_full=True`` instead
    blocks the ORIGINAL [K/g, N] rows whole per n-tile (frozen across k,
    one DMA) and row-slices the tile dynamically in VMEM.
    """
    if not meta_full:
        return ref[0, 0] if stacked else ref[0]
    # the whole [K/g, bn] block is VMEM-resident (DMA'd once per n-tile).
    # Mosaic can't prove a k*T ref offset 8-aligned for T < 8, can't
    # lower value dynamic_slice, and can't rotate 16-bit data — a
    # one-hot MXU matmul gathers the T rows exactly (1.0 * v in f32)
    blk = ref[0] if stacked else ref[:]
    Kg = blk.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, Kg), 0) + k * T
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, Kg), 1)
    onehot = (rows == cols).astype(blk.dtype)
    return jnp.dot(onehot, blk,
                   preferred_element_type=jnp.float32).astype(blk.dtype)


def _qmm_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, scratch,
                *, nbits, group_size, groups_per_tile, acc_dtype,
                single_m, m_real=None, meta_full=False):
    # grid order (n, k, m): m innermost so one weight tile's dequantized
    # form (persisted in scratch) serves every m tile — at prefill/eval
    # shapes the old (m, n, k) order re-unpacked each weight tile per m
    # tile (32x redundant VPU work at seq 2048).  With a single m step
    # (decode) the block-diagonal grouped path applies (extraction-only
    # VPU cost; see _gemv_blockdiag).
    k = pl.program_id(1)
    m = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    T = groups_per_tile
    bn = o_ref.shape[1]
    s_blk = _meta_tile(s_ref, k, T, meta_full, stacked=False)
    z_blk = _meta_tile(z_ref, k, T, meta_full, stacked=False)

    if single_m and acc_dtype == jnp.bfloat16:
        # serving GEMV: block-diagonal grouped path (extraction-only VPU
        # cost); the f32 eval path keeps the exact fma dequant below
        y = _gemv_blockdiag(x_ref[:], w_ref[:], s_blk, z_blk,
                            nbits, group_size, T, bn,
                            acc_dtype=acc_dtype, m_real=m_real)
        o_ref[:] += y.astype(o_ref.dtype)
        return
    if single_m or pl.num_programs(2) == 1:
        # one m tile: the dequantized tile is used exactly once — feed it
        # to the dot as a VALUE (a scratch store+reload serializes unpack
        # against the dot; measured 25% slower, scripts/bisect8.py)
        w = _dequant_tile(w_ref[:], s_blk, z_blk, nbits,
                          group_size, T, bn, acc_dtype
                          ).reshape(T * group_size, bn)
        o_ref[:] += jnp.dot(x_ref[:].astype(acc_dtype), w,
                            preferred_element_type=jnp.float32
                            ).astype(o_ref.dtype)
        return

    @pl.when(m == 0)
    def _():
        deq = _dequant_tile(w_ref[:], s_blk, z_blk, nbits,
                            group_size, T, bn, acc_dtype)
        scratch[:] = deq.reshape(T * group_size, bn)
    w = scratch[:]

    o_ref[:] += jnp.dot(x_ref[:].astype(acc_dtype), w,
                        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "group_size", "shape", "superblock", "block_m",
                     "block_n", "block_k", "acc_dtype", "out_dtype"))
def _quant_matmul_packed(
    x: jnp.ndarray,        # [M, K]
    packed: jnp.ndarray,   # [K*b/32, N] uint32
    scale: jnp.ndarray,    # [K/g, N]
    zero: jnp.ndarray,     # [K/g, N]
    *,
    nbits: int,
    group_size: int,
    shape,                 # (out, in) == (N, K)
    superblock: int = 0,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    acc_dtype=jnp.float32,
    out_dtype=None,
) -> jnp.ndarray:
    N, K = shape                      # logical (out, in)
    Np = packed.shape[1]              # arrays may be padded to tile sizes
    Kp = packed.shape[0] * 32 // nbits
    M = x.shape[0]
    out_dtype = out_dtype or x.dtype
    g = group_size

    bm = block_m or (M if M <= 8 else _pick_tile(M, (256, 128, 64, 32, 16, 8)))
    # decode GEMV: per-grid-step overhead dominates, prefer big n tiles
    # decode GEMV: bn=2048 with sb=1024.  bn=4096 wins on an isolated
    # o_proj chain (664 GB/s vs 534, scripts/bisect9.py) but LOSES inside
    # the full layer (122 -> 119 tok/s; the 8 MB codes operand starves the
    # attention/cache pipeline) — in-model wins are what count.
    n_cands = ((2560, 2048, 1024, 512, 256, 128) if M <= 8
               else (1024, 512, 256, 128))
    bn = block_n or _pick_tile(Np, n_cands)
    # the K tile must equal the planar packing block
    bk = superblock or block_k or _pick_tile(Kp, (1024, 512, 256, 128))
    assert block_k in (None, bk), (block_k, bk)
    assert bk % g == 0, (bk, g)
    groups_per_tile = bk // g
    rows_per_tile = packed_rows(bk, nbits)

    if K < Kp:                        # zero-pad x over padded in-features
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
    # pad M up to the fp32 sublane tile
    m_pad = -M % max(bm, 8)
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
        bm = x.shape[0] if M <= 8 else bm
    grid = (Np // bn, Kp // bk, x.shape[0] // bm)

    single_m = grid[2] == 1 and bm <= 8
    # T < 8: ship meta as whole [K/g, N] column blocks (see _meta_tile)
    meta_full = groups_per_tile < 8
    kernel = functools.partial(
        _qmm_kernel, nbits=nbits, group_size=g,
        groups_per_tile=groups_per_tile, acc_dtype=acc_dtype,
        single_m=single_m, m_real=M if single_m else None,
        meta_full=meta_full)

    if meta_full:
        scale3, zero3 = scale, zero                 # [K/g, N]
        meta_spec = pl.BlockSpec((Kp // g, bn), lambda n, k, m: (0, n),
                                 memory_space=pltpu.VMEM)
    else:
        scale3 = scale.reshape(Kp // bk, groups_per_tile, Np)
        zero3 = zero.reshape(Kp // bk, groups_per_tile, Np)
        meta_spec = pl.BlockSpec((1, groups_per_tile, bn),
                                 lambda n, k, m: (k, 0, n),
                                 memory_space=pltpu.VMEM)
    scratch_shape = (
        _DUMMY_SCRATCH
        if single_m and acc_dtype == jnp.bfloat16
        else pltpu.VMEM((bk, bn), acc_dtype))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda n, k, m: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_tile, bn), lambda n, k, m: (k, n),
                         memory_space=pltpu.VMEM),
            meta_spec,
            meta_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, k, m: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], Np), out_dtype),
        scratch_shapes=[scratch_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(K * nbits // 8) * N + M * K * x.dtype.itemsize
            + M * N * 4,
            transcendentals=0,
        ),
    )(x, packed, scale3, zero3)
    return out[:M, :N]


def _qmm_kernel_stacked(idx_ref, x_ref, w_ref, s_ref, z_ref, o_ref, scratch,
                        *, nbits, group_size, groups_per_tile, acc_dtype,
                        single_m, m_real=None, meta_full=False, k_sub=1):
    del idx_ref  # consumed by the index maps
    k = pl.program_id(1)
    m = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    T = groups_per_tile
    bn = o_ref.shape[1]
    s_blk = _meta_tile(s_ref, k, T * k_sub, meta_full, stacked=True)
    z_blk = _meta_tile(z_ref, k, T * k_sub, meta_full, stacked=True)

    if single_m and acc_dtype == jnp.bfloat16:
        # serving GEMV: block-diagonal grouped path (extraction-only VPU
        # cost); the f32 eval path keeps the exact fma dequant below.
        # k_sub > 1 packs several superblocks into one grid step (fewer
        # steps -> less per-step fixed cost); each slab keeps its own
        # [sb, bn] dot so the codes operand stays VMEM-small.
        bk = T * group_size
        rpt = w_ref.shape[1] // k_sub
        for j in range(k_sub):
            y = _gemv_blockdiag(
                x_ref[:, j * bk:(j + 1) * bk],
                w_ref[0, j * rpt:(j + 1) * rpt],
                s_blk[j * T:(j + 1) * T], z_blk[j * T:(j + 1) * T],
                nbits, group_size, T, bn,
                acc_dtype=acc_dtype, m_real=m_real)
            o_ref[:] += y.astype(o_ref.dtype)
        return
    if single_m or pl.num_programs(2) == 1:
        # one m tile -> dequant feeds the dot as a value (see _qmm_kernel)
        w = _dequant_tile(w_ref[0], s_blk, z_blk, nbits,
                          group_size, T, bn, acc_dtype
                          ).reshape(T * group_size, bn)
        o_ref[:] += jnp.dot(x_ref[:].astype(acc_dtype), w,
                            preferred_element_type=jnp.float32
                            ).astype(o_ref.dtype)
        return

    @pl.when(m == 0)
    def _():
        deq = _dequant_tile(w_ref[0], s_blk, z_blk, nbits,
                            group_size, T, bn, acc_dtype)
        scratch[:] = deq.reshape(T * group_size, bn)
    w = scratch[:]

    o_ref[:] += jnp.dot(x_ref[:].astype(acc_dtype), w,
                        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _qmm_kernel_stacked_pipe(idx_ref, x_ref, w_ref, s_ref, z_ref, o_ref,
                             cbuf, *, nbits, group_size, T, m_real,
                             fuse_swiglu=False, u_ref=None):
    """Software-pipelined decode GEMV body (see ``_PIPE_DEFAULT``).

    Grid ``(n, Kt + 1, 1)``.  Step k dots the codes slab extracted at
    step k-1 (against x/meta of tile k-1, delivered by k-1-shifted index
    maps) and extracts packed tile k into the other scratch slab.  The
    dot is issued FIRST so the MXU drains under the VPU extraction.
    """
    del idx_ref
    k = pl.program_id(1)
    Kt = pl.num_programs(1) - 1
    bn = o_ref.shape[1]
    sb = T * group_size

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(k >= 1)
    def _():
        codes = cbuf[(k - 1) % 2]
        if fuse_swiglu:
            g = x_ref[:].astype(jnp.float32)
            x = (g * jax.nn.sigmoid(g)
                 * u_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        else:
            x = x_ref[:]
        y = _gemv_dot_codes(x, codes, s_ref[0, 0], z_ref[0, 0],
                            group_size, T, bn, m_real=m_real)
        o_ref[:] += y.astype(o_ref.dtype)

    @pl.when(k < Kt)
    def _():
        _extract_into(cbuf, k % 2, w_ref[0], nbits, sb)


def _qmm_kernel_swiglu_pipe(idx_ref, g_ref, u_ref, w_ref, s_ref, z_ref,
                            o_ref, cbuf, **kw):
    return _qmm_kernel_stacked_pipe(idx_ref, g_ref, w_ref, s_ref, z_ref,
                                    o_ref, cbuf, fuse_swiglu=True,
                                    u_ref=u_ref, **kw)


def _pipe_specs(Kt, T, rows_per_tile, bn, bm, bk, swiglu=False):
    """Index maps for the pipelined decode GEMV: x/meta shifted to tile
    k-1 (clamped — the k=0 fetch is reused at k=1), packed clamped to
    tile Kt-1 at the drain step (same index -> Pallas skips the copy)."""
    def xmap(n, k, m, idx):
        return (m, jnp.maximum(k - 1, 0))

    def wmap(n, k, m, idx):
        return (idx[0], jnp.minimum(k, Kt - 1), n)

    def mmap(n, k, m, idx):
        return (idx[0], jnp.maximum(k - 1, 0), 0, n)

    x_spec = pl.BlockSpec((bm, bk), xmap)
    w_spec = pl.BlockSpec((1, rows_per_tile, bn), wmap)
    meta_spec = pl.BlockSpec((1, 1, T, bn), mmap)
    in_specs = [x_spec] * (2 if swiglu else 1) + [w_spec, meta_spec,
                                                  meta_spec]
    return in_specs


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "group_size", "shape", "superblock",
                     "block_n", "acc_dtype", "out_dtype"))
def quant_matmul_indexed(
    x: jnp.ndarray,              # [M, K]
    packed_stack: jnp.ndarray,   # [L, K*b/32, N]
    scale_stack: jnp.ndarray,    # [L, K/g, N]
    zero_stack: jnp.ndarray,     # [L, K/g, N]
    layer: jnp.ndarray,          # scalar int32
    *,
    nbits: int,
    group_size: int,
    shape,                       # (N, K)
    superblock: int,
    block_n: Optional[int] = None,
    acc_dtype=jnp.float32,
    out_dtype=None,
) -> jnp.ndarray:
    """Fused dequant-matmul against layer ``layer`` of a stacked weight.

    The layer index is a *scalar-prefetch* argument consumed by the
    BlockSpec index maps, so the kernel DMAs the selected layer's blocks
    straight out of the stacked HBM buffer — a host-side
    ``dynamic_index_in_dim`` would materialize an HBM->HBM copy of the
    whole layer first (measured ~2x decode slowdown).
    """
    N, K = shape                      # logical (out, in)
    L, rows_total, Np = packed_stack.shape
    Kp = rows_total * 32 // nbits
    M = x.shape[0]
    out_dtype = out_dtype or x.dtype
    g = group_size
    bk = superblock
    # decode GEMV: bn=2048 with sb=1024.  bn=4096 wins on an isolated
    # o_proj chain (664 GB/s vs 534, scripts/bisect9.py) but LOSES inside
    # the full layer (122 -> 119 tok/s; the 8 MB codes operand starves the
    # attention/cache pipeline) — in-model wins are what count.
    n_cands = ((2560, 2048, 1024, 512, 256, 128) if M <= 8
               else (1024, 512, 256, 128))
    bn = block_n or _pick_tile(Np, n_cands)
    T = bk // g
    rows_per_tile = packed_rows(bk, nbits)

    if K < Kp:                        # zero-pad x over padded in-features
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
    m_pad = -M % 8
    bm = M + m_pad if M <= 8 else _pick_tile(M, (256, 128, 64, 32, 16, 8))
    if m_pad and M <= 8:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))

    single_m = (x.shape[0] // bm) == 1 and bm <= 8
    meta_full = T < 8        # see _meta_tile

    if (_PIPE_DEFAULT and single_m and acc_dtype == jnp.bfloat16
            and not meta_full and nbits != 8):
        Kt = Kp // bk
        idx = jnp.asarray(layer, jnp.int32).reshape(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // bn, Kt + 1, 1),
            in_specs=_pipe_specs(Kt, T, rows_per_tile, bn, bm, bk),
            out_specs=pl.BlockSpec((bm, bn), lambda n, k, m, idx: (m, n)),
            scratch_shapes=[pltpu.VMEM((2, bk, bn), jnp.bfloat16)],
        )
        out = pl.pallas_call(
            functools.partial(_qmm_kernel_stacked_pipe, nbits=nbits,
                              group_size=g, T=T, m_real=M),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((x.shape[0], Np), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=(K * nbits // 8) * N
                + M * K * x.dtype.itemsize + M * N * 4,
                transcendentals=0,
            ),
        )(idx, x, packed_stack,
          scale_stack.reshape(L, Kt, T, Np),
          zero_stack.reshape(L, Kt, T, Np))
        return out[:M, :N]

    # pack several superblocks per decode grid step (see kernel docstring)
    k_sub = 1
    if single_m and acc_dtype == jnp.bfloat16 and not meta_full:
        want = _KSUB_DEFAULT
        while want > 1 and (Kp // bk) % want:
            want //= 2
        k_sub = max(1, want)
    grid = (Np // bn, Kp // (bk * k_sub), x.shape[0] // bm)

    kernel = functools.partial(
        _qmm_kernel_stacked, nbits=nbits, group_size=g,
        groups_per_tile=T, acc_dtype=acc_dtype, single_m=single_m,
        m_real=M if single_m else None, meta_full=meta_full, k_sub=k_sub)

    if meta_full:
        scale4, zero4 = scale_stack, zero_stack     # [L, K/g, N]
        meta_spec = pl.BlockSpec((1, Kp // g, bn),
                                 lambda n, k, m, idx: (idx[0], 0, n))
    else:
        scale4 = scale_stack.reshape(L, Kp // (bk * k_sub), T * k_sub, Np)
        zero4 = zero_stack.reshape(L, Kp // (bk * k_sub), T * k_sub, Np)
        meta_spec = pl.BlockSpec((1, 1, T * k_sub, bn),
                                 lambda n, k, m, idx: (idx[0], k, 0, n))
    idx = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk * k_sub), lambda n, k, m, idx: (m, k)),
            pl.BlockSpec((1, rows_per_tile * k_sub, bn),
                         lambda n, k, m, idx: (idx[0], k, n)),
            meta_spec,
            meta_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, k, m, idx: (m, n)),
        scratch_shapes=[_DUMMY_SCRATCH
                        if single_m and acc_dtype == jnp.bfloat16
                        else pltpu.VMEM((bk, bn), acc_dtype)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(K * nbits // 8) * N + M * K * x.dtype.itemsize
            + M * N * 4,
            transcendentals=0,
        ),
    )(idx, x, packed_stack, scale4, zero4)
    return out[:M, :N]


def _qmm_kernel_swiglu(idx_ref, g_ref, u_ref, w_ref, s_ref, z_ref, o_ref,
                       scratch,
                       *, nbits, group_size, groups_per_tile, acc_dtype,
                       single_m, m_real=None, meta_full=False, k_sub=1):
    """down-proj with the SwiGLU activation fused into the x prologue:
    x_tile = silu(gate_tile) * up_tile computed in-kernel, removing the
    elementwise XLA op (and pipeline boundary) between gate/up and down."""
    del idx_ref
    k = pl.program_id(1)
    m = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    T = groups_per_tile
    bn = o_ref.shape[1]
    s_blk = _meta_tile(s_ref, k, T * k_sub, meta_full, stacked=True)
    z_blk = _meta_tile(z_ref, k, T * k_sub, meta_full, stacked=True)

    g = g_ref[:].astype(jnp.float32)
    x = (g * jax.nn.sigmoid(g) * u_ref[:].astype(jnp.float32)).astype(acc_dtype)

    if single_m and acc_dtype == jnp.bfloat16:
        # serving GEMV: block-diagonal grouped path (extraction-only VPU
        # cost); the f32 eval path keeps the exact fma dequant below.
        # k_sub: several superblocks per grid step (see _qmm_kernel_stacked)
        bk = T * group_size
        rpt = w_ref.shape[1] // k_sub
        for j in range(k_sub):
            y = _gemv_blockdiag(
                x[:, j * bk:(j + 1) * bk],
                w_ref[0, j * rpt:(j + 1) * rpt],
                s_blk[j * T:(j + 1) * T], z_blk[j * T:(j + 1) * T],
                nbits, group_size, T, bn,
                acc_dtype=acc_dtype, m_real=m_real)
            o_ref[:] += y.astype(o_ref.dtype)
        return
    if single_m or pl.num_programs(2) == 1:
        # one m tile -> dequant feeds the dot as a value (see _qmm_kernel)
        w = _dequant_tile(w_ref[0], s_blk, z_blk, nbits,
                          group_size, T, bn, acc_dtype
                          ).reshape(T * group_size, bn)
        o_ref[:] += jnp.dot(x.astype(acc_dtype), w,
                            preferred_element_type=jnp.float32
                            ).astype(o_ref.dtype)
        return

    @pl.when(m == 0)
    def _():
        deq = _dequant_tile(w_ref[0], s_blk, z_blk, nbits,
                            group_size, T, bn, acc_dtype)
        scratch[:] = deq.reshape(T * group_size, bn)
    w = scratch[:]

    o_ref[:] += jnp.dot(x, w,
                        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "group_size", "shape", "superblock",
                     "block_n", "acc_dtype", "out_dtype"))
def quant_matmul_swiglu_indexed(
    gate: jnp.ndarray,           # [M, K]
    up: jnp.ndarray,             # [M, K]
    packed_stack: jnp.ndarray,   # [L, K*b/32, N] (down-proj stack)
    scale_stack: jnp.ndarray,
    zero_stack: jnp.ndarray,
    layer: jnp.ndarray,
    *,
    nbits: int,
    group_size: int,
    shape,
    superblock: int,
    block_n: Optional[int] = None,
    acc_dtype=jnp.float32,
    out_dtype=None,
) -> jnp.ndarray:
    """``silu(gate) * up @ W_down.T`` fused, layer-indexed (see
    quant_matmul_indexed)."""
    N, K = shape                      # logical (out, in)
    L, rows_total, Np = packed_stack.shape
    Kp = rows_total * 32 // nbits
    M = gate.shape[0]
    out_dtype = out_dtype or gate.dtype
    g = group_size
    bk = superblock
    # decode GEMV: bn=2048 with sb=1024.  bn=4096 wins on an isolated
    # o_proj chain (664 GB/s vs 534, scripts/bisect9.py) but LOSES inside
    # the full layer (122 -> 119 tok/s; the 8 MB codes operand starves the
    # attention/cache pipeline) — in-model wins are what count.
    n_cands = ((2560, 2048, 1024, 512, 256, 128) if M <= 8
               else (1024, 512, 256, 128))
    bn = block_n or _pick_tile(Np, n_cands)
    T = bk // g
    rows_per_tile = packed_rows(bk, nbits)

    if K < Kp:                        # zero-pad over padded in-features
        gate = jnp.pad(gate, ((0, 0), (0, Kp - K)))
        up = jnp.pad(up, ((0, 0), (0, Kp - K)))
    m_pad = -M % 8
    bm = M + m_pad if M <= 8 else _pick_tile(M, (256, 128, 64, 32, 16, 8))
    if m_pad and M <= 8:
        gate = jnp.pad(gate, ((0, m_pad), (0, 0)))
        up = jnp.pad(up, ((0, m_pad), (0, 0)))

    single_m = (gate.shape[0] // bm) == 1 and bm <= 8
    meta_full = T < 8        # see _meta_tile

    if (_PIPE_DEFAULT and single_m and acc_dtype == jnp.bfloat16
            and not meta_full and nbits != 8):
        Kt = Kp // bk
        idx = jnp.asarray(layer, jnp.int32).reshape(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Np // bn, Kt + 1, 1),
            in_specs=_pipe_specs(Kt, T, rows_per_tile, bn, bm, bk,
                                 swiglu=True),
            out_specs=pl.BlockSpec((bm, bn), lambda n, k, m, idx: (m, n)),
            scratch_shapes=[pltpu.VMEM((2, bk, bn), jnp.bfloat16)],
        )
        out = pl.pallas_call(
            functools.partial(_qmm_kernel_swiglu_pipe, nbits=nbits,
                              group_size=g, T=T, m_real=M),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((gate.shape[0], Np), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=(K * nbits // 8) * N
                + 2 * M * K * gate.dtype.itemsize + M * N * 4,
                transcendentals=M * K,
            ),
        )(idx, gate, up, packed_stack,
          scale_stack.reshape(L, Kt, T, Np),
          zero_stack.reshape(L, Kt, T, Np))
        return out[:M, :N]

    k_sub = 1
    if single_m and acc_dtype == jnp.bfloat16 and not meta_full:
        want = _KSUB_DEFAULT
        while want > 1 and (Kp // bk) % want:
            want //= 2
        k_sub = max(1, want)
    grid = (Np // bn, Kp // (bk * k_sub), gate.shape[0] // bm)

    kernel = functools.partial(
        _qmm_kernel_swiglu, nbits=nbits, group_size=g,
        groups_per_tile=T, acc_dtype=acc_dtype, single_m=single_m,
        m_real=M if single_m else None, meta_full=meta_full, k_sub=k_sub)
    if meta_full:
        scale4, zero4 = scale_stack, zero_stack     # [L, K/g, N]
        meta_spec = pl.BlockSpec((1, Kp // g, bn),
                                 lambda n, k, m, idx: (idx[0], 0, n))
    else:
        scale4 = scale_stack.reshape(L, Kp // (bk * k_sub), T * k_sub, Np)
        zero4 = zero_stack.reshape(L, Kp // (bk * k_sub), T * k_sub, Np)
        meta_spec = pl.BlockSpec((1, 1, T * k_sub, bn),
                                 lambda n, k, m, idx: (idx[0], k, 0, n))
    idx = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk * k_sub), lambda n, k, m, idx: (m, k)),
            pl.BlockSpec((bm, bk * k_sub), lambda n, k, m, idx: (m, k)),
            pl.BlockSpec((1, rows_per_tile * k_sub, bn),
                         lambda n, k, m, idx: (idx[0], k, n)),
            meta_spec,
            meta_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, k, m, idx: (m, n)),
        scratch_shapes=[_DUMMY_SCRATCH
                        if single_m and acc_dtype == jnp.bfloat16
                        else pltpu.VMEM((bk, bn), acc_dtype)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gate.shape[0], Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(K * nbits // 8) * N
            + 2 * M * K * gate.dtype.itemsize + M * N * 4,
            transcendentals=M * K,
        ),
    )(idx, gate, up, packed_stack, scale4, zero4)
    return out[:M, :N]


def _qmm_kernel_mlp(idx_ref, x_ref, guw_ref, gus_ref, guz_ref,
                    dw_ref, ds_ref, dz_ref, o_ref, gu_acc,
                    *, nbits, group_size, T, S1, Kgu_t, Kd_t,
                    bn_gu, sb, inter_real, m_real):
    """Whole-MLP decode megakernel body: phase 1 (steps < S1) accumulates
    the gateup GEMV into the VMEM scratch ``gu_acc``; phase 2 computes
    SwiGLU on scratch slices and runs the down GEMV.  One pallas_call =
    down's first weight tiles DMA while gateup's last tiles compute (a
    separate call pair drains the DMA pipeline at the boundary)."""
    d = pl.program_id(0)

    @pl.when(d < S1)
    def _():
        k = d % Kgu_t
        n = d // Kgu_t
        y = _gemv_blockdiag(x_ref[:], guw_ref[0], gus_ref[0, 0],
                            guz_ref[0, 0], nbits, group_size, T, bn_gu,
                            acc_dtype=jnp.bfloat16, m_real=m_real
                            ).astype(gu_acc.dtype)

        @pl.when(k == 0)
        def _():
            gu_acc[:, pl.ds(n * bn_gu, bn_gu)] = y

        @pl.when(k > 0)
        def _():
            gu_acc[:, pl.ds(n * bn_gu, bn_gu)] += y

    @pl.when(d >= S1)
    def _():
        dd = d - S1
        k = dd % Kd_t
        g = gu_acc[:, pl.ds(k * sb, sb)].astype(jnp.float32)
        u = gu_acc[:, pl.ds(inter_real + k * sb, sb)].astype(jnp.float32)
        # zero the tail where this k-tile crosses into the padded region
        # (gate cols >= inter_real alias the up block; w pad rows are
        # arbitrary bits) — mirrors the separate path's x zero-padding
        col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1) + k * sb
        x = jnp.where(col < inter_real,
                      g * jax.nn.sigmoid(g) * u,
                      0.0).astype(jnp.bfloat16)
        bn_d = o_ref.shape[1]
        y = _gemv_blockdiag(x, dw_ref[0], ds_ref[0, 0], dz_ref[0, 0],
                            nbits, group_size, T, bn_d,
                            acc_dtype=jnp.bfloat16, m_real=m_real)

        @pl.when(k == 0)
        def _():
            o_ref[:] = y.astype(o_ref.dtype)

        @pl.when(k > 0)
        def _():
            o_ref[:] += y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "group_size", "gu_shape", "d_shape",
                     "superblock", "out_dtype"))
def quant_matmul_mlp_indexed(
    x: jnp.ndarray,               # [M, K_gu] (post-norm hidden), M <= 8
    gu_packed: jnp.ndarray,       # [L, K_gu*b/32, Np_gu] gateup stack
    gu_scale: jnp.ndarray,
    gu_zero: jnp.ndarray,
    d_packed: jnp.ndarray,        # [L, K_d*b/32, Np_d] down stack
    d_scale: jnp.ndarray,
    d_zero: jnp.ndarray,
    layer: jnp.ndarray,
    *,
    nbits: int,
    group_size: int,
    gu_shape,                     # (N_gu, K_gu) logical ([gate;up], hidden)
    d_shape,                      # (N_d, K_d) logical (hidden, inter)
    superblock: int,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Decode-path MLP megakernel: ``down(swiglu(gateup(x)))`` for layer
    ``layer`` of stacked weights, one pallas_call (flat phase-encoded grid).

    TPU-shaped fusion of the reference's separate gate/up/down GEMVs +
    elementwise SwiGLU (monkeypatch/ftllama_modeling.py MLP): the gateup
    output never leaves VMEM, and the grid's revolving-buffer DMA prefetch
    runs across the swiglu boundary.  Decode/GEMV regime only (M <= 8,
    bf16) — prefill keeps the separate tiled GEMM calls.
    """
    N_gu, K_gu = gu_shape
    N_d, K_d = d_shape
    L, gu_rows, Np_gu = gu_packed.shape
    _, d_rows, Np_d = d_packed.shape
    Kp_gu = gu_rows * 32 // nbits
    Kp_d = d_rows * 32 // nbits
    M = x.shape[0]
    assert M <= 8, M
    inter_real = N_gu // 2
    assert inter_real % 128 == 0, inter_real   # lane-aligned scratch slices
    # the up slice reads gu_acc[:, inter_real + k*sb : +sb] — the scratch
    # (sized to the gateup N padding) must cover down's padded K range
    assert inter_real + Kp_d <= Np_gu, (inter_real, Kp_d, Np_gu)
    g = group_size
    sb = superblock
    assert Kp_d % sb == 0 and Kp_gu % sb == 0
    T = sb // g

    # 2560 joins the candidates because _pick_lane_pad now pads sites to
    # 2560 multiples when that needs less pad (13B gateup 28160, Qwen2.5-7B
    # gateup 38400 — neither divisible by 2048/1024; without 2560 here the
    # opt-in megakernel would drop to bn=512 on exactly those sites).
    bn_gu = _pick_tile(Np_gu, (2560, 2048, 1024, 512, 256, 128))
    bn_d = _pick_tile(Np_d, (2560, 2048, 1024, 512, 256, 128))
    Kgu_t, Kd_t = Kp_gu // sb, Kp_d // sb
    S1 = (Np_gu // bn_gu) * Kgu_t
    D = S1 + (Np_d // bn_d) * Kd_t

    if K_gu < Kp_gu:
        x = jnp.pad(x, ((0, 0), (0, Kp_gu - K_gu)))
    m_pad = -M % 8
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    bm = x.shape[0]

    gu_rpt = packed_rows(sb, nbits)
    d_rpt = packed_rows(sb, nbits)
    gus4 = gu_scale.reshape(L, Kgu_t, T, Np_gu)
    guz4 = gu_zero.reshape(L, Kgu_t, T, Np_gu)
    ds4 = d_scale.reshape(L, Kd_t, T, Np_d)
    dz4 = d_zero.reshape(L, Kd_t, T, Np_d)
    idx = jnp.asarray(layer, jnp.int32).reshape(1)

    last_kgu, last_ngu = Kgu_t - 1, Np_gu // bn_gu - 1

    def gu_k(d):
        return jnp.where(d < S1, d % Kgu_t, last_kgu)

    def gu_n(d):
        return jnp.where(d < S1, d // Kgu_t, last_ngu)

    def d_k(d):
        return jnp.where(d < S1, 0, (d - S1) % Kd_t)

    def d_n(d):
        return jnp.where(d < S1, 0, (d - S1) // Kd_t)

    kernel = functools.partial(
        _qmm_kernel_mlp, nbits=nbits, group_size=g, T=T, S1=S1,
        Kgu_t=Kgu_t, Kd_t=Kd_t, bn_gu=bn_gu, sb=sb,
        inter_real=inter_real, m_real=M)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(D,),
        in_specs=[
            pl.BlockSpec((bm, sb), lambda d, idx: (0, gu_k(d))),
            pl.BlockSpec((1, gu_rpt, bn_gu),
                         lambda d, idx: (idx[0], gu_k(d), gu_n(d))),
            pl.BlockSpec((1, 1, T, bn_gu),
                         lambda d, idx: (idx[0], gu_k(d), 0, gu_n(d))),
            pl.BlockSpec((1, 1, T, bn_gu),
                         lambda d, idx: (idx[0], gu_k(d), 0, gu_n(d))),
            pl.BlockSpec((1, d_rpt, bn_d),
                         lambda d, idx: (idx[0], d_k(d), d_n(d))),
            pl.BlockSpec((1, 1, T, bn_d),
                         lambda d, idx: (idx[0], d_k(d), 0, d_n(d))),
            pl.BlockSpec((1, 1, T, bn_d),
                         lambda d, idx: (idx[0], d_k(d), 0, d_n(d))),
        ],
        out_specs=pl.BlockSpec((bm, bn_d), lambda d, idx: (0, d_n(d))),
        scratch_shapes=[pltpu.VMEM((bm, Np_gu), jnp.bfloat16)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, Np_d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (N_gu * K_gu + N_d * K_d),
            bytes_accessed=(K_gu * N_gu + K_d * N_d) * nbits // 8
            + M * K_gu * x.dtype.itemsize + M * N_d * 4,
            transcendentals=M * K_d,
        ),
    )(idx, x, gu_packed, gus4, guz4, d_packed, ds4, dz4)
    return out[:M, :N_d]


def quant_matmul(x: jnp.ndarray, qt: QuantizedTensor,
                 out_dtype=None, acc_dtype=None) -> jnp.ndarray:
    """``x @ W_dequant.T`` with W in packed form.  x: [..., K] -> [..., N].

    ``acc_dtype`` is the dequantized-weight/matmul-input dtype (bf16 when x
    is bf16 — MXU-native, accumulation stays f32); the matmul accumulates
    in f32 either way.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    assert K == qt.in_features, (x.shape, qt.shape)
    if qt.nbits not in (1, 2, 3, 4, 8):
        # 5/6-bit exist for HQQ-width parity (core/bitpack._PLANE_SPLIT)
        # but AMQ's serving pipeline only packs 2/3/4(+8, and the kernel
        # extraction also covers 1); plane-split widths take the XLA path
        return quant_matmul_reference(x, qt, out_dtype=out_dtype)
    if acc_dtype is None:
        acc_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    x2 = x.reshape(-1, K)
    out = _quant_matmul_packed(
        x2, qt.packed, qt.scale, qt.zero,
        nbits=qt.nbits, group_size=qt.group_size,
        shape=qt.shape, superblock=qt.superblock_,
        acc_dtype=acc_dtype, out_dtype=out_dtype)
    return out.reshape(*lead, qt.out_features)


def quant_matmul_reference(x: jnp.ndarray, qt: QuantizedTensor,
                           out_dtype=None) -> jnp.ndarray:
    """XLA fallback: dequantize then matmul (for tests / CPU)."""
    wt = dequantize_kn(qt, dtype=x.dtype)
    out = jnp.dot(x, wt, preferred_element_type=jnp.float32)
    return out.astype(out_dtype or x.dtype)
