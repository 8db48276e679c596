"""Sub-byte bit-packing with a TPU-native layout.

The reference (hqq ``core/bitpack.py``) packs along axis-0 of the grouped
matrix with power-of-two strides for 1/2/4/8-bit and a hostile
10-values-per-int32 scheme for 3-bit (``pack_3bit_32``,
hqq/core/bitpack.py:69-110).  We do NOT reproduce that layout: the numerics
contract is only that pack->unpack is the identity on the quantized integer
codes.

TPU-native "pair-planar" layout
-------------------------------
Quantized codes are stored *transposed* relative to the torch weight: an
``[out, in]`` linear weight is quantized per-group along ``in`` (axis=1 in the
reference, group_size=128) and stored as a code matrix of shape ``[K, N]``
(``K = in_features`` = reduction axis = sublanes, ``N = out_features`` =
lanes).  Packing is planar per block (pass the kernel's K-tile /
superblock), with codes arranged in *16-bit-aligned pairs*:

* a block of ``g`` K-rows packs into ``R = g * nbits / 32`` uint32 rows,
* value at block row ``k = p*2R + 2r + h`` lives in word row ``r`` at bit
  offset ``16*h + nbits*p`` (``p`` = extraction round, ``h`` = 16-bit
  half).

Why pairs: Mosaic's uint32->bf16 bitcast maps word row ``r`` to bf16 rows
``(2r, 2r+1)`` = (low half, high half) — measured on v5e
(scripts/probe_bitcast.py).  With codes 16 bits apart, ONE
``(w >> (b*p)) & pair_mask | 0x4380'4380``-style op sequence extracts TWO
codes directly as exact bf16 values ``2**m + c``, so the fused kernels
dequantize at ~1.5-2 VPU ops/value instead of ~4-5 (shift, and, concat,
int cast, sub, mul).  3-bit is a 2-bit plane (codes >> 1) followed by a
1-bit plane (codes & 1), each pair-planar: exactly 3 bits/weight.

This keeps exactly ``nbits`` bits per weight for every width (the
reference's 10-per-int32 3-bit layout wastes 2/32 and cannot vectorize
here), and block-aligned packing so kernels unpack one K-tile at a time
with full-slab vector ops.

All functions are pure jnp and run on CPU or TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

SUPPORTED_BITS = (1, 2, 3, 4, 5, 6, 8)

#: non-power-of-two widths as (hi_bits, lo_bits) plane pairs — the hi
#: plane holds ``codes >> lo_bits``, the lo plane ``codes & (2**lo-1)``;
#: each plane is pair-planar.  Exactly ``nbits`` bits/weight, same
#: extraction machinery as the power-of-two widths (3-bit proved the
#: scheme; 5/6-bit close the reference's SUPPORTED_BITS gap,
#: hqq/core/quantize.py:37 — its 1.58-bit ternary mode is upstream-HQQ
#: only and unused by AMQ's 2/3/4(+8) pipeline).
_PLANE_SPLIT = {3: (2, 1), 5: (4, 1), 6: (4, 2)}

#: packed uint32 rows per block row-count: rows(block, b) = block * b // 32
def packed_rows(group_size: int, nbits: int) -> int:
    assert (group_size * nbits) % 32 == 0, (group_size, nbits)
    return group_size * nbits // 32


def pick_superblock(K: int, group_size: int = 128,
                    candidates=(1024, 512, 256, 128)) -> int:
    """Largest packing block dividing K (and a multiple of the quant group).

    The packing block ("superblock") is the planar-packing unit AND the
    kernel's K-tile: bigger blocks mean full-slab plane extractions on the
    VPU (the per-128-group layout made 3-bit unpack 7x slower than 4-bit
    on v5e because 12-row slices are sublane-misaligned).
    """
    for c in candidates:
        if K % c == 0 and c % group_size == 0:
            return c
    raise ValueError(f"no superblock for K={K}, group={group_size}")


def pick_superblock_padded(K: int, group_size: int = 128,
                           candidates=(1024, 512, 256, 128)):
    """``(superblock, k_pad)`` allowing K to round UP to a big block.

    Awkward in-features (Llama's 11008) otherwise force a small superblock
    (256), i.e. 4x more grid steps in the fused kernels — and per-grid-step
    overhead, not bytes, dominates the decode GEMV (scripts/bisect6.py).
    Padding is accepted when bounded (<= block/2 and <= K/8): 11008 ->
    1024-blocks with 256 zero rows (+2.3% streamed bytes for ~4x fewer
    steps); 13824 (Llama-2-13B) / 18944 (Qwen2.5-7B) -> 1024-blocks with
    512 pad.  Beyond fewer grid steps, big blocks keep groups_per_tile
    >= 8: a smaller block makes the kernels' [L, Kt, T, N] scale/zero
    view a sublane-padding LAYOUT COPY that XLA re-materializes inside
    every decode cond (~45 us/layer/array measured on 13B).
    Zero-padded x rows contribute exactly 0 to the matmul.
    """
    for c in candidates:
        pad = -K % c
        if c % group_size == 0 and pad <= min(c // 2, K // 8):
            return c, pad
    raise ValueError(f"no superblock for K={K}, group={group_size}")


def _pack_pow2_group(codes: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """Pack ``[G, g, N]`` int codes (0 <= c < 2**nbits) -> ``[G, g*b/32, N]``.

    Pair-planar: value at block row ``p*2R + 2r + h`` goes to word row
    ``r`` at bit offset ``16*h + nbits*p`` (see module docstring).
    """
    G, g, N = codes.shape
    rows = g * nbits // 32
    P = 16 // nbits
    c = codes.astype(jnp.uint32).reshape(G, P, rows, 2, N)
    word = jnp.zeros((G, rows, N), dtype=jnp.uint32)
    for p in range(P):
        for h in range(2):
            word = word | (c[:, p, :, h] << (16 * h + nbits * p))
    return word


def _unpack_pow2_group(words: jnp.ndarray, nbits: int, group_size: int) -> jnp.ndarray:
    """Inverse of :func:`_pack_pow2_group`: ``[G, rows, N]`` -> ``[G, g, N]``."""
    G, rows, N = words.shape
    P = 16 // nbits
    mask = jnp.uint32(2**nbits - 1)
    parts = []
    for p in range(P):
        lo = (words >> (nbits * p)) & mask          # h = 0
        hi = (words >> (16 + nbits * p)) & mask     # h = 1
        parts.append(jnp.stack([lo, hi], axis=3))   # [G, rows, N, 2]
    out = jnp.stack(parts, axis=1)                  # [G, P, rows, N, 2]
    out = jnp.moveaxis(out, 4, 3)                   # [G, P, rows, 2, N]
    return out.reshape(G, group_size, N)


def pack(codes: jnp.ndarray, nbits: int, group_size: int = 128) -> jnp.ndarray:
    """Pack integer codes ``[K, N]`` -> uint32 ``[K * nbits / 32, N]``.

    ``group_size`` here is the *packing block* (planar unit) — pass the
    superblock from :func:`pick_superblock` for kernel-facing tensors; it
    need not equal the quantization group.  ``K`` must be a multiple of it
    and ``block * nbits`` a multiple of 32.  Non-power-of-two widths
    (3/5/6) split into a hi + lo plane pair per block (``_PLANE_SPLIT``),
    e.g. 3-bit = a 2-bit plane (codes >> 1) then a 1-bit plane (codes & 1).
    """
    assert nbits in SUPPORTED_BITS, nbits
    K, N = codes.shape
    assert K % group_size == 0, (K, group_size)
    G = K // group_size
    grouped = codes.reshape(G, group_size, N)
    if nbits in _PLANE_SPLIT:
        hb, lb = _PLANE_SPLIT[nbits]
        hi = _pack_pow2_group(
            (grouped.astype(jnp.uint32) >> lb) & (2**hb - 1), hb)
        lo = _pack_pow2_group(grouped.astype(jnp.uint32) & (2**lb - 1), lb)
        word = jnp.concatenate([hi, lo], axis=1)  # [G, (hb+lb)*g/32, N]
    else:
        word = _pack_pow2_group(grouped, nbits)
    rows = packed_rows(group_size, nbits)
    return word.reshape(G * rows, N)


def unpack(words: jnp.ndarray, nbits: int, group_size: int = 128,
           dtype=jnp.uint32) -> jnp.ndarray:
    """Unpack uint32 ``[K * nbits / 32, N]`` -> integer codes ``[K, N]``."""
    assert nbits in SUPPORTED_BITS, nbits
    rows = packed_rows(group_size, nbits)
    R, N = words.shape
    assert R % rows == 0, (R, rows)
    G = R // rows
    w = words.reshape(G, rows, N)
    if nbits in _PLANE_SPLIT:
        hb, lb = _PLANE_SPLIT[nbits]
        hi_rows = packed_rows(group_size, hb)
        hi = _unpack_pow2_group(w[:, :hi_rows], hb, group_size)
        lo = _unpack_pow2_group(w[:, hi_rows:], lb, group_size)
        out = (hi << lb) | lo
    else:
        out = _unpack_pow2_group(w, nbits, group_size)
    return out.reshape(G * group_size, N).astype(dtype)
