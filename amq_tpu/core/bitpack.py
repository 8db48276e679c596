"""Sub-byte bit-packing with a TPU-native layout.

The reference (hqq ``core/bitpack.py``) packs along axis-0 of the grouped
matrix with power-of-two strides for 1/2/4/8-bit and a hostile
10-values-per-int32 scheme for 3-bit (``pack_3bit_32``,
hqq/core/bitpack.py:69-110).  We do NOT reproduce that layout: the numerics
contract is only that pack->unpack is the identity on the quantized integer
codes.

TPU-native layout
-----------------
Quantized codes are stored *transposed* relative to the torch weight: an
``[out, in]`` linear weight is quantized per-group along ``in`` (axis=1 in the
reference, group_size=128) and stored as a code matrix of shape ``[K, N]``
(``K = in_features`` = reduction axis = sublanes, ``N = out_features`` =
lanes).  Packing is *per quantization group* along K:

* each group of ``g`` K-rows packs into ``g * nbits / 32`` uint32 rows,
* within a group the packing is planar: word row ``j`` holds codes
  ``{j, j + rows, j + 2*rows, ...}`` of the group at descending shifts,
* 3-bit is stored as a 2-bit plane (high bits) followed by a 1-bit plane
  (low bit): ``12 = 8 + 4`` rows per 128-group.

This gives exactly ``nbits`` bits per weight for every supported width
(including 3-bit, where the reference wastes 2/32 bits per word), uniform
power-of-two shift strides that vectorize on the VPU, and group-aligned
blocks so a Pallas kernel can unpack+dequantize one group tile at a time.

All functions are pure jnp and run on CPU or TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

SUPPORTED_BITS = (1, 2, 3, 4, 8)

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


def _pack_pow2_group(codes: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """Pack ``[G, g, N]`` int codes (0 <= c < 2**nbits) -> ``[G, g*b/32, N]``.

    Planar within the group: ``vals_per_word = 32 // nbits`` slices of
    ``rows = g * b / 32`` rows each are OR-ed at descending shifts.
    """
    G, g, N = codes.shape
    rows = g * nbits // 32
    vals_per_word = 32 // nbits
    c = codes.astype(jnp.uint32).reshape(G, vals_per_word, rows, N)
    word = jnp.zeros((G, rows, N), dtype=jnp.uint32)
    for i in range(vals_per_word):
        shift = nbits * (vals_per_word - 1 - i)
        word = word | (c[:, i] << shift)
    return word


def _unpack_pow2_group(words: jnp.ndarray, nbits: int, group_size: int) -> jnp.ndarray:
    """Inverse of :func:`_pack_pow2_group`: ``[G, rows, N]`` -> ``[G, g, N]``."""
    G, rows, N = words.shape
    vals_per_word = 32 // nbits
    mask = jnp.uint32(2**nbits - 1)
    parts = []
    for i in range(vals_per_word):
        shift = nbits * (vals_per_word - 1 - i)
        parts.append((words >> shift) & mask)
    out = jnp.stack(parts, axis=1).reshape(G, group_size, N)
    return out


def pack(codes: jnp.ndarray, nbits: int, group_size: int = 128) -> jnp.ndarray:
    """Pack integer codes ``[K, N]`` -> uint32 ``[K * nbits / 32, N]``.

    ``group_size`` here is the *packing block* (planar unit) — pass the
    superblock from :func:`pick_superblock` for kernel-facing tensors; it
    need not equal the quantization group.  ``K`` must be a multiple of it
    and ``block * nbits`` a multiple of 32.  For ``nbits == 3`` the result
    is a 2-bit plane (codes >> 1) followed by a 1-bit plane (codes & 1)
    per block.
    """
    assert nbits in SUPPORTED_BITS, nbits
    K, N = codes.shape
    assert K % group_size == 0, (K, group_size)
    G = K // group_size
    grouped = codes.reshape(G, group_size, N)
    if nbits == 3:
        hi = _pack_pow2_group((grouped.astype(jnp.uint32) >> 1) & 0x3, 2)
        lo = _pack_pow2_group(grouped.astype(jnp.uint32) & 0x1, 1)
        word = jnp.concatenate([hi, lo], axis=1)  # [G, 8+4 per 128-group, N]
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
    if nbits == 3:
        hi_rows = packed_rows(group_size, 2)
        hi = _unpack_pow2_group(w[:, :hi_rows], 2, group_size)
        lo = _unpack_pow2_group(w[:, hi_rows:], 1, group_size)
        out = (hi << 1) | lo
    else:
        out = _unpack_pow2_group(w, nbits, group_size)
    return out.reshape(G * group_size, N).astype(dtype)
