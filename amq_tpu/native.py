"""ctypes bindings for the native host runtime (native/amq_native.cpp).

Builds on demand with the in-tree Makefile; every entry point has a pure
numpy/Python fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libamq_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def get_lib(build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    # ALWAYS make (dependency-tracked no-op when fresh): a stale prebuilt
    # .so from an older checkout would load but miss newer symbols
    if build:
        _build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    try:
        _bind(lib)
    except AttributeError:
        # stale .so missing newer symbols and no toolchain to rebuild —
        # honor the "pure-Python fallback" contract rather than crash
        return None
    _lib = lib
    return lib


def _bind(lib: ctypes.CDLL) -> None:
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.amq_pack.argtypes = [u32p, u32p, ctypes.c_int64, ctypes.c_int64,
                             ctypes.c_int64, ctypes.c_int]
    lib.amq_pack.restype = ctypes.c_int
    lib.amq_unpack.argtypes = lib.amq_pack.argtypes
    lib.amq_unpack.restype = ctypes.c_int
    lib.amq_sched_create.argtypes = [ctypes.c_int32]
    lib.amq_sched_create.restype = ctypes.c_void_p
    lib.amq_sched_destroy.argtypes = [ctypes.c_void_p]
    lib.amq_sched_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int32]
    lib.amq_sched_submit2.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_int32, ctypes.c_int32,
                                      ctypes.c_int32]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.amq_sched_fill.argtypes = [ctypes.c_void_p, i32p, i64p,
                                   ctypes.c_int32]
    lib.amq_sched_fill.restype = ctypes.c_int32
    lib.amq_sched_fill2.argtypes = [ctypes.c_void_p, ctypes.c_int32, i32p,
                                    i64p, ctypes.c_int32]
    lib.amq_sched_fill2.restype = ctypes.c_int32
    lib.amq_sched_preempt.argtypes = [ctypes.c_void_p, i32p, i64p, i32p,
                                      ctypes.c_int32]
    lib.amq_sched_preempt.restype = ctypes.c_int32
    lib.amq_sched_step.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int32]
    lib.amq_sched_step.restype = ctypes.c_int32
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.amq_sched_step2.argtypes = [ctypes.c_void_p, u8p, i32p,
                                    ctypes.c_int32]
    lib.amq_sched_step2.restype = ctypes.c_int32
    lib.amq_sched_active.argtypes = [ctypes.c_void_p]
    lib.amq_sched_active.restype = ctypes.c_int32
    lib.amq_sched_pending.argtypes = [ctypes.c_void_p]
    lib.amq_sched_pending.restype = ctypes.c_int64
    lib.amq_sched_prefill.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.amq_sched_prefill.restype = ctypes.c_int32


#: widths the C++ packer implements (bitpack.py additionally plane-splits
#: 5/6-bit — jnp-only; callers fall back to bitpack for those)
_NATIVE_BITS = (1, 2, 3, 4, 8)


def pack_native(codes: np.ndarray, nbits: int,
                group_size: int = 128) -> Optional[np.ndarray]:
    """Native pack; None when the library or the width is unavailable."""
    lib = get_lib()
    if lib is None or nbits not in _NATIVE_BITS:
        return None
    codes = np.ascontiguousarray(codes, np.uint32)
    K, N = codes.shape
    out = np.empty((K * nbits // 32, N), np.uint32)
    rc = lib.amq_pack(codes, out, K, N, group_size, nbits)
    if rc != 0:
        raise ValueError(f"amq_pack failed rc={rc}")
    return out


def unpack_native(words: np.ndarray, nbits: int, K: int,
                  group_size: int = 128) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None or nbits not in _NATIVE_BITS:
        return None
    words = np.ascontiguousarray(words, np.uint32)
    N = words.shape[1]
    out = np.empty((K, N), np.uint32)
    rc = lib.amq_unpack(words, out, K, N, group_size, nbits)
    if rc != 0:
        raise ValueError(f"amq_unpack failed rc={rc}")
    return out


class NativeScheduler:
    """Continuous-batching scheduler backed by the C++ core (numpy-free
    bookkeeping in the serving loop); falls back to the pure-Python
    ContinuousBatcher when the library is missing."""

    def __init__(self, n_slots: int):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.amq_sched_create(n_slots)
        self.n_slots = n_slots

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.amq_sched_destroy(self._h)
            self._h = None

    def submit(self, uid: int, max_new_tokens: int, priority: int = 0,
               prompt_len: int = 0):
        self._lib.amq_sched_submit2(self._h, uid, max_new_tokens,
                                    priority, prompt_len)

    def fill(self, prefill_budget: int = 0):
        """Admit queued requests into free slots, highest priority first,
        keeping this call's admitted prompt tokens within
        ``prefill_budget`` (0 = uncapped; one admission always allowed)."""
        slots = np.empty(self.n_slots, np.int32)
        uids = np.empty(self.n_slots, np.int64)
        n = self._lib.amq_sched_fill2(self._h, prefill_budget, slots, uids,
                                      self.n_slots)
        return list(zip(slots[:n].tolist(), uids[:n].tolist()))

    def preempt(self):
        """Evict active slots outprioritized by pending requests; returns
        [(slot, uid, generated_so_far)].  Victims re-enter the queue with
        their token count preserved (the engine re-prefills
        prompt + generated on re-admission)."""
        slots = np.empty(self.n_slots, np.int32)
        uids = np.empty(self.n_slots, np.int64)
        gen = np.empty(self.n_slots, np.int32)
        n = self._lib.amq_sched_preempt(self._h, slots, uids, gen,
                                        self.n_slots)
        return list(zip(slots[:n].tolist(), uids[:n].tolist(),
                        gen[:n].tolist()))

    def step(self, mask=None):
        """Record one decoded token per active slot (restricted to
        ``mask`` when given — slots mid-chunked-prefill are occupied but
        not decoding); returns retired slot indices."""
        retired = np.empty(self.n_slots, np.int32)
        if mask is None:
            n = self._lib.amq_sched_step(self._h, retired, self.n_slots)
        else:
            m = np.ascontiguousarray(np.asarray(mask, np.uint8))
            n = self._lib.amq_sched_step2(self._h, m, retired, self.n_slots)
        return retired[:n].tolist()

    def prefill(self, slot: int) -> bool:
        """Record the prefill's first token for ``slot``; True if retired."""
        r = self._lib.amq_sched_prefill(self._h, slot)
        if r < 0:
            # a real error, not a control value: under `python -O` an
            # assert would vanish and -1 would read as "retired"
            raise RuntimeError(f"prefill on empty slot {slot}")
        return bool(r)

    @property
    def active(self) -> int:
        return self._lib.amq_sched_active(self._h)

    @property
    def pending(self) -> int:
        return self._lib.amq_sched_pending(self._h)
