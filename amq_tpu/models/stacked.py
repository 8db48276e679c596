"""Stacked-layer model: lax.scan over layers with per-layer bit switching.

Why this exists (TPU/axon facts measured on this backend):
* remote compilation rejects large programs (HTTP 413) — a 32-layer model
  unrolled in Python produces an HLO too big to ship; a ``lax.scan`` over
  stacked layer parameters keeps the program O(1) in depth,
* per-jit-call dispatch is ~25 ms over the tunnel — generation must run
  entirely on device (scan over steps), which requires the per-layer loop
  to be a scan as well.

Mixed precision: for every linear site the three per-bit packed stacks
(``[L, rows_b, N]``) are closed over as constants, and a per-layer int32
selector drives a ``lax.switch`` whose branches each dynamic-index *their
own* stack — XLA executes only the selected branch, so HBM traffic per
layer is exactly the selected bit-width.  Changing the architecture is a
new selector vector: no retrace, no re-stitch (cf. the reference's
per-layer module setattr, amq_speed_benchmark.py:233-251).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.quantize import QuantizedTensor
from .config import LINEAR_NAMES, ModelConfig
from .linear import QuantLinear
from . import linear as linear_mod  # _KERNEL_IMPL read at trace time
from . import llama


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedQuant:
    """One linear site across all layers at one bit-width."""

    packed: jnp.ndarray  # [L, K*b/32, N]
    scale: jnp.ndarray   # [L, K/g, N]
    zero: jnp.ndarray    # [L, K/g, N]
    nbits: int = dataclasses.field(metadata=dict(static=True))
    group_size: int = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))  # (out, in)
    superblock: int = dataclasses.field(default=0, metadata=dict(static=True))

    def layer(self, i) -> QuantizedTensor:
        return QuantizedTensor(
            packed=jax.lax.dynamic_index_in_dim(self.packed, i, 0, False),
            scale=jax.lax.dynamic_index_in_dim(self.scale, i, 0, False),
            zero=jax.lax.dynamic_index_in_dim(self.zero, i, 0, False),
            nbits=self.nbits, group_size=self.group_size, shape=self.shape,
            superblock=self.superblock)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedModel:
    """Whole decoder with stacked layers and per-layer bit selectors."""

    embed: jnp.ndarray
    final_norm: jnp.ndarray
    lm_head: Optional[jnp.ndarray]          # [vocab, H] or None (tied)
    input_norm: jnp.ndarray                 # [L, H]
    post_norm: jnp.ndarray                  # [L, H]
    sites: Dict[str, Tuple[StackedQuant, ...]]  # name -> per-bit stacks
    biases: Dict[str, Optional[jnp.ndarray]]    # name -> [L, out] or None
    select: Dict[str, jnp.ndarray]              # name -> [L] int32
    bits_range: tuple = dataclasses.field(metadata=dict(static=True))
    num_layers: int = dataclasses.field(metadata=dict(static=True))
    #: every site shares one per-layer selector -> whole-layer switch
    uniform_select: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    #: container-merged models (merge_containers): per-layer index into
    #: the COMPACT per-container stacks; None -> stacks are [L]-indexed
    slots: Optional[jnp.ndarray] = None
    #: nibble-folded eval models (fold_nibble_eval): per-SITE per-layer
    #: index into the selected branch's stack (the folded nibble stack
    #: holds 3-bit layers at [0, L) and 4-bit at [L, 2L)).  None for
    #: every serving/decode model.
    site_slots: Optional[Dict[str, jnp.ndarray]] = None
    #: quantized lm_head (stack_proxies(head_bits=...)): at decode the
    #: bf16 head is ~0.35 ms/token of pure weight stream on Llama-2-7B
    #: (scripts/profile_decode.py); an 8-bit packed head halves it.  When
    #: set it replaces lm_head/embed in the logits matmul.
    lm_head_qt: Optional[QuantizedTensor] = None


# fused site groups: one kernel launch for q/k/v and for gate/up (same
# input, outputs concatenated along lanes).  Only valid when the arch
# assigns equal bits to every member in a layer.
FUSED_GROUPS = {
    "self_attn.qkv_proj": ("self_attn.q_proj", "self_attn.k_proj",
                           "self_attn.v_proj"),
    "mlp.gateup_proj": ("mlp.gate_proj", "mlp.up_proj"),
}


def _pick_lane_pad(n_total: int) -> int:
    """Zero-pad the lane count so the decode n-tile stays big: per-grid-
    step overhead (~0.35 us), not just bytes, limits small-tile sites —
    on Qwen2.5-7B the unpadded 4608/3584-lane qkv/o sites fell to bn=512
    (63/49 grid steps, 31% of their byte roofline).

    2560 (20 lanes of 128) joins the power-of-two tiles: 13B's 5120-lane
    o/down sites run 2 x 2560 at 81/89% of their byte roofline vs 5 x
    1024 at 58/73% (scripts/bisect12.py), and its 15360-lane qkv needs
    NO pad (6 x 2560) instead of +1024 lanes.  In-model calibration
    (bench.py): trading EXTRA pad bytes for the 2560 tile over 2048
    LOSES (7B qkv/gateup padded to 2560 multiples: 170.4 -> 164.9
    tok/s), so between the two big tiles the smaller pad wins (ties ->
    fewer grid steps); padding up to reach 2048 over 1024 stays the
    measured win it always was (Qwen2.5-7B 67 -> 112 tok/s).  Pad is
    bounded at <= n/7 per tile size."""
    bound = n_total // 7
    best = None                       # (pad, steps, mult)
    for mult in (2560, 2048):
        pad = -n_total % mult
        key = (pad, (n_total + pad) // mult)
        if pad <= bound and (best is None or key < best[:2]):
            best = key + (mult,)
    if best is not None:
        return best[0]
    pad = -n_total % 1024
    return pad if pad <= bound else 0


def _arch_fusable(arch: Optional[Dict], L: int) -> bool:
    if arch is None:
        return True
    for members in FUSED_GROUPS.values():
        for i in range(L):
            if len({int(arch["linear"][m][i]) for m in members}) > 1:
                return False
    return True


def quantize_head(head_w: jnp.ndarray, nbits: int = 8,
                  group_size: int = 128, meta_dtype=jnp.bfloat16,
                  lane_tile: int = 2048):
    """Quantize an ``[vocab, H]`` lm_head for packed serving.

    The vocab (lane) dim is zero-padded to the decode-GEMV n-tile so the
    kernel runs few large grid steps (32000 -> 32768 = 16 x 2048); pad
    lanes dequantize to 0 and are sliced off by the kernel wrapper
    (``shape`` stays the logical vocab).
    """
    from ..core.quantize import quantize
    V, H = head_w.shape
    pad = -V % lane_tile
    Wp = jnp.pad(head_w.astype(jnp.float32), ((0, pad), (0, 0)))
    qt = quantize(Wp, nbits=nbits, group_size=group_size,
                  meta_dtype=meta_dtype)
    return dataclasses.replace(qt, shape=(V, H))


def apply_head(model: StackedModel, x: jnp.ndarray, compute_dtype):
    """Logits matmul: packed head when quantized, bf16 dot otherwise.

    x: [..., H] -> [..., vocab] float32.
    """
    if model.lm_head_qt is not None:
        from ..ops.quant_matmul import quant_matmul, quant_matmul_reference
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if (linear_mod._KERNEL_IMPL is not None
                and not (_PREFILL_XLA_M and x2.shape[0] >= _PREFILL_XLA_M)):
            out = quant_matmul(x2, model.lm_head_qt, out_dtype=jnp.float32)
        else:
            out = quant_matmul_reference(x2, model.lm_head_qt,
                                         out_dtype=jnp.float32)
        return out.reshape(*lead, model.lm_head_qt.out_features)
    head = model.lm_head if model.lm_head is not None else model.embed
    return jnp.dot(x, head.T.astype(compute_dtype),
                   preferred_element_type=jnp.float32)


#: serving default: 3-bit codes ride the 4-bit kernel path (the decode
#: GEMV is VPU-extraction-bound; nibble extraction is ~2x faster than the
#: 2+1-plane recombination at +1/3 streamed bytes — core.quantize
#: .to_container).  Pass {} for capacity-optimal native packing.
SERVE_CONTAINERS = {3: 4}


def stack_proxies(proxies: Sequence[Dict[str, Any]],
                  bits_range: Sequence[int],
                  arch: Optional[Dict] = None,
                  fuse: str = "auto",
                  container_bits: Optional[Dict[int, int]] = None,
                  head_bits: Optional[int] = None,
                  head_meta_dtype=jnp.bfloat16,
                  device=None,
                  lane_pad: bool = True,
                  ) -> StackedModel:
    """Fold per-bit quantized pytrees (quantize_model outputs) into a
    StackedModel.

    ``fuse``: 'auto' fuses q/k/v and gate/up into single kernel launches
    when the arch's bits agree within each group (launch overhead on this
    backend makes call count matter); 'never' keeps the 7 separate sites.

    ``container_bits``: logical bit-width -> packed container width (e.g.
    ``SERVE_CONTAINERS``); codes/scales are untouched, only the stream
    width changes.  Default None = native packing (eval/tests).

    ``head_bits``: quantize the lm_head (or the tied embedding's logits
    role) to this width for packed serving (see :func:`quantize_head`);
    None keeps the dense bf16 head (the reference's fp16-head behavior).

    Elements of ``proxies`` may be zero-arg CALLABLES returning the
    per-bit pytree: each is built, folded into its per-bit stacks, and
    freed before the next — at 7B the three device-resident proxies
    (~8.5 GB) plus their stacked copies cannot coexist on a 16 GB chip.
    Dense parts (embed/norms/head) are device_put here: a host-resident
    input pytree would otherwise be re-shipped on EVERY jitted call.
    """
    from ..core.quantize import to_container
    container_bits = container_bits or {}

    site_names: Optional[Dict[str, Tuple[str, ...]]] = None
    per_bit: Dict[str, List[StackedQuant]] = {}
    biases: Dict[str, Optional[jnp.ndarray]] = {}
    select: Dict[str, jnp.ndarray] = {}
    base_parts: Dict[str, Any] = {}

    for bi, (bit, p) in enumerate(zip(bits_range, proxies)):
        if callable(p):
            p = p()
        L = len(p["layers"])
        if site_names is None:
            do_fuse = (fuse == "always"
                       or (fuse == "auto" and _arch_fusable(arch, L)))
            site_names = (
                {**FUSED_GROUPS, "self_attn.o_proj": ("self_attn.o_proj",),
                 "mlp.down_proj": ("mlp.down_proj",)} if do_fuse
                else {n: (n,) for n in LINEAR_NAMES})
            per_bit = {n: [] for n in site_names}
        for name, members in site_names.items():
            cont = container_bits.get(bit, bit)
            per_layer = []
            for i in range(L):
                qts = [to_container(p["layers"][i][m].qt, cont)
                       for m in members]
                per_layer.append(qts)
            q0 = per_layer[0][0]
            n_total = sum(q.shape[0] for q in per_layer[0])
            # round the lane (out-feature) count up to the decode-GEMV
            # n-tile when the pad is bounded: fused gate|up at 7B is
            # 22016 lanes -> 22528 (11 x 2048 tiles; per-grid-step cost
            # dominates the GEMV).  4096 tiles win on an isolated chain
            # but LOSE in-model (the 8 MB codes operand starves the
            # attention/cache pipeline — bisect9 vs bench).  Pad columns
            # are zero -> sliced off by the kernel wrappers.
            # lane pads serve the decode GEMV n-tiles; evaluator stacks
            # (large-M XLA route only) skip them — pads there are pure
            # HBM waste (~0.45 GiB over three 7B stacks)
            n_pad = _pick_lane_pad(n_total) if lane_pad else 0
            pad3 = ((0, 0), (0, 0), (0, n_pad))
            per_bit[name].append(StackedQuant(
                packed=jnp.pad(jnp.stack([jnp.concatenate(
                    [q.packed for q in qts], axis=1)
                    for qts in per_layer]), pad3),
                scale=jnp.pad(jnp.stack([jnp.concatenate(
                    [q.scale for q in qts], axis=1)
                    for qts in per_layer]), pad3),
                zero=jnp.pad(jnp.stack([jnp.concatenate(
                    [q.zero for q in qts], axis=1)
                    for qts in per_layer]), pad3),
                nbits=q0.nbits, group_size=q0.group_size,
                shape=(n_total, q0.shape[1]), superblock=q0.superblock))
        if bi == len(list(bits_range)) - 1:   # dense parts from the last bit
            for name, members in site_names.items():
                b0 = p["layers"][0][members[0]].bias
                if b0 is None:
                    biases[name] = None
                else:
                    biases[name] = jnp.stack([
                        jnp.concatenate([jnp.asarray(p["layers"][i][m].bias)
                                         for m in members])
                        for i in range(L)])
                    biases[name] = jax.device_put(
                        biases[name],
                        device if device is not None else jax.devices()[0])
                if arch is None:
                    sel = [len(bits_range) - 1] * L
                else:
                    sel = [list(bits_range).index(
                        int(arch["linear"][members[0]][i]))
                        for i in range(L)]
                select[name] = jnp.asarray(sel, jnp.int32)
            head = p.get("lm_head")
            # explicit device_put TO THE ACCELERATOR: jnp.asarray (and a
            # device-less device_put) keep a committed host jax.Array on
            # the host, and a host-resident embed/head in the returned
            # model is re-shipped over the tunnel on EVERY jitted call
            # (~0.5 GB/call, in the transfer regime where the tunnel
            # collapses ~20x — measured 5.1 s/sample before this).
            # ``device`` may be a Device or a Sharding (mesh-replicated
            # placement for data-parallel evaluation).
            dev = device if device is not None else jax.devices()[0]
            base_parts = {
                "embed": jax.device_put(p["embed"], dev),
                "final_norm": jax.device_put(p["final_norm"], dev),
                "head_w": (None if head is None
                           else jax.device_put(head.weight, dev)),
                "input_norm": jax.device_put(
                    jnp.stack([jnp.asarray(p["layers"][i]["input_norm"])
                               for i in range(L)]), dev),
                "post_norm": jax.device_put(
                    jnp.stack([jnp.asarray(p["layers"][i]["post_norm"])
                               for i in range(L)]), dev),
                "L": L,
            }
        del p                                   # free this bit's proxy

    assert site_names is not None and base_parts, "empty proxies"
    sites = {name: tuple(stacks) for name, stacks in per_bit.items()}
    L = base_parts["L"]

    head_qt = None
    if head_bits is not None:
        head_w = (base_parts["head_w"] if base_parts["head_w"] is not None
                  else base_parts["embed"])
        head_qt = quantize_head(head_w, nbits=head_bits,
                                meta_dtype=head_meta_dtype)
    return StackedModel(
        embed=base_parts["embed"],
        final_norm=base_parts["final_norm"],
        lm_head=(None if base_parts["head_w"] is None or head_qt is not None
                 else base_parts["head_w"]),
        lm_head_qt=head_qt,
        input_norm=base_parts["input_norm"],
        post_norm=base_parts["post_norm"],
        sites=sites, biases=biases, select=select,
        bits_range=tuple(bits_range), num_layers=L,
        # only commit to the whole-layer-switch structure when built for a
        # concrete layer-uniform arch (arch=None keeps per-site switching
        # so set_arch may swap in any mixed assignment without retracing)
        uniform_select=(arch is not None and _selectors_uniform(select)))


def merge_containers(model: StackedModel) -> StackedModel:
    """Collapse per-bit stacks of EQUAL container width into one branch.

    With ``SERVE_CONTAINERS`` the 3-bit and 4-bit stacks are both
    nibble-packed, yet as separate ``lax.switch`` branches they cost ~1
    ms/token on Llama-2-7B decode (mixed 2/3/4 ran 8.36 ms vs 6.57 for a
    2-branch 2/4 mix and 7.83 for a 2-branch 3/4 mix — branch
    heterogeneity, not the cond itself, breaks cross-layer pipelining).
    This builds ONE compact stack per distinct width holding exactly the
    layers assigned to it (HBM = exactly the arch's container bits) plus
    a per-layer ``slots`` vector mapping the layer index into its
    compact stack.  Requires a layer-uniform arch; the result is
    arch-specific (``set_arch`` on it raises — rebuild instead).
    """
    assert model.uniform_select, "container merge needs a layer-uniform arch"
    first = next(iter(model.select))
    sel = np.asarray(model.select[first])                    # [L] bit idx
    widths = [model.sites[first][b].nbits for b in range(len(model.bits_range))]
    containers = sorted(set(widths))
    cont_of_bit = {b: containers.index(w) for b, w in enumerate(widths)}

    layer_cont = np.array([cont_of_bit[int(b)] for b in sel])
    # drop containers no layer uses
    used = [c for c in range(len(containers)) if (layer_cont == c).any()]
    remap = {c: j for j, c in enumerate(used)}
    layer_cont = np.array([remap[int(c)] for c in layer_cont])
    slots = np.zeros(model.num_layers, np.int32)
    members: List[List[int]] = [[] for _ in used]
    for i in range(model.num_layers):
        c = int(layer_cont[i])
        slots[i] = len(members[c])
        members[c].append(i)

    def gather(arr_by_bit, c):
        # compact [Lc, ...] stack: layer i's slice taken from the stack
        # of its arch-selected bit (same width within a container)
        return jnp.stack([arr_by_bit[int(sel[i])][i] for i in members[c]])

    sites: Dict[str, Tuple[StackedQuant, ...]] = {}
    for name, stacks in model.sites.items():
        merged = []
        for c in range(len(used)):
            s0 = stacks[[b for b in range(len(stacks))
                         if remap.get(cont_of_bit[b]) == c][0]]
            merged.append(StackedQuant(
                packed=gather([s.packed for s in stacks], c),
                scale=gather([s.scale for s in stacks], c),
                zero=gather([s.zero for s in stacks], c),
                nbits=s0.nbits, group_size=s0.group_size,
                shape=s0.shape, superblock=s0.superblock))
        sites[name] = tuple(merged)

    select = {name: jnp.asarray(layer_cont, jnp.int32)
              for name in model.select}
    return dataclasses.replace(
        model, sites=sites, select=select,
        bits_range=tuple(containers[c] for c in used),
        slots=jnp.asarray(slots), uniform_select=True)


def fold_nibble_eval(model: StackedModel) -> StackedModel:
    """Fold the two equal-width (nibble) per-bit stacks into ONE stack so
    the eval switch has only TWO branch programs.

    Input: an eval model from ``stack_proxies(bits_range=(2, 3, 4),
    container_bits={3: 4})`` — per-site stacks of widths (2, 4, 4), the
    3-bit codes already in nibble containers.  Output: per-site stacks
    ``(2-bit [L,...], nibble [2L,...])`` with the 3-bit layers at rows
    [0, L) and the 4-bit layers at [L, 2L), plus per-site slot vectors
    (``site_slots``) mapping layer -> row.  Same bytes, same numerics —
    but the 32-layer switch-scan loss program compiles TWO branch bodies
    instead of three, which is the shape the round-4 sensitivity stage
    proved executable at 7B on one chip (docs/MEASUREMENTS.md, "r5: the
    7B search-stage eval OOM").

    Use :func:`arch_fold_selectors` for per-arch selector/slot updates
    (``set_arch`` raises on folded models).
    """
    assert model.slots is None and model.site_slots is None
    L = model.num_layers
    sites: Dict[str, Tuple[StackedQuant, ...]] = {}
    select: Dict[str, jnp.ndarray] = {}
    site_slots: Dict[str, jnp.ndarray] = {}
    for name, stacks in model.sites.items():
        widths = [s.nbits for s in stacks]
        assert widths == [2, 4, 4], (
            f"{name}: fold_nibble_eval expects container widths (2,4,4) "
            f"— build with container_bits={{3: 4}} — got {widths}")
        s2, s3n, s4 = stacks
        nib = StackedQuant(
            packed=jnp.concatenate([s3n.packed, s4.packed], axis=0),
            scale=jnp.concatenate([s3n.scale, s4.scale], axis=0),
            zero=jnp.concatenate([s3n.zero, s4.zero], axis=0),
            nbits=4, group_size=s4.group_size, shape=s4.shape,
            superblock=s4.superblock)
        sites[name] = (s2, nib)
        old = model.select[name]                       # [L] in {0, 1, 2}
        select[name] = (old != 0).astype(jnp.int32)
        ar = jnp.arange(L, dtype=jnp.int32)
        site_slots[name] = jnp.where(old == 2, L + ar, ar)
    return dataclasses.replace(
        model, sites=sites, select=select, site_slots=site_slots,
        bits_range=(2, 4), uniform_select=False)


def arch_fold_selectors(model: StackedModel, arch: Dict,
                        bits_range=(2, 3, 4)):
    """(select, site_slots) dicts realizing ``arch`` on a nibble-folded
    eval model — treedef-stable, so per-arch swaps never retrace."""
    L = model.num_layers
    rep = {**FUSED_GROUPS, **{n: (n,) for n in LINEAR_NAMES}}
    select, site_slots = {}, {}
    for name in model.sites:
        bits = np.asarray(arch["linear"][rep[name][0]], np.int32)
        assert bits.shape == (L,)
        select[name] = jnp.asarray((bits != 2).astype(np.int32))
        ar = np.arange(L, dtype=np.int32)
        site_slots[name] = jnp.asarray(np.where(bits == 4, L + ar, ar))
    return select, site_slots


def set_arch(model: StackedModel, arch: Dict) -> StackedModel:
    """New selector vectors for ``arch`` — same treedef, no retrace."""
    if model.slots is not None:
        raise AssertionError(
            "container-merged model is arch-specific; rebuild via "
            "stack_proxies + merge_containers")
    if model.site_slots is not None:
        select, site_slots = arch_fold_selectors(model, arch)
        return dataclasses.replace(model, select=select,
                                   site_slots=site_slots)
    fused = "self_attn.qkv_proj" in model.sites
    if fused:
        assert _arch_fusable(arch, model.num_layers), (
            "arch mixes bits inside a fused q/k/v or gate/up group; "
            "rebuild with stack_proxies(..., fuse='never')")
    names = model.sites.keys()
    rep = {**FUSED_GROUPS,
           **{n: (n,) for n in LINEAR_NAMES}}
    select = {
        name: jnp.asarray(
            [model.bits_range.index(int(b))
             for b in arch["linear"][rep[name][0]]], jnp.int32)
        for name in names
    }
    # uniform_select is a *structural* (static) property fixed at stack
    # time; changing it would retrace, so archs must stay compatible
    if model.uniform_select and not _selectors_uniform(select):
        raise AssertionError(
            "arch mixes bits across sites of a layer-uniform model; "
            "rebuild with a per-site arch (stack_proxies(..., arch=...))")
    return dataclasses.replace(model, select=select)


#: token count at/above which the stacked linears leave the Pallas GEMV
#: template for XLA's dequantize-then-matmul: the template's multi-m
#: scratch path is tuned for decode and measured 29% MFU at prompt 2048,
#: while XLA fuses the dequant into its own large-M matmul tiling (the
#: eval path's measured choice, evaluation/evaluator.py docstring).
#: AMQ_PREFILL_XLA_M=0 disables the rerouting (A/B runs).
_PREFILL_XLA_M = int(os.environ.get("AMQ_PREFILL_XLA_M", "256"))


def _apply_stack(stack: StackedQuant, i, x, compute_dtype):
    """Apply layer ``i`` of one bit-stack (no switch).

    With a kernel impl installed, the layer index goes into the Pallas
    kernel as a scalar-prefetch BlockSpec index (DMA straight from the
    stacked buffer); the XLA path dynamic-slices the layer instead.
    Large-M (prefill/eval) calls always take the XLA dequant-matmul
    (see _PREFILL_XLA_M).
    """
    impl = linear_mod._KERNEL_IMPL
    if impl is not None and stack.superblock:
        from ..ops.quant_matmul import quant_matmul_indexed
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if _PREFILL_XLA_M and x2.shape[0] >= _PREFILL_XLA_M:
            ql = QuantLinear(qt=stack.layer(i), bias=None)
            return linear_mod.apply_linear(ql, x, compute_dtype)
        out = quant_matmul_indexed(
            x2, stack.packed, stack.scale, stack.zero, i,
            nbits=stack.nbits, group_size=stack.group_size,
            shape=stack.shape, superblock=stack.superblock,
            acc_dtype=(jnp.bfloat16 if x.dtype == jnp.bfloat16
                       else jnp.float32),
            out_dtype=compute_dtype)
        return out.reshape(*lead, stack.shape[0])
    ql = QuantLinear(qt=stack.layer(i), bias=None)
    if impl is not None:
        return impl(ql, x, compute_dtype)
    return linear_mod.apply_linear(ql, x, compute_dtype)


def _apply_down_swiglu(model: StackedModel, i, gate, up, compute_dtype,
                       bit_idx: Optional[int] = None):
    """down-proj consuming (gate, up) with silu*mul fused into the kernel
    prologue when the Pallas impl is active (one fewer pipeline boundary
    per layer); falls back to elementwise-then-matmul otherwise."""
    impl = linear_mod._KERNEL_IMPL
    name = "mlp.down_proj"
    si = _site_index(model, name, i)

    def stack_branch(stack: StackedQuant):
        def br(operand):
            g, u = operand
            g2_rows = int(np.prod(g.shape[:-1]))
            if (impl is not None and stack.superblock
                    and not (_PREFILL_XLA_M and g2_rows >= _PREFILL_XLA_M)):
                from ..ops.quant_matmul import quant_matmul_swiglu_indexed
                lead = g.shape[:-1]
                g2 = g.reshape(-1, g.shape[-1])
                u2 = u.reshape(-1, u.shape[-1])
                out = quant_matmul_swiglu_indexed(
                    g2, u2, stack.packed, stack.scale, stack.zero, si,
                    nbits=stack.nbits, group_size=stack.group_size,
                    shape=stack.shape, superblock=stack.superblock,
                    acc_dtype=(jnp.bfloat16 if g.dtype == jnp.bfloat16
                               else jnp.float32),
                    out_dtype=compute_dtype)
                return out.reshape(*lead, stack.shape[0])
            act = (jax.nn.silu(g.astype(jnp.float32)).astype(compute_dtype)
                   * u)
            return _apply_stack(stack, si, act, compute_dtype)
        return br

    if bit_idx is not None:
        y = stack_branch(model.sites[name][bit_idx])((gate, up))
    else:
        y = jax.lax.switch(model.select[name][i],
                           [stack_branch(s) for s in model.sites[name]],
                           (gate, up))
    if model.biases[name] is not None:
        y = y + jax.lax.dynamic_index_in_dim(
            model.biases[name], i, 0, False).astype(y.dtype)
    return y


def _apply_mlp_merged(model: StackedModel, i, h, compute_dtype,
                      bit_idx: Optional[int]):
    """Whole-MLP megakernel (gateup + SwiGLU + down in ONE pallas_call,
    ops/quant_matmul.quant_matmul_mlp_indexed) when it applies; ``None``
    otherwise (caller falls back to the separate-call path).

    Applies at decode GEMV shapes (B*S <= 8, bf16) with the Pallas impl
    active, a hoisted static ``bit_idx`` (whole-layer switch), matching
    packed layouts between the gateup/down stacks, and no MLP biases.

    OPT-IN (AMQ_MLP_KERNEL=1): measured cost-neutral-to-negative on v5e
    at 7B decode (4-bit-container layer MLP 108.4 us merged vs 106.9
    separate; headline 168.3 vs 170.6 tok/s) — the pallas_call boundary
    it removes was already fully overlapped by the backend.  Kept as the
    measured data point for the "layer megakernel" roadmap idea.
    """
    if bit_idx is None or compute_dtype != jnp.bfloat16:
        return None
    if linear_mod._KERNEL_IMPL is None or jax.default_backend() == "cpu":
        return None
    if os.environ.get("AMQ_MLP_KERNEL", "0") != "1":
        return None
    if ("mlp.gateup_proj" not in model.sites
            or "mlp.down_proj" not in model.sites):
        return None
    if (model.biases["mlp.gateup_proj"] is not None
            or model.biases["mlp.down_proj"] is not None):
        return None
    gu = model.sites["mlp.gateup_proj"][bit_idx]
    dn = model.sites["mlp.down_proj"][bit_idx]
    if not (gu.superblock and dn.superblock):
        return None
    if (gu.nbits != dn.nbits or gu.group_size != dn.group_size
            or gu.superblock != dn.superblock):
        return None
    lead = h.shape[:-1]
    M = 1
    for s in lead:
        if not isinstance(s, int):
            return None
        M *= s
    if M > 8:
        return None
    inter_real = gu.shape[0] // 2
    Np_gu = gu.packed.shape[2]
    Kp_d = dn.packed.shape[1] * 32 // dn.nbits
    if inter_real % 128 != 0 or inter_real + Kp_d > Np_gu:
        return None
    if gu.superblock // gu.group_size < 8:
        return None   # 4-D meta view would be a layout copy (_meta_tile)
    from ..ops.quant_matmul import quant_matmul_mlp_indexed
    si = _stack_index(model, i)
    out = quant_matmul_mlp_indexed(
        h.reshape(-1, h.shape[-1]), gu.packed, gu.scale, gu.zero,
        dn.packed, dn.scale, dn.zero, si,
        nbits=gu.nbits, group_size=gu.group_size,
        gu_shape=gu.shape, d_shape=dn.shape, superblock=gu.superblock,
        out_dtype=compute_dtype)
    return out.reshape(*lead, dn.shape[0])


def _stack_index(model: StackedModel, i):
    """Index of layer ``i`` inside the per-bit stacks: the layer number,
    or its compact-container slot for merged models (merge_containers)."""
    if model.slots is None:
        return i
    return jax.lax.dynamic_index_in_dim(model.slots, i, 0, False)


def _site_index(model: StackedModel, name: str, i):
    """Per-site stack index: nibble-folded eval models map layer ``i``
    through their per-site slot vectors; everything else through
    :func:`_stack_index`."""
    if model.site_slots is not None:
        return jax.lax.dynamic_index_in_dim(
            model.site_slots[name], i, 0, False)
    return _stack_index(model, i)


def _apply_site(model: StackedModel, name: str, i, x, compute_dtype,
                bit_idx: Optional[int] = None):
    """One linear site of layer ``i``.

    ``bit_idx`` static -> direct stack application (the caller hoisted the
    bit decision, e.g. a per-layer switch); otherwise a lax.switch over
    the per-bit stacks — only the chosen branch reads HBM.
    """
    si = _site_index(model, name, i)
    if bit_idx is not None:
        y = _apply_stack(model.sites[name][bit_idx], si, x, compute_dtype)
    else:
        y = jax.lax.switch(
            model.select[name][i],
            [(lambda s: lambda x: _apply_stack(s, si, x, compute_dtype))(s)
             for s in model.sites[name]], x)
    if model.biases[name] is not None:
        y = y + jax.lax.dynamic_index_in_dim(
            model.biases[name], i, 0, False).astype(y.dtype)
    return y


def _selectors_uniform(select: Dict[str, Any]) -> bool:
    """Concrete (non-traced) check that all sites share one selector."""
    sels = [np.asarray(s) for s in select.values()]
    return all((s == sels[0]).all() for s in sels[1:])


def layer_uniform(model: StackedModel) -> bool:
    """True when every site shares one per-layer bit selector — the whole
    decoder layer then sits under a single lax.switch (4x fewer conds;
    conds cost ~10s of us each inside a scan on this backend).  Static
    metadata: computed when the model/arch is built, never from tracers."""
    return model.uniform_select


def scan_layers(
    model: StackedModel,
    cfg: ModelConfig,
    x: jnp.ndarray,                            # [B, S, H]
    cache_kv=None,                             # (k, v) [L, B, kv, T, hd]
    offset=None,
    compute_dtype=jnp.bfloat16,
    tp_axis: Optional[str] = None,
    start_layer=None,
    stop_layer=None,
):
    """The decoder-layer scan only (no embed / final norm / head).

    Factored out of :func:`forward_stacked` so pipeline parallelism can
    run a stage-local chunk of layers on an already-embedded activation
    (parallel/pp.py).  Returns ``(x, (k_app, v_app) or None)`` where
    k_app/v_app are the APPENDED keys/values ``[L, B, kv, S, hd]`` in the
    cache dtype — the caller writes them into the cache once, outside the
    layer scan (forward_stacked / pp.py).

    ``start_layer``/``stop_layer`` (dynamic int32 scalars) cond-skip the
    layers outside ``[start, stop)`` — the skipped layers stream no
    weights and run no FLOPs, only the per-layer cond.  Used by the
    sensitivity suffix evaluation (a probe arch differing from a baseline
    only at block b resumes from the baseline's cached block-b input).
    No-cache path only.
    """
    B, S, _ = x.shape
    hd = cfg.head_dim_
    if offset is None:
        offset = jnp.int32(0)
    if cache_kv is not None:
        T = cache_kv[0].shape[3]
    else:
        T = S
    positions = jnp.arange(S, dtype=jnp.int32)[None, :] + offset
    cos, sin = llama.rope_cos_sin(cfg, positions, dtype=compute_dtype)
    mask = None if cache_kv is not None else llama._causal_mask(
        S, T, offset, cfg.sliding_window)

    fused = "self_attn.qkv_proj" in model.sites
    has_cache = cache_kv is not None
    uniform = layer_uniform(model)
    first_site = next(iter(model.select))
    # decode attention kernel: flash-decode straight from the stacked
    # cache (no [B,kv,T,hd] slice materialization; DMA clamped to the
    # live context) — trace-time routing like the linear kernels
    # (AMQ_ATTN_KERNEL=0 forces the XLA split path, for A/B runs)
    use_attn_kernel = (
        has_cache and S == 1 and hd in (64, 128)
        and linear_mod._KERNEL_IMPL is not None
        and jax.default_backend() != "cpu"
        and os.environ.get("AMQ_ATTN_KERNEL", "1") != "0")

    # the KV cache is READ-ONLY inside the layer scan: attention runs
    # against (cache slice, this step's keys) via the split path — round-
    # tripping per-layer [B,kv,T,hd] buffers through scan xs/ys (slice out,
    # dynamic-update, write back) was measured at ~37 us/layer of pure
    # copy traffic on the decode step (scripts/profile_decode.py), ~1.2
    # ms/token at 7B; the new KV comes out as ys [L,B,kv,S,hd] instead
    def layer_body(i, x, bit_idx):
        h = llama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(model.input_norm, i, 0, False),
            cfg.rms_norm_eps)
        if fused:
            qkv = _apply_site(model, "self_attn.qkv_proj", i, h,
                              compute_dtype, bit_idx)
            q = qkv[..., :cfg.q_dim]
            k = qkv[..., cfg.q_dim:cfg.q_dim + cfg.kv_dim]
            v = qkv[..., cfg.q_dim + cfg.kv_dim:]
        else:
            q = _apply_site(model, "self_attn.q_proj", i, h, compute_dtype,
                            bit_idx)
            k = _apply_site(model, "self_attn.k_proj", i, h, compute_dtype,
                            bit_idx)
            v = _apply_site(model, "self_attn.v_proj", i, h, compute_dtype,
                            bit_idx)
        q = llama.apply_rope(q.reshape(B, S, cfg.num_heads, hd), cos, sin)
        k = llama.apply_rope(k.reshape(B, S, cfg.num_kv_heads, hd), cos, sin)
        k = jnp.transpose(k, (0, 2, 1, 3))    # [B, Hkv, S, hd]
        v = jnp.transpose(v.reshape(B, S, cfg.num_kv_heads, hd), (0, 2, 1, 3))

        if use_attn_kernel:
            from ..ops.decode_attention import decode_attention_indexed
            Hkv = cfg.num_kv_heads
            G = cfg.num_heads // Hkv
            att = decode_attention_indexed(
                q.reshape(B, Hkv, G, hd), cache_kv[0], cache_kv[1],
                k.reshape(B, Hkv, hd), v.reshape(B, Hkv, hd),
                jnp.broadcast_to(jnp.asarray(offset, jnp.int32), (B,)),
                i, window=cfg.sliding_window,
                out_dtype=compute_dtype).reshape(B, S, cfg.num_heads, hd)
        elif has_cache:
            k_c = jax.lax.dynamic_index_in_dim(cache_kv[0], i, 0, False)
            v_c = jax.lax.dynamic_index_in_dim(cache_kv[1], i, 0, False)
            att = llama.attention_append(q, k_c, v_c, k, v, offset, S, T,
                                         cfg, compute_dtype)
        else:
            att = llama.attention(q, k, v, mask, offset, S, S, cfg,
                                  compute_dtype)
        att = att.reshape(B, S, cfg.num_heads * hd)
        o = _apply_site(model, "self_attn.o_proj", i, att, compute_dtype,
                        bit_idx)
        if tp_axis is not None:
            o = jax.lax.psum(o, tp_axis)
        x = x + o

        h = llama.rms_norm(
            x, jax.lax.dynamic_index_in_dim(model.post_norm, i, 0, False),
            cfg.rms_norm_eps)
        down = (_apply_mlp_merged(model, i, h, compute_dtype, bit_idx)
                if fused else None)
        if down is None:
            if fused:
                gu = _apply_site(model, "mlp.gateup_proj", i, h,
                                 compute_dtype, bit_idx)
                gate = gu[..., :cfg.intermediate_size]
                up = gu[..., cfg.intermediate_size:]
            else:
                gate = _apply_site(model, "mlp.gate_proj", i, h,
                                   compute_dtype, bit_idx)
                up = _apply_site(model, "mlp.up_proj", i, h, compute_dtype,
                                 bit_idx)
            down = _apply_down_swiglu(model, i, gate, up, compute_dtype,
                                      bit_idx)
        if tp_axis is not None:
            down = jax.lax.psum(down, tp_axis)
        x = x + down
        if has_cache:
            cd = cache_kv[0].dtype
            return x, k.astype(cd), v.astype(cd)
        return x, None, None

    def layer_fn(x, i):
        if uniform:
            # one switch wraps the whole layer (cond overhead is per
            # occurrence inside the scan; per-site switching costs 4x)
            x, k_app, v_app = jax.lax.switch(
                model.select[first_site][i],
                [(lambda b: lambda op: layer_body(op[0], op[1], b))(b)
                 for b in range(len(model.bits_range))],
                (i, x))
        else:
            x, k_app, v_app = layer_body(i, x, None)
        return x, ((k_app, v_app) if has_cache else None)

    if start_layer is not None or stop_layer is not None:
        assert cache_kv is None, "layer bounds: no-cache (eval) path only"
        inner_fn = layer_fn

        def layer_fn(x, i):  # noqa: F811
            lo = jnp.int32(0) if start_layer is None else start_layer
            hi = (jnp.int32(model.num_layers) if stop_layer is None
                  else stop_layer)
            return jax.lax.cond(
                jnp.logical_and(i >= lo, i < hi),
                lambda op: inner_fn(op[0], op[1]),
                lambda op: (op[0], None), (x, i))

    layer_idx = jnp.arange(model.num_layers, dtype=jnp.int32)
    x, kv_app = jax.lax.scan(layer_fn, x, layer_idx)
    return x, kv_app


def forward_stacked_suffix(model: StackedModel, cfg: ModelConfig,
                           x: jnp.ndarray, start_layer,
                           compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Logits from a cached block input: ``x`` [B, S, H] is the residual
    stream entering block ``start_layer``; blocks below it are cond-
    skipped (no weight DMA, no FLOPs).  With ``x`` from the baseline
    model, identical math to ``forward_stacked`` of an arch differing
    from the baseline only at blocks >= ``start_layer`` — the sensitivity
    stage's suffix evaluation (the per-probe cost drops from L to
    ``L - b`` blocks; ~48% of the 224-probe stage at L=32)."""
    x, _ = scan_layers(model, cfg, x, compute_dtype=compute_dtype,
                       start_layer=start_layer)
    x = llama.rms_norm(x, model.final_norm, cfg.rms_norm_eps)
    return apply_head(model, x, compute_dtype).astype(jnp.float32)


def forward_stacked(
    model: StackedModel,
    cfg: ModelConfig,
    tokens: jnp.ndarray,                       # [B, S]
    cache: Optional[llama.KVCache] = None,
    compute_dtype=jnp.bfloat16,
    tp_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, Optional[llama.KVCache]]:
    """Full forward as a lax.scan over layers (compile size O(1) in depth)."""
    B, S = tokens.shape
    x = model.embed[tokens].astype(compute_dtype)
    offset = cache.length if cache is not None else jnp.int32(0)
    x, kv_app = scan_layers(
        model, cfg, x,
        cache_kv=(cache.k, cache.v) if cache is not None else None,
        offset=offset, compute_dtype=compute_dtype, tp_axis=tp_axis)

    x = llama.rms_norm(x, model.final_norm, cfg.rms_norm_eps)
    logits = apply_head(model, x, compute_dtype)

    new_cache = None
    if cache is not None:
        # ONE append of this step's [L,B,kv,S,hd] keys; the cache is a
        # loop carry in the decode steps-scan, so XLA updates in place
        k = jax.lax.dynamic_update_slice_in_dim(
            cache.k, kv_app[0], offset, axis=3)
        v = jax.lax.dynamic_update_slice_in_dim(
            cache.v, kv_app[1], offset, axis=3)
        new_cache = llama.KVCache(k=k, v=v, length=cache.length + S)
    return logits.astype(jnp.float32), new_cache
