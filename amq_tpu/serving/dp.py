"""Mesh-data-parallel continuous batching: slots sharded over ``data``.

The reference's serving path is single-request ``generate`` on one GPU
(ftllama_generate.py); its only multi-device story is data-parallel
*evaluation* via Accelerate.  This module is the serving-side equivalent
of that contract scaled the TPU way: the slot axis of the continuous-
batching cache is sharded over a mesh's ``data`` axis with the model
replicated, and one ``shard_map``-ped decode step advances every shard's
slots simultaneously — no collectives on the decode path at all (each
slot's logits are local to its shard).  With ``jax.distributed`` meshes
the same program spans hosts, which is the BASELINE "continuous batching
across hosts" requirement; on one host it is validated on the virtual
CPU mesh (tests/test_batched_dp.py) and by ``__graft_entry__``'s dryrun.

Prefill is also shard_map-ped: the prompt is replicated, every shard runs
the (batch-1) forward redundantly, and only the shard owning the target
slot commits the KV — redundant FLOPs, zero cross-shard traffic, and the
prefill latency equals the single-chip prefill regardless of mesh size.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..models import llama
from ..models.config import ModelConfig
from ..models.linear import kernel_linears
from ..models.stacked import StackedModel
from .batched import SlotCache, SlotEngine, _decode_once, _model_forward


@partial(jax.jit,
         static_argnames=("cfg", "n_steps", "compute_dtype", "impl", "mesh"),
         donate_argnames=("k", "v", "lengths"))
def _dp_decode_chunk(model, cfg: ModelConfig, tokens, active,
                     k, v, lengths, *, mesh: Mesh, n_steps: int,
                     compute_dtype=jnp.bfloat16, impl=None):
    def local(model, tokens, active, k, v, lengths):
        cache = SlotCache(k=k, v=v, lengths=lengths)

        def step(carry, _):
            tok, cache = carry
            nxt, cache = _decode_once(model, cfg, tok, active, cache,
                                      compute_dtype, impl)
            return (nxt, cache), nxt

        (_, cache), toks = jax.lax.scan(step, (tokens, cache), None,
                                        length=n_steps)
        return jnp.moveaxis(toks, 0, 1), cache.k, cache.v, cache.lengths

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data"), P("data"),
                  P(None, "data"), P(None, "data"), P("data")),
        out_specs=(P("data"), P(None, "data"), P(None, "data"), P("data")),
        check_vma=False)
    return fn(model, tokens, active, k, v, lengths)


@partial(jax.jit,
         static_argnames=("cfg", "slot_len", "compute_dtype", "impl", "mesh"),
         donate_argnames=("k", "v", "lengths"))
def _dp_prefill(model, cfg: ModelConfig, tokens, true_len, slot,
                k, v, lengths, *, mesh: Mesh, slot_len: int,
                compute_dtype=jnp.bfloat16, impl=None):
    S = slot_len

    def local(model, tokens, true_len, slot, k, v, lengths):
        Bl = lengths.shape[0]
        ax = jax.lax.axis_index("data")
        lslot = slot - ax * Bl
        owned = jnp.logical_and(lslot >= 0, lslot < Bl)
        idx = jnp.clip(lslot, 0, Bl - 1)

        tmp = llama.KVCache(
            k=jnp.zeros_like(k[:, :1, :, :S]),
            v=jnp.zeros_like(v[:, :1, :, :S]),
            length=jnp.int32(0))
        with kernel_linears(impl):
            logits, tmp = _model_forward(model, cfg, tokens, tmp,
                                         compute_dtype)
        # only the owning shard commits the KV (slot-sized select, not a
        # whole-buffer select)
        cur_k = jax.lax.dynamic_slice(k, (0, idx, 0, 0, 0), tmp.k.shape)
        cur_v = jax.lax.dynamic_slice(v, (0, idx, 0, 0, 0), tmp.v.shape)
        k = jax.lax.dynamic_update_slice(
            k, jnp.where(owned, tmp.k, cur_k), (0, idx, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(
            v, jnp.where(owned, tmp.v, cur_v), (0, idx, 0, 0, 0))
        lengths = lengths.at[idx].set(
            jnp.where(owned, true_len, lengths[idx]))

        last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1, 0,
                                            False)
        nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)[None]
        # nxt is identical on every shard (replicated model + tokens)
        return nxt, k, v, lengths

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(),
                  P(None, "data"), P(None, "data"), P("data")),
        out_specs=(P(), P(None, "data"), P(None, "data"), P("data")),
        check_vma=False)
    return fn(model, tokens, true_len, slot, k, v, lengths)


class DPSlotEngine:
    """Continuous batching with the slot axis sharded over mesh 'data'.

    Drop-in for :class:`~amq_tpu.serving.batched.SlotEngine` (same
    ``prefill`` / ``step_chunk`` / ``run`` surface, reuse its ``run`` via
    inheritance-free duck typing) with ``n_slots = slots_per_shard *
    mesh.shape['data']`` total slots.
    """

    def __init__(self, model: StackedModel, cfg: ModelConfig, mesh: Mesh,
                 slots_per_shard: int = 1, max_len: int = 2048,
                 compute_dtype=jnp.bfloat16, use_pallas: bool = True,
                 prefill_buckets=(32, 64, 128, 256, 512, 1024, 2048),
                 chunk_steps: int = 1):
        from .engine import pallas_linear_impl
        assert "data" in mesh.axis_names, mesh.axis_names
        self.mesh = mesh
        self.cfg = cfg
        self.n_shards = mesh.shape["data"]
        self.n_slots = slots_per_shard * self.n_shards
        self.max_len = max_len
        self.compute_dtype = compute_dtype
        self.impl = pallas_linear_impl if use_pallas else None
        self.buckets = tuple(sorted(prefill_buckets))
        self.chunk_steps = chunk_steps

        repl = NamedSharding(mesh, P())
        self.model = jax.device_put(model, repl)
        cache = SlotCache.create(cfg, self.n_slots, max_len,
                                 dtype=compute_dtype)
        self.k = jax.device_put(cache.k, NamedSharding(mesh, P(None, "data")))
        self.v = jax.device_put(cache.v, NamedSharding(mesh, P(None, "data")))
        self.lengths = jax.device_put(cache.lengths,
                                      NamedSharding(mesh, P("data")))
        self.next_token = np.zeros(self.n_slots, np.int32)
        self._prefilling = {}

    # chunked prefill is host-local SlotEngine machinery; the DP engine
    # prefills whole prompts per shard — the borrowed state machine is a
    # no-op with prefill_chunk_len None (start_prefill -> self.prefill)
    prefill_chunk_len = None
    start_prefill = SlotEngine.start_prefill
    advance_prefills = SlotEngine.advance_prefills

    def _bucket(self, S: int) -> int:
        for b in self.buckets:
            if S <= b:
                return b
        raise ValueError(f"prompt too long: {S} > {self.buckets[-1]}")

    def prefill(self, slot: int, prompt: np.ndarray):
        S = len(prompt)
        bucket = self._bucket(S)
        padded = np.zeros(bucket, np.int32)
        padded[:S] = prompt
        nxt, self.k, self.v, self.lengths = _dp_prefill(
            self.model, self.cfg, jnp.asarray(padded)[None], jnp.int32(S),
            jnp.int32(slot), self.k, self.v, self.lengths,
            mesh=self.mesh, slot_len=bucket,
            compute_dtype=self.compute_dtype, impl=self.impl)
        self.next_token[slot] = int(nxt[0])

    def step_chunk(self, active_mask: np.ndarray,
                   n_steps: int) -> np.ndarray:
        toks, self.k, self.v, self.lengths = _dp_decode_chunk(
            self.model, self.cfg, jnp.asarray(self.next_token),
            jnp.asarray(active_mask), self.k, self.v, self.lengths,
            mesh=self.mesh, n_steps=n_steps,
            compute_dtype=self.compute_dtype, impl=self.impl)
        out = np.asarray(toks)  # [B, n_steps]
        self.next_token = np.where(active_mask, out[:, -1], self.next_token)
        return out

    def step(self, active_mask: np.ndarray) -> np.ndarray:
        return self.step_chunk(active_mask, 1)[:, 0]

    # the serving loop is identical to the host-local engine's
    run = SlotEngine.run
