"""Pipeline parallelism: layer-stage sharding + microbatched decode.

The reference's only model distribution is sequential block *placement*
via Accelerate device hooks (utils/func.py:79-98, utils/dispatch.py) — no
compute overlap.  Here the ``StackedModel``'s layer dimension shards over
a mesh 'stage' axis and microbatches flow through the stages GPipe-style
with ``ppermute`` (activations ride ICI), so all stages compute
concurrently — the BASELINE "70B-class across >= 2 hosts" serving shape.

Design (SPMD, shard_map over 'stage'):
* every ``[L, ...]`` leaf of the StackedModel (packed/scale/zero stacks,
  norms, biases, selectors) shards on the layer axis: stage ``s`` owns
  layers ``[s*L/S, (s+1)*L/S)``; embed / final norm / lm_head are
  replicated (stage 0 embeds, the last stage applies the head),
* the KV cache shards the same way (stage-local layers) — cache entries
  never move,
* a decode/prefill step runs ``S + n_micro - 1`` ticks: at tick ``t``
  stage ``s`` processes microbatch ``t - s`` (masked no-op outside the
  window), then activations rotate one stage forward via ppermute,
* the last stage's logits are psum-broadcast (they are zero elsewhere).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llama
from ..models.config import ModelConfig
from ..models.stacked import StackedModel, StackedQuant, scan_layers


def make_stage_mesh(n_stages: int, tp: int = 1) -> Mesh:
    """Stage mesh; with ``tp > 1`` a composed ('stage', 'tensor') mesh —
    each pipeline stage is itself a tensor-parallel group."""
    devs = jax.devices()
    assert len(devs) >= n_stages * tp, (len(devs), n_stages, tp)
    if tp > 1:
        return Mesh(np.array(devs[:n_stages * tp]).reshape(n_stages, tp),
                    ("stage", "tensor"))
    return Mesh(np.array(devs[:n_stages]), ("stage",))


def model_specs(model: StackedModel, tp: bool = False) -> StackedModel:
    """PartitionSpec pytree: layer-axis leaves on 'stage', rest replicated.

    ``tp=True``: the model is a TP-stacked one (parallel/tp_stacked —
    every leaf carries a leading shard axis); prefix each spec with
    'tensor' so stages shard layers and tensor shards lanes/rows.
    """
    pre = ("tensor",) if tp else ()

    def qspec(sq: StackedQuant) -> StackedQuant:
        s3 = P(*pre, "stage", None, None)
        return dataclasses.replace(sq, packed=s3, scale=s3, zero=s3)

    assert model.slots is None, (
        "container-merged stacks are compact per container and cannot be "
        "layer-partitioned over stages; build without merge_containers")
    return StackedModel(
        embed=P(*pre), final_norm=P(*pre),
        lm_head=None if model.lm_head is None else P(*pre),
        input_norm=P(*pre, "stage", None), post_norm=P(*pre, "stage", None),
        sites={k: tuple(qspec(s) for s in v)
               for k, v in model.sites.items()},
        biases={k: (None if b is None else P(*pre, "stage", None))
                for k, b in model.biases.items()},
        select={k: P(*pre, "stage") for k in model.select},
        bits_range=model.bits_range, num_layers=model.num_layers,
        uniform_select=model.uniform_select)


def cache_specs(tp: bool = False) -> llama.KVCache:
    pre = ("tensor",) if tp else ()
    return llama.KVCache(k=P(*pre, "stage", None, None, None, None),
                         v=P(*pre, "stage", None, None, None, None),
                         length=P())


def shard_model_pp(model: StackedModel, mesh: Mesh) -> StackedModel:
    specs = model_specs(model, tp="tensor" in mesh.axis_names)

    def put(x, s):
        if x is None or not hasattr(x, "shape"):
            return x
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(put, model, specs,
                        is_leaf=lambda x: x is None or isinstance(x, P))


def make_pp_step(cfg: ModelConfig, mesh: Mesh, model: StackedModel,
                 n_micro: int, seq_len: int, batch: int,
                 compute_dtype=jnp.bfloat16):
    """Build the jitted pipeline step.

    Returns ``step(model, tokens [B, S], cache) -> (last_logits [B, V],
    cache)`` with ``B = n_micro * micro_batch``.  One call = one full
    pipeline pass (prefill with seq_len > 1, decode with seq_len == 1);
    only the final position's logits are returned (what generation needs
    — broadcasting full prefill logits over stages would move
    B*S*V floats over ICI for nothing).
    """
    S = mesh.shape["stage"]
    tp = mesh.shape.get("tensor", 1) if "tensor" in mesh.axis_names else 1
    L = model.num_layers
    assert L % S == 0, (L, S)
    assert batch % n_micro == 0, (batch, n_micro)
    Bm = batch // n_micro
    H = cfg.hidden_size
    V = cfg.vocab_size
    n_ticks = S + n_micro - 1
    if tp > 1:
        from .tp_stacked import local_stacked_config
        scan_cfg = local_stacked_config(cfg, tp)
        assert model.lm_head_qt is None, (
            "pp x tp keeps the dense replicated head; build the TP model "
            "without head_bits")
    else:
        scan_cfg = cfg

    pspec = model_specs(model, tp=tp > 1)
    fwd_perm = [(i, (i + 1) % S) for i in range(S)]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspec, P(None, None), cache_specs(tp=tp > 1)),
             out_specs=(P(None, None), cache_specs(tp=tp > 1)),
             check_vma=False)
    def step(m, tokens, cache):
        if tp > 1:   # squeeze the leading TP shard axis (local size 1)
            m = jax.tree.map(lambda x: x[0], m)
            cache = llama.KVCache(k=cache.k[0], v=cache.v[0],
                                  length=cache.length)
        # m's [L,...] leaves are stage-local [L/S, ...]
        m_local = dataclasses.replace(m, num_layers=L // S)
        stage = jax.lax.axis_index("stage")
        offset = cache.length

        x_embed = m.embed[tokens].astype(compute_dtype)  # [B, S_tok, H]
        x_embed = x_embed.reshape(n_micro, Bm, seq_len, H)

        out0 = jnp.zeros((n_micro, Bm, V), jnp.float32)
        k0, v0 = cache.k, cache.v

        def tick(carry, t):
            x_in, out, k_all, v_all = carry
            mb = t - stage                       # this stage's microbatch
            active = jnp.logical_and(mb >= 0, mb < n_micro)
            idx = jnp.clip(mb, 0, n_micro - 1)
            # stage 0 ingests a fresh embedded microbatch each tick
            feed = jax.lax.dynamic_index_in_dim(
                x_embed, jnp.clip(t, 0, n_micro - 1), 0, False)
            x_cur = jnp.where(stage == 0, feed, x_in)

            # stage-local layer chunk on microbatch idx's cache rows;
            # the write-back is masked out when this stage is idle
            b0 = idx * Bm
            kc = jax.lax.dynamic_slice_in_dim(k_all, b0, Bm, axis=1)
            vc = jax.lax.dynamic_slice_in_dim(v_all, b0, Bm, axis=1)
            x_out, (k_app, v_app) = scan_layers(
                m_local, scan_cfg, x_cur, cache_kv=(kc, vc),
                offset=offset, compute_dtype=compute_dtype,
                tp_axis="tensor" if tp > 1 else None)
            # scan_layers returns only the APPENDED keys [L,Bm,kv,S,hd];
            # write just those positions back, masked when the stage idles
            start = (0, b0, 0, offset, 0)
            k_old = jax.lax.dynamic_slice(k_all, start, k_app.shape)
            v_old = jax.lax.dynamic_slice(v_all, start, v_app.shape)
            k_all = jax.lax.dynamic_update_slice(
                k_all, jnp.where(active, k_app, k_old), start)
            v_all = jax.lax.dynamic_update_slice(
                v_all, jnp.where(active, v_app, v_old), start)

            # last stage: head on the final position, record microbatch mb
            h = llama.rms_norm(x_out[:, -1], m.final_norm, cfg.rms_norm_eps)
            head_w = m.lm_head if m.lm_head is not None else m.embed
            logits = jnp.dot(h, head_w.T.astype(compute_dtype),
                             preferred_element_type=jnp.float32)
            write = jnp.logical_and(stage == S - 1, active)
            prev = jax.lax.dynamic_index_in_dim(out, idx, 0, False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(write, logits, prev), idx, 0)

            # rotate activations one stage forward
            x_next = jax.lax.ppermute(x_out, "stage", fwd_perm)
            return (x_next, out, k_all, v_all), None

        init = (jnp.zeros((Bm, seq_len, H), compute_dtype), out0, k0, v0)
        (_, out, k_all, v_all), _ = jax.lax.scan(
            tick, init, jnp.arange(n_ticks, dtype=jnp.int32))

        # logits live on the last stage only; broadcast
        out = jax.lax.psum(
            jnp.where(stage == S - 1, out, jnp.zeros_like(out)), "stage")
        logits = out.reshape(batch, V)
        if tp > 1:
            # out_specs carry the leading TP shard axis; head compute was
            # replicated over 'tensor' so the psum above already agrees
            k_all, v_all = k_all[None], v_all[None]
        new_cache = llama.KVCache(k=k_all, v=v_all,
                                  length=cache.length + seq_len)
        return logits, new_cache

    return jax.jit(step)
