"""Shared CLI plumbing (reference utils/args.py:4-160, re-grouped).

Every stage CLI supports ``--synthetic`` (random weights + synthetic
tokens) so the full pipeline runs in hub-less environments; with a local
HF checkpoint directory (``--model_path``) the real model is used.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Tuple

import numpy as np


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--model_name", type=str, default="tiny-llama",
                   help="registry name (e.g. Llama-2-7b-hf, Qwen2-0.5B)")
    p.add_argument("--model_path", type=str, default="",
                   help="local HF checkpoint dir (optional)")
    p.add_argument("--synthetic", action="store_true",
                   help="random weights + synthetic calibration tokens")
    p.add_argument("--dataset", type=str, default="wikitext2",
                   help="wikitext2 | c4 | synthetic | local:<text file>")
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--n_sample", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--group_size", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--platform", type=str, default="",
                   help="force jax platform (cpu/tpu)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard evaluation batches over all local devices "
                        "(mesh 'data' axis; replaces the reference's "
                        "Accelerate process sharding)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="evaluation forward dtype; bfloat16 mirrors the "
                        "reference's fp16 model (utils/func.py "
                        "get_hfmodel) and doubles MXU rate")
    p.add_argument("--dense_cache_gib", type=float, default=None,
                   help="HBM budget for pinning the dense FP16 logit "
                        "cache on device across search evals (default 4; "
                        "host->device streaming per eval is ~50x slower "
                        "on tunneled backends)")
    p.add_argument("--dense_cache_dtype", type=str, default=None,
                   choices=("float16", "float8_e4m3fn"),
                   help="pinned dense-logit dtype; fp8 fits 2x the "
                        "samples at ~2e-4 JSD delta")
    return p


def apply_eval_cache_args(ev, args):
    """Apply --dense_cache_gib / --dense_cache_dtype to an Evaluator."""
    if getattr(args, "dense_cache_gib", None) is not None:
        ev.dense_cache_bytes = int(args.dense_cache_gib * 2**30)
    if getattr(args, "dense_cache_dtype", None):
        import jax.numpy as jnp
        ev.dense_cache_dtype = jnp.dtype(args.dense_cache_dtype)
    return ev


def compute_dtype(args):
    import jax.numpy as jnp
    return getattr(jnp, args.compute_dtype)


def data_mesh(args):
    """Mesh over all local devices for data-parallel evaluation, or None."""
    if not getattr(args, "data_parallel", False):
        return None
    import jax
    import numpy as np
    from jax.sharding import Mesh
    devs = jax.devices()
    return Mesh(np.array(devs), ("data",))


def setup_jax(args):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_comp"))
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    return jax


def load_model(args) -> Tuple[Any, Dict[str, Any]]:
    """(cfg, dense params) from HF dir or random init.

    Dense params are HOST-resident bf16 (the reference loads the model
    fp16 on CPU, utils/func.py get_hfmodel): at 7B the dense pytree
    (13.5 GB) and the three quantization proxies (~7.3 GB) cannot
    coexist in one chip's HBM — the Evaluator stages dense onto the
    device only while caching FP16 logits, then frees it.
    """
    import jax
    import jax.numpy as jnp
    from ..models import get_config, init_params
    from ..models.hf import config_from_hf, load_hf_params

    cpu = jax.devices("cpu")[0]
    if args.model_path and os.path.isdir(args.model_path):
        cfg = config_from_hf(args.model_path)
        with jax.default_device(cpu):
            params = load_hf_params(args.model_path, cfg,
                                    dtype=jnp.bfloat16)
        return cfg, params
    cfg = get_config(args.model_name)
    if not args.synthetic:
        raise SystemExit(
            f"no checkpoint at {args.model_path!r}; pass --synthetic to run "
            "with random weights")
    with jax.default_device(cpu):
        params = init_params(cfg, jax.random.PRNGKey(args.seed),
                             dtype=jnp.bfloat16)
    return cfg, params


def load_tokens(args, cfg, train: bool = True) -> np.ndarray:
    from ..evaluation import data as data_mod
    if args.dataset == "synthetic" or (
            args.synthetic and not args.dataset.startswith("local:")):
        return data_mod.synthetic_tokens(cfg.vocab_size,
                                         n_sample=args.n_sample,
                                         seqlen=args.seqlen, seed=args.seed)
    tok = None
    try:
        from ..models.hf import load_tokenizer
        tok = load_tokenizer(args.model_path or args.model_name)
    except Exception as e:  # pragma: no cover
        raise SystemExit(f"tokenizer unavailable ({e}); use --synthetic")
    return data_mod.get_loader(args.dataset, tokenizer=tok,
                               n_sample=args.n_sample, train=train,
                               seed=args.seed, seqlen=args.seqlen)


def dump_json(obj, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)
    print(f"wrote {path}")
