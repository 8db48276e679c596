"""PTQ method registry (reference quantization/model.py:7-19).

``get_quantized_params(params, cfg, method, arch, ...)`` dispatches to
AWQ / GPTQ / OWQ / HQQ and returns a new param pytree:

* 'awq' / 'gptq' / 'owq' produce *fake-quantized* dense weights (what the
  reference evaluates perplexity on),
* 'hqq' produces really-packed :class:`QuantLinear` leaves (the proxy
  builder, amq_quantization_proxy.py:26-42).

Calibration sets follow the reference (quantization/base.py:7-97): AWQ
uses pileval, GPTQ uses C4, OWQ uses wikitext2 — all falling back to a
synthetic stream in hub-less environments.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..evaluation import data as data_mod
from ..models import transform
from ..models.config import ModelConfig
from .awq import awq_quantize_model
from .gptq import gptq_quantize_model
from .owq import owq_quantize_model

METHODS = ("awq", "gptq", "owq", "hqq")

# reference calibration datasets per method (base.py:7-97)
CALIB_DATASET = {"awq": "pileval", "gptq": "c4", "owq": "wikitext2"}
CALIB_SEQLEN = {"awq": 512, "gptq": 2048, "owq": 2048}


def get_calib_tokens(method: str, tokenizer=None, n_samples: int = 128,
                     seed: int = 0, synthetic_vocab: Optional[int] = None,
                     cache_dir: Optional[str] = None) -> np.ndarray:
    seqlen = CALIB_SEQLEN[method]
    if synthetic_vocab is not None:
        return data_mod.synthetic_tokens(synthetic_vocab, n_sample=n_samples,
                                         seqlen=seqlen, seed=seed)
    name = CALIB_DATASET[method]
    if name == "pileval":
        # the reference default (mit-han-lab/pile-val-backup, base.py:7-34);
        # c4 substitutes only when the pile cache/hub is unreachable
        try:
            return data_mod.get_loader("pileval", tokenizer=tokenizer,
                                       n_sample=n_samples, seqlen=seqlen,
                                       cache_dir=cache_dir)
        except Exception:
            name = "c4"
    return data_mod.get_loader(name, tokenizer=tokenizer, n_sample=n_samples,
                               train=True, seed=seed, seqlen=seqlen,
                               cache_dir=cache_dir)


def get_quantized_params(
    params: Dict[str, Any],
    cfg: ModelConfig,
    method: str,
    arch: transform.Arch,
    avg_bits: Optional[float] = None,
    group_size: int = 128,
    calib_tokens: Optional[np.ndarray] = None,
    tokenizer=None,
    synthetic_calib: bool = False,
    n_samples: int = 128,
    **kwargs,
) -> Dict[str, Any]:
    assert method in METHODS, f"invalid method {method!r}"
    if method == "hqq":
        return transform.quantize_model(params, cfg, arch, group_size)
    if calib_tokens is None:
        calib_tokens = get_calib_tokens(
            method, tokenizer=tokenizer, n_samples=n_samples,
            synthetic_vocab=cfg.vocab_size if synthetic_calib else None)
    if method == "awq":
        return awq_quantize_model(params, cfg, arch, calib_tokens,
                                  group_size=group_size, **kwargs)
    if method == "gptq":
        return gptq_quantize_model(params, cfg, arch, calib_tokens,
                                   group_size=group_size, **kwargs)
    if method == "owq":
        assert avg_bits is not None, "owq needs the target avg_bits"
        return owq_quantize_model(params, cfg, arch, avg_bits, calib_tokens,
                                  group_size=group_size, **kwargs)
    raise NotImplementedError(method)
