"""Single-chip shard_map x Pallas validation (VERDICT r2 weakness 4).

The CPU-mesh TP tests route linears to the XLA reference path; this runs
the SAME shard_map-ped TP stacked forward on the real TPU with tensor=1,
so the composition (shard_map -> lax.scan -> lax.switch ->
quant_matmul_indexed scalar-prefetch Pallas kernels + flash-decode
attention) actually compiles and executes on hardware.  Parity target:
the non-shard_map Pallas engine on the same model.

Run: python scripts/tp_stacked_chip.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np
import jax
import jax.numpy as jnp

from amq_tpu.models import get_config, init_params, quantize_model
from amq_tpu.models.config import LINEAR_NAMES
from amq_tpu.models.stacked import SERVE_CONTAINERS, stack_proxies
from amq_tpu.parallel import tp_stacked as tps
from amq_tpu.serving.engine import Engine


def main():
    print("devices:", jax.devices())
    cfg = get_config("graft-tp")
    params = init_params(cfg, jax.random.PRNGKey(0))
    bits = (2, 3, 4)
    proxies = [quantize_model(params, cfg, b, optimize=False,
                              meta_dtype=jnp.bfloat16) for b in bits]
    arch = {"linear": {n: [bits[i % 3] for i in range(cfg.num_layers)]
                       for n in LINEAR_NAMES}}
    toks = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, 8)).astype(np.int32)

    local = stack_proxies(proxies, bits, arch=arch,
                          container_bits=SERVE_CONTAINERS, head_bits=8)
    eng_ref = Engine(local, cfg, batch_size=1, max_len=64)
    ref = eng_ref.generate(toks, max_new_tokens=16)
    print("local pallas tokens:", ref[0].tolist())

    mesh = tps.make_tp_mesh(1)   # tensor=1 on the one real chip
    model = tps.stack_proxies_tp(proxies, bits, cfg, 1, arch=arch,
                                 container_bits=SERVE_CONTAINERS,
                                 head_bits=8, mesh=mesh)
    eng = tps.make_tp_engine(cfg, mesh, model, batch_size=1, max_len=64)
    got = eng.generate(toks, max_new_tokens=16)
    print("shard_map pallas tokens:", got[0].tolist())
    assert (got == ref).all(), (got, ref)
    print("tp_stacked_chip OK: shard_map x Pallas decode parity on TPU")


if __name__ == "__main__":
    main()
