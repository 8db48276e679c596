"""Chip parity check: flash prefill with an UNALIGNED cache length.

llama.attention_append now zero-pads K/V to the flash kernel's 64-tile
when max_len % 64 != 0 (the pads must be causally masked, not attended).
Compares prefill logits at S=512, T=520 against the AMQ_FLASH=0 einsum
path on the real chip.

Run: python scripts/flash_pad_parity.py
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BODY = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import numpy as np
import jax, jax.numpy as jnp
from amq_tpu.models import get_config, init_params, quantize_model
from amq_tpu.models.llama import KVCache
from amq_tpu.models.stacked import stack_proxies, forward_stacked

cfg = get_config("graft-tp")
params = init_params(cfg, jax.random.PRNGKey(0))
model = stack_proxies([quantize_model(params, cfg, 4, optimize=False)], [4])
toks = jnp.asarray(np.random.default_rng(0).integers(
    0, cfg.vocab_size, (1, 512)), jnp.int32)
cache = KVCache.create(cfg, 1, 520, dtype=jnp.bfloat16)   # T % 64 = 8
logits, _ = jax.jit(lambda m, t, c: forward_stacked(
    m, cfg, t, cache=c))(model, toks, cache)
np.save({out!r}, np.asarray(logits[:, -8:], np.float32))
print("saved", {out!r})
"""


def run(flash: str, out: str):
    env = dict(os.environ, AMQ_FLASH=flash)
    body = _BODY.format(repo=REPO, out=out)
    subprocess.run([sys.executable, "-c", body], env=env, check=True,
                   timeout=900)


def main():
    import numpy as np
    run("1", "/tmp/flash_pad_on.npy")
    run("0", "/tmp/flash_pad_off.npy")
    a = np.load("/tmp/flash_pad_on.npy")
    b = np.load("/tmp/flash_pad_off.npy")
    err = np.max(np.abs(a - b))
    scale = np.max(np.abs(b)) + 1e-9
    assert err / scale < 3e-2, (err, scale)   # bf16 reduction-order slack
    print(f"flash_pad_parity OK: max rel err {err/scale:.2e}")


if __name__ == "__main__":
    main()
