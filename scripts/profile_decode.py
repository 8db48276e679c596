"""Capture a device trace of the decode scan and print a per-op cost
breakdown (attributes the ~450 us/layer of non-kernel in-model cost)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L_OVERRIDE = int(os.environ.get("PROF_LAYERS", "4"))

import bench  # noqa: E402  (reuse the bench model builder)


SINGLE_BIT = int(os.environ.get("PROF_SINGLE_BIT", "0"))


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    cfg = bench.get_config(bench.MODEL)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, num_layers=L_OVERRIDE,
        name=f"prof-{L_OVERRIDE}" + (f"-b{SINGLE_BIT}" if SINGLE_BIT else ""))
    rng = np.random.default_rng(0)
    if SINGLE_BIT:
        bench.BITS_RANGE = (SINGLE_BIT,)
    model = bench.random_stacked_model(cfg, rng)
    jax.block_until_ready(model.embed)

    from amq_tpu.serving import Engine
    eng = Engine(model, cfg, batch_size=1, max_len=200,
                 compute_dtype=jnp.bfloat16, use_pallas=True)
    prompt = rng.integers(0, cfg.vocab_size, (1, 64)).astype(np.int32)
    cache = eng.new_cache()
    last, cache = eng._prefill(eng.params, jnp.asarray(prompt), cache)
    first = jnp.argmax(last, axis=-1).astype(jnp.int32)
    np.asarray(first)
    # warm decode compile (donates `cache` — rebuild it for the traced run)
    toks, _ = eng._decode_n(eng.params, first, cache, n_steps=16)
    np.asarray(toks)
    cache = eng.new_cache()
    last, cache = eng._prefill(eng.params, jnp.asarray(prompt), cache)
    first = jnp.argmax(last, axis=-1).astype(jnp.int32)
    np.asarray(first)

    logdir = "/tmp/amq_prof"
    os.system(f"rm -rf {logdir}")
    t0 = time.time()
    prefill_mode = os.environ.get("PROF_PREFILL", "0") == "1"
    try:
        jax.profiler.start_trace(logdir)
        if prefill_mode:
            last2, _ = eng._prefill(eng.params, jnp.asarray(prompt),
                                    eng.new_cache())
            np.asarray(last2)
        else:
            toks, _ = eng._decode_n(eng.params, first, cache, n_steps=16)
            np.asarray(toks)
    finally:
        jax.profiler.stop_trace()
    wall = time.time() - t0
    what = "prefill" if prefill_mode else "16-step decode"
    print(f"{what} wall: {wall*1e3:.1f} ms "
          f"({wall/16*1e3:.2f} ms/token at {L_OVERRIDE} layers)"
          if not prefill_mode else
          f"{what} wall: {wall*1e3:.1f} ms at {L_OVERRIDE} layers",
          file=sys.stderr, flush=True)

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("NO TRACE FILES (profiler unsupported on this backend?)",
              file=sys.stderr)
        return
    with gzip.open(files[0]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    by_name = defaultdict(float)
    count = defaultdict(int)
    pid_names = {e.get("pid"): e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        pname = pid_names.get(pid, "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        by_name[name] += e.get("dur", 0.0)
        count[name] += 1
    total = sum(by_name.values())
    print(f"device total: {total/1e3:.2f} ms over {len(by_name)} op names",
          file=sys.stderr)
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3:9.2f} ms  x{count[name]:<5d} {name[:110]}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
