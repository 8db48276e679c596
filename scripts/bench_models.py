"""Multi-model decode benchmark sweep -> benchmarks/BENCH_models.json.

Runs bench.py (fresh process per model: proxy buffers are ~model-sized
and the chip has 16 GB) for each serveable config and collects the JSON
lines.  The reference's speed benchmark covers Llama-2 7B/13B, Llama-3,
Mistral, Qwen2.5 (README.md:88-92); this is the TPU table.

Run: python scripts/bench_models.py [model ...]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = ["Llama-2-7b-hf", "Llama-2-13b-hf", "Meta-Llama-3-8B",
           "Mistral-7B-v0.1", "Qwen2.5-7B"]


def main():
    models = sys.argv[1:] or DEFAULT
    results = []
    for m in models:
        env = dict(os.environ, BENCH_MODEL=m)
        print(f"=== {m}", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=1800)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")]
        if p.returncode != 0 or not line:
            print(p.stderr[-2000:])
            results.append({"model": m, "error": p.returncode})
            continue
        rec = json.loads(line[-1])
        rec["model"] = m
        print(json.dumps(rec), flush=True)
        results.append(rec)
    out = os.path.join(REPO, "benchmarks", "BENCH_models.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
