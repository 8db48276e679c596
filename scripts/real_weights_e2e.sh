#!/usr/bin/env bash
# Real-weights pipeline end-to-end (no hub): write an HF-format
# checkpoint + fast tokenizer, build a text corpus, then run
# proxy -> sensitivity -> quantize(GPTQ) through the non-synthetic code
# paths (safetensors load, AutoTokenizer, local-text dataset chunking).
# Results land in benchmarks/real_weights_tiny.json.
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/amq_tpu_real}
rm -rf "$WORK" && mkdir -p "$WORK"

python - "$WORK" << 'EOF'
import sys, os
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.getcwd())
from amq_tpu.models import get_config, init_params
from amq_tpu.models.hf import save_hf_checkpoint, save_dummy_tokenizer

work = sys.argv[1]
cfg = get_config("tiny-llama")
params = init_params(cfg, jax.random.PRNGKey(0))
ckpt = os.path.join(work, "tiny-llama-hf")
save_hf_checkpoint(params, cfg, ckpt)
save_dummy_tokenizer(ckpt, cfg.vocab_size)
print("checkpoint:", ckpt)
EOF

CKPT="$WORK/tiny-llama-hf"
# the corpus is CHECKED IN (tests/data/mini_corpus.txt — also the
# data-loader golden fixture), so this recipe is reproducible as-is
DS="local:tests/data/mini_corpus.txt"
COMMON=(--model_path "$CKPT" --dataset "$DS" --platform cpu
        --n_sample 8 --seqlen 128)

python -m amq_tpu.cli.proxy "${COMMON[@]}" --nbits 2 3 4 \
    --save_path "$WORK/proxies"
python -m amq_tpu.cli.sensitivity "${COMMON[@]}" --save_path "$WORK/sens"
python -m amq_tpu.cli.search "${COMMON[@]}" \
    --sensitivity_json "$WORK"/sens/*.json \
    --iterations 3 --n_doe 16 --n_iter 4 --save_path "$WORK/search" \
    --save_iter 1
python -m amq_tpu.cli.quantize "${COMMON[@]}" --eval_dataset "$DS" \
    --load "$WORK"/search/iter_3.stats --method gptq --target_bits 3.25 \
    --save_path "$WORK/quant"

mkdir -p benchmarks
python - "$WORK" << 'EOF'
import json, sys, glob, os
work = sys.argv[1]
src = glob.glob(os.path.join(work, "quant", "*results*.json"))[0]
with open(src) as f:
    res = json.load(f)
out = {
    "what": "real-weights-path e2e (HF safetensors + fast tokenizer + "
            "local-text dataset), GPTQ at target 3.25 avg-bits",
    "model": "tiny-llama (HF-format checkpoint; random init — no hub "
             "access in this environment)",
    "results": res,
}
with open("benchmarks/real_weights_tiny.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote benchmarks/real_weights_tiny.json")
EOF
