#!/bin/bash
# 24B generation on a multi-chip TPU slice (ref: example/24B/run.sh).
# No torchrun: one process drives the whole mesh; cp/tp sizes come from
# engine_config in the JSON (cp4 Ulysses by default).
set -e
cd "$(dirname "$0")/../.."

export PAD_HQ=true
export PAD_DURATION=true
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/magi_tpu_jit_cache}

MODE=${1:-t2v}
PROMPT=${2:-"Good Boy"}
OUTPUT=${3:-output_24B.mp4}

python -m magi_tpu.pipeline.entry \
    --config_file example/24B/24B_base_config.json \
    --mode "$MODE" \
    --prompt "$PROMPT" \
    --output_path "$OUTPUT"
