#!/bin/bash
# Download released MAGI-1 checkpoints into the layout the example configs
# expect (ref: download_models.sh).  Requires `huggingface-cli` and network
# access.
set -e

MODEL=${1:-4.5B}
TARGET_DIR=${2:-./downloads}

mkdir -p "$TARGET_DIR"

echo "Downloading T5 (t5-v1_1-xxl) ..."
huggingface-cli download google/t5-v1_1-xxl --local-dir "$TARGET_DIR/t5_pretrained"

echo "Downloading ViT-VAE ..."
huggingface-cli download sand-ai/MAGI-1 --include "ckpt/vae/*" --local-dir "$TARGET_DIR/_magi"
ln -sfn "$(realpath "$TARGET_DIR/_magi/ckpt/vae")" "$TARGET_DIR/vae"

case "$MODEL" in
  4.5B)
    INC="ckpt/magi/4.5B_base/*" ; DEST="4.5B_base" ;;
  4.5B-distill)
    INC="ckpt/magi/4.5B_distill/*" ; DEST="4.5B_distill" ;;
  24B)
    INC="ckpt/magi/24B_base/*" ; DEST="24B_base" ;;
  24B-distill)
    INC="ckpt/magi/24B_distill/*" ; DEST="24B_distill" ;;
  *)
    echo "unknown model $MODEL"; exit 1 ;;
esac

echo "Downloading DiT $MODEL ..."
huggingface-cli download sand-ai/MAGI-1 --include "$INC" --local-dir "$TARGET_DIR/_magi"
ln -sfn "$(realpath "$TARGET_DIR/_magi/ckpt/magi/$DEST")" "$TARGET_DIR/$DEST"

echo "done. configs in example/ point at $TARGET_DIR/"
