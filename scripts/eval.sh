#!/bin/bash
# Generation + metric eval (reference: script/eval.sh).
# Usage: bash scripts/eval.sh CKPT [CFG_YML]
CKPT=${1:?usage: eval.sh CKPT [CFG_YML]}
CFG=${2:-$(dirname "$CKPT")/../cfg.yml}
python train_dist.py --config "$CFG" --pretrained "$CKPT" --eval_generation
