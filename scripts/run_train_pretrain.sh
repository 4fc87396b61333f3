#!/usr/bin/env bash
# Vanilla CLIP-style pretraining launcher (TPU).
# Usage: run_train_pretrain.sh <config> <fold_nb> [extra args...]
set -euo pipefail
if [ $# -lt 2 ]; then
    echo "Usage: $0 <config> <fold_nb> [extra args...]" >&2
    exit 1
fi
CONFIG=$1; FOLD=$2; shift 2
if [ ! -f "$CONFIG" ]; then echo "Config not found: $CONFIG" >&2; exit 1; fi
cd "$(dirname "$0")/.."
exec python train_pretrain.py --config "$CONFIG" --fold-nb "$FOLD" "$@"
