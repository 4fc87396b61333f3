#!/usr/bin/env bash
# Subtyping fine-tune/linear-probe launcher (TPU).
# Usage: run_train_subtyping.sh <config> <fold_nb> [initial_checkpoint] [extra args...]
set -euo pipefail
if [ $# -lt 2 ]; then
    echo "Usage: $0 <config> <fold_nb> [initial_checkpoint] [extra args...]" >&2
    exit 1
fi
CONFIG=$1; FOLD=$2; shift 2
CKPT_ARGS=()
if [ $# -ge 1 ] && [[ "${1:-}" != --* ]]; then
    CKPT_ARGS=(--initial-checkpoint "$1"); shift
fi
if [ ! -f "$CONFIG" ]; then echo "Config not found: $CONFIG" >&2; exit 1; fi
cd "$(dirname "$0")/.."
exec python train_subtyping.py --config "$CONFIG" --fold-nb "$FOLD" "${CKPT_ARGS[@]}" "$@"
