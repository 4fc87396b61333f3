#!/usr/bin/env bash
# MIRROR pretraining launcher (TPU).
# Rebuild of /root/reference/scripts/run_train_mirror.sh: the torchrun
# rendezvous args disappear — one process drives all local chips via SPMD.
# Usage: run_train_mirror.sh <config> <fold_nb> [extra args...]
set -euo pipefail
if [ $# -lt 2 ]; then
    echo "Usage: $0 <config> <fold_nb> [extra args...]" >&2
    exit 1
fi
CONFIG=$1; FOLD=$2; shift 2
if [ ! -f "$CONFIG" ]; then echo "Config not found: $CONFIG" >&2; exit 1; fi
cd "$(dirname "$0")/.."
exec python train_mirror.py --config "$CONFIG" --fold-nb "$FOLD" "$@"
