#!/bin/bash
# The r5 quality-loop payoff run, crash-resilient: overfit_one_clip.py is
# stage-resumable (Trainer.resume + mid-stage checkpoints) and the trainer
# rides transient axon-tunnel errors in-process; this wrapper restarts the
# whole script on a hard crash so a multi-hour run survives the tunnel.
# Usage: bash examples/run_payoff.sh [workdir]
set -u
WORK="${1:-/tmp/emox_payoff}"
cd "$(dirname "$0")/.."
for attempt in 1 2 3 4 5 6; do
  python examples/overfit_one_clip.py \
    --preset small --size 256 --frames 16 \
    --steps 2000 --lr 3e-4 --vae-steps 2000 --stage4-steps 500 \
    --workdir "$WORK" --out "$WORK/payoff_sample.npz" \
    >> "$WORK/run.log" 2>&1
  rc=$?
  echo "payoff attempt $attempt exit=$rc" >> "$WORK/run.log"
  [ $rc -eq 0 ] && break
  sleep 30
done
exit $rc
