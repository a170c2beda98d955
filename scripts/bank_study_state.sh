#!/bin/bash
# Bank the latest checkpoint set of a quality-study run into the
# git-tracked study_state/ dir so it survives dev-harness restarts that
# wipe untracked files (the round-3 s4 study lost 3300 banked iterations
# to exactly such a wipe; see docs/QUALITY.md "Round 3").
#
# Usage: scripts/bank_study_state.sh CKPT_DIR NAME
# Copies CKPT_DIR/NAME/iter_<latest>_* -> study_state/NAME/ (replacing any
# older bank) and prints what it banked.  Commit the result to make it
# durable.  The synthetic training data does NOT need banking: it is
# regenerated bit-identically by scripts/generate_synthetic.py --seed.
set -eu
cd "$(dirname "$0")/.."
CKPT=$1
NAME=$2
# key on _optim.npz: it is written last in an atomic save sequence, so its
# presence marks a COMPLETE checkpoint set (matches last_ckpt in
# run_quality_study.sh)
LATEST=$(ls "$CKPT/$NAME"/iter_*_optim.npz 2>/dev/null \
  | sed 's/.*iter_\([0-9]*\)_optim.*/\1/' | sort -n | tail -1)
if [ -z "${LATEST:-}" ]; then
  echo "no checkpoints under $CKPT/$NAME" >&2
  exit 1
fi
mkdir -p "study_state/$NAME"
rm -f "study_state/$NAME"/iter_*
cp "$CKPT/$NAME/iter_${LATEST}_"* "study_state/$NAME/"
du -sh "study_state/$NAME"
echo "banked iter $LATEST of $NAME"
