#!/bin/bash
# Turnkey driver for the round-3 chip-bound study queue (docs/QUALITY.md):
#   1. s4      — apollo 148^3 on the sigma_z=4 isotropization volume, 11k iters
#   2. ga8     — apollo --grad_accum 8 batch-recipe certification, 1375 steps
#   3. athena  — OT-LSM artifact-correction variant, 3k iters
# Runs each study to completion (resuming from its git-tracked bank) before
# starting the next; skips studies whose final eval marker exists.  Safe to
# relaunch at any time — this is the ONE command a fresh session runs.
#
# Usage: scripts/run_study_queue.sh [skip-names...]   e.g. "s4" to jump ahead.
set -u
cd "$(dirname "$0")/.."
SKIP=" $* "

# A study is complete when its git-tracked bank holds a checkpoint at
# >= MAX_ITERS (survives VM wipes; the gitignored eval markers do not).
# Evals for a freshly-completed bank are re-run by run_quality_study.sh's
# final-eval block on the next invocation if their logs were wiped.
bank_iter() {
  ls "study_state/$1"/iter_*_optim.npz 2>/dev/null \
    | sed 's/.*iter_\([0-9]*\)_optim.*/\1/' | sort -n | tail -1
}
study_done() {  # $1=bank name  $2=max iters  $3=log dir
  local B; B=$(bank_iter "$1"); B=${B:-0}
  [ "$B" -ge "$2" ] && [ -f "$3/eval_final.done" ]
}

# Clear any stale bench STOP at queue launch; honour a fresh one between
# studies (bench.py touches .study/STOP to claim the chip at round end).
mkdir -p .study
rm -f .study/STOP
bench_stop() { [ -f .study/STOP ] && { echo "STOP: yielding chip to bench"; exit 0; }; }

bench_stop
if [[ "$SKIP" != *" s4 "* ]] && ! study_done apollo148s4 11000 .study/log_s4; then
  if [ ! -d .study/sim700_s4/input ]; then
    python scripts/generate_synthetic.py --out .study/sim700_s4 --size 700 \
      --seed 0 --preset s4 || exit 1
  fi
  # Pacing (measured 2026-08-19): steady 1.48 s/it but ~9 min of first-sync
  # overhead per segment -> 2000-iter segments; the first post-resume loss
  # fetch blocks 5-9 min, so the in-process watchdog must sit above it
  # (WATCHDOG=900; the 300 default killed five segments in a row at 1152).
  NAME=apollo148s4 RESULTS=.study/results_s4 AUTOBANK=1 CLEAR_STOP=0 \
    GEN_FLAGS="--preset s4" \
    SEG_ITERS=2000 SEG_TIMEOUT=4500 WATCHDOG=900 \
    scripts/run_quality_study.sh .study/sim700_s4 .study/ckpt_s4 .study/log_s4
fi

bench_stop
if [[ "$SKIP" != *" ga8 "* ]] && ! study_done apollo148ga8 1375 .study/log_ga8; then
  # sim700 is the sigma_z=6 round-2 volume (generator defaults, seed 0) —
  # the gate baseline 20.34 dB in docs/QUALITY.md was measured on it.
  if [ ! -d .study/sim700/input ]; then
    python scripts/generate_synthetic.py --out .study/sim700 --size 700 \
      --seed 0 || exit 1
  fi
  NAME=apollo148ga8 RESULTS=.study/results_ga8 AUTOBANK=1 CLEAR_STOP=0 \
    EXTRA_TRAIN_FLAGS="--grad_accum 8" SEG_ITERS=250 SAVE_FREQ=25 \
    PRINT_FREQ=7 EVALS="375 750 1125" MAX_ITERS=1375 \
    SEG_TIMEOUT=4500 WATCHDOG=900 \
    scripts/run_quality_study.sh .study/sim700 .study/ckpt_ga8 .study/log_ga8
fi

bench_stop
if [[ "$SKIP" != *" athena "* ]] && ! study_done athena148 3000 .study/log_art; then
  if [ ! -d .study/sim700_art/input ]; then
    python scripts/generate_synthetic.py --out .study/sim700_art --size 700 \
      --seed 0 --mode artifact || exit 1
  fi
  # CROP=128: AOT peak 8.64 GiB (scripts/mem_study.py --model ..athena --crop 128);
  # at 144^3 the step alone peaks at 15.08 GiB with 15.88 GiB temps — over the
  # chip even with nothing else resident.  NEUROCLEAR_HOST_WINDOW=1 keeps the
  # 686 MB volume out of HBM as well — without both, every segment dies
  # RESOURCE_EXHAUSTED on the first device sync (observed 2026-08-21 19:40).
  NAME=athena148 RESULTS=.study/results_art AUTOBANK=1 CLEAR_STOP=0 \
    GEN_FLAGS="--mode artifact" CROP=128 NEUROCLEAR_HOST_WINDOW=1 \
    MODEL_FLAGS="--model axial_to_lateral_gan_athena --conversion_plane yz xy" \
    EVALS="1500 3000" MAX_ITERS=3000 \
    SEG_ITERS=1000 SEG_TIMEOUT=4500 WATCHDOG=900 \
    scripts/run_quality_study.sh .study/sim700_art .study/ckpt_art .study/log_art
fi

echo "study queue complete"
