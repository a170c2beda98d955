#!/bin/bash
# Reproduce the simulation quality study (docs/QUALITY.md): train apollo at
# the reference's 148^3 quality operating point on a 700^3 synthetic bead
# volume to 11k iterations, evaluating under the reference's protocol
# (/root/reference/test_dice.py:229-263 semantics) at 3k/6k/9k/11k.
#
# Runs in 500-iteration segments with frequent checkpoint banking because
# long-lived axon-tunnel clients wedge nondeterministically (see
# .claude/skills/verify/SKILL.md); on real locally-attached TPU hosts a
# single `--max_iters 11000` run works and the segmenting is harmless.
#
# Usage: scripts/run_quality_study.sh [DATA_DIR] [CKPT_DIR] [LOG_DIR]
# Env knobs: MAX_ITERS (default 11000), EVALS (default "3000 6000 9000"),
# NAME (default apollo148), RESULTS (default /tmp/results_sim700),
# MODEL_FLAGS (default: the apollo production recipe's model flags —
# override for athena/dryops variants, e.g.
#   MODEL_FLAGS="--model axial_to_lateral_gan_athena --conversion_plane yz xy").
# Pacing knobs (defaults = the batch-1 recipe; the --grad_accum N recipe
# needs ~Nx smaller values since each "iter" is N crops):
#   SEG_ITERS (500) iters per segment, SAVE_FREQ (50), PRINT_FREQ (25),
#   WATCHDOG (300), SEG_TIMEOUT (1500 s), EXTRA_TRAIN_FLAGS ("" — e.g.
#   "--grad_accum 8").
set -u
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/sim700}
CKPT=${2:-/tmp/ckpt_sim700}
LOG=${3:-/tmp/quality}
NAME=${NAME:-apollo148}
MAX_ITERS=${MAX_ITERS:-11000}
EVALS=${EVALS:-"3000 6000 9000"}
RESULTS=${RESULTS:-/tmp/results_sim700}
SEG_ITERS=${SEG_ITERS:-500}
SAVE_FREQ=${SAVE_FREQ:-50}
PRINT_FREQ=${PRINT_FREQ:-25}
WATCHDOG=${WATCHDOG:-300}
SEG_TIMEOUT=${SEG_TIMEOUT:-1500}
EXTRA_TRAIN_FLAGS=${EXTRA_TRAIN_FLAGS:-}
# training crop edge (CROP=144 for athena: its 6-D all-slices step at 148^3
# exceeds the v5e compile-time HBM budget by 341 KB — docs/QUALITY.md r5)
CROP=${CROP:-148}
mkdir -p "$LOG"

# GEN_FLAGS must match the study's intended volume (e.g. "--preset s4",
# "--mode artifact") — the queue passes them down so this fallback cannot
# silently regenerate a default (sigma_z=6) volume for a preset study.
GEN_FLAGS=${GEN_FLAGS:-}
if [ ! -d "$DATA/input" ]; then
  python scripts/generate_synthetic.py --out "$DATA" --size 700 --seed 0 \
    $GEN_FLAGS || { echo "data generation FAILED" >> "$LOG/driver.log"; exit 1; }
fi

# Durable resume: in environments where untracked files do not survive
# restarts (this dev harness wipes everything but git-tracked content
# between driver sessions), the latest checkpoint set can be banked into
# the git-TRACKED study_state/ dir (scripts/bank_study_state.sh).  Seed
# the working checkpoint dir from the bank when starting cold.
# The "working dir is empty" probe keys on the SAME _optim.npz marker as
# last_ckpt: a partial save (net files present, optim missing — segment
# killed mid-save) must not suppress seeding and restart from iteration 0.
BANK=${BANK:-study_state/$NAME}
if [ -d "$BANK" ] && [ -z "$(ls "$CKPT/$NAME"/iter_*_optim.npz 2>/dev/null)" ]; then
  mkdir -p "$CKPT/$NAME"
  cp "$BANK"/iter_* "$CKPT/$NAME/" 2>/dev/null && \
    echo "seeded $CKPT/$NAME from bank $BANK" >> "$LOG/driver.log" || true
fi

MODEL_FLAGS=${MODEL_FLAGS:-"--model axial_to_lateral_gan_apollo \
 --lambda_plane 1 1 1 --randomize_projection_depth --projection_depth 10"}

# GNU timeout setpgid()s its child into a fresh process group, so killing
# the driver's group does NOT stop a running segment.  Record the child
# group (pgid == timeout's pid) in $LOG/child.pgid while it runs; the
# round-end reaper (bench.py _stop_running_study) kills those groups too.
run_child() {
  "$@" &
  local CPID=$!
  echo "$CPID" > "$LOG/child.pgid"
  wait "$CPID"
  local RC=$?
  rm -f "$LOG/child.pgid"
  return $RC
}

TRAIN_FLAGS="--dataroot $DATA/input --checkpoints_dir $CKPT --name $NAME \
 --dataset_mode singlevolume \
 --preprocess random3Drotate_randomcrop_randomflip_addColorChannel_addBatchChannel \
 $MODEL_FLAGS --netG unet_deconv --netG_B deep_linear_gen \
 --netD basic --gan_mode lsgan --init_type kaiming --norm instance \
 --batch_size 1 --lambda_A 5 --crop_size $CROP $CROP $CROP \
 --lr_policy constant \
 --precision bfloat16 --remat --save_by_iter --save_latest_freq $SAVE_FREQ \
 --print_freq $PRINT_FREQ --display_freq 1000000 --seed 0 \
 --watchdog_secs $WATCHDOG $EXTRA_TRAIN_FLAGS"

# A checkpoint set is complete iff its _optim.npz exists: saves are atomic
# (tmp+rename) and the optimizer file is written LAST (base_model.py
# save_networks).  Keying on it accepts end-of-segment saves at arbitrary
# iteration numbers (e.g. iter_651) that the old "% SAVE_FREQ == 0" filter
# silently discarded — which made banked non-round checkpoints unresumable.
last_ckpt() {
  ls "$CKPT/$NAME"/iter_*_optim.npz 2>/dev/null \
   | sed 's/.*iter_\([0-9]*\)_optim.*/\1/' | sort -n | tail -1
}

eval_at() {
  # returns 1 when the eval produced no psnr line (caller keeps the retry
  # slot open) and 2 when a bench STOP interrupted it (caller must NOT
  # count that as a failure — two round-end interruptions would otherwise
  # permanently burn the eval point); first real failure retries with the
  # Pallas W-pair conv forced off, so a kernel-compile regression cannot
  # eat an eval point.
  local it=$1
  shift
  # wconv=0 first: evals ride the known-good XLA packed conv (bench.py
  # measures the Pallas kernel separately per leg); the unset-env attempt
  # is the fallback and also the only one where test_dice's
  # set_enabled(True) default actually engages — NEUROCLEAR_PALLAS_WCONV=""
  # (set-but-empty) pins ENABLED off, it does NOT mean "default".
  for wc in 0 unset; do
    if [ -f .study/STOP ]; then return 2; fi
    if [ "$wc" = unset ]; then WENV=(env -u NEUROCLEAR_PALLAS_WCONV);
    else WENV=(env NEUROCLEAR_PALLAS_WCONV=$wc); fi
    run_child "${WENV[@]}" timeout 3000 python test_dice.py \
      --dataroot "$DATA/input" --dataroot_gt "$DATA/gt" \
      --checkpoints_dir "$CKPT" --results_dir "$RESULTS" --name $NAME \
      --serial_batches --preprocess addColorChannel --dataset_mode diceImage \
      --netG unet_deconv --overlap 15 --dice_size 120 120 120 --normalize_intensity \
      --sat_level 0.25 99.75 --image_dimension 3 --model_suffix _A \
      --border_cut 10 --skip_real --load_iter "$it" "$@" \
      > "$LOG/eval_$it.log" 2>&1
    if grep -q "psnr" "$LOG/eval_$it.log"; then break; fi
    echo "eval_$it produced no psnr (wconv='$wc'); see eval_$it.log" >> "$LOG/driver.log"
  done
  # isotropization decomposition (axial/lateral gradient ratio, affine-
  # optimal PSNR, fg/bg RMS) on the saved volume — the study's primary
  # quality evidence beyond the protocol PSNR line (docs/QUALITY.md);
  # pure-numpy, runs while the chip is idle between segments
  local VOL
  VOL=$(find "$RESULTS" -name "output_volume_xy-view_iter-${it}.tif" \
        2>/dev/null | head -1)
  if [ -n "$VOL" ] && [ ! -f "$LOG/diag_$it.log" ]; then
    timeout 900 python scripts/diagnose_quality.py \
      --input "$DATA"/input/*.tif --output "$VOL" --gt "$DATA"/gt/*.tif \
      > "$LOG/diag_$it.log" 2>&1 || true
  fi
  grep "psnr" "$LOG/eval_$it.log"
}

# Cooperative stop: the round-end bench (bench.py _stop_running_study)
# touches .study/STOP and kills the current segment's child pgid; this
# loop must then NOT start another segment.  A stale STOP from a previous
# round is cleared here at launch — but ONLY for direct invocations:
# run_study_queue.sh clears once at queue launch and passes CLEAR_STOP=0,
# so a FRESH bench STOP landing during the queue's data-generation window
# is honoured instead of deleted.
if [ "${CLEAR_STOP:-1}" = "1" ]; then rm -f .study/STOP; fi
SEG=0
while true; do
  if [ -f .study/STOP ]; then
    echo "STOP file present; exiting cleanly $(date +%H:%M:%S)" >> "$LOG/driver.log"
    exit 0
  fi
  P=$(last_ckpt); P=${P:-0}
  if [ "$P" -ge "$MAX_ITERS" ]; then break; fi
  SEG=$((SEG+1))
  if [ "$SEG" -gt 200 ]; then echo "too many segments, aborting" >> "$LOG/driver.log"; break; fi
  RESUME=""
  if [ "$P" -gt 0 ]; then RESUME="--continue_train --load_iter $P"; fi
  echo "=== segment $SEG from iter $P $(date +%H:%M:%S)" >> "$LOG/driver.log"
  run_child timeout $SEG_TIMEOUT python train_onecube.py $TRAIN_FLAGS $RESUME \
    --max_iters $SEG_ITERS >> "$LOG/train.log" 2>&1
  RC=$?
  echo "segment rc=$RC last=$(last_ckpt) $(date +%H:%M:%S)" >> "$LOG/driver.log"
  # failed segments leave the tunnel client's HBM draining asynchronously;
  # an immediate relaunch collides with it and fails spuriously (observed
  # as RESOURCE_EXHAUSTED on the first tiny transfer) — settle first
  if [ "$RC" != 0 ]; then sleep 75; fi
  # AUTOBANK=1: bank every segment's latest checkpoints into the
  # git-tracked study_state/ dir (the builder session commits the bank).
  if [ "${AUTOBANK:-0}" = "1" ]; then
    scripts/bank_study_state.sh "$CKPT" "$NAME" >> "$LOG/driver.log" 2>&1 || true
  fi
  P2=$(last_ckpt); P2=${P2:-0}
  for M in $EVALS; do
    if [ "$P2" -ge "$M" ] && [ ! -f "$LOG/eval_$M.done" ]; then
      echo "--- eval at $M" >> "$LOG/driver.log"
      eval_at $M --save_volume >> "$LOG/driver.log" 2>&1
      RC=$?
      if [ "$RC" = 0 ]; then
        touch "$LOG/eval_$M.done"
      elif [ "$RC" = 2 ]; then
        # bench STOP interrupted the eval: keep the eval point open (the
        # next launch re-runs it) and stop starting new evals now
        echo "eval_$M interrupted by STOP; will retry next launch" >> "$LOG/driver.log"
        break
      else
        # at most 2 driver-loop retries, then give up loudly — a broken
        # eval must not starve the remaining training segments
        N_FAIL=$(( $(cat "$LOG/eval_$M.fails" 2>/dev/null || echo 0) + 1 ))
        echo "$N_FAIL" > "$LOG/eval_$M.fails"
        if [ "$N_FAIL" -ge 2 ]; then
          echo "eval_$M FAILED $N_FAIL times; giving up" >> "$LOG/driver.log"
          touch "$LOG/eval_$M.done"
        fi
      fi
    fi
  done
  # keep the live best-checkpoint line current as evals land mid-study
  if ls "$LOG"/eval_*.log >/dev/null 2>&1; then
    python scripts/select_checkpoint.py "$LOG" --write >/dev/null 2>&1 || true
  fi
done
F=$(last_ckpt)
if [ -f .study/STOP ]; then exit 0; fi
if [ ! -f "$LOG/eval_final.done" ]; then
  echo "--- final eval at $F" >> "$LOG/driver.log"
  if eval_at "$F" --save_volume >> "$LOG/driver.log" 2>&1; then
    touch "$LOG/eval_final.done"
  fi
fi
# operational checkpoint selection: rank every eval by protocol output-PSNR
# and record the argmax (-> $LOG/selected.txt, consumed via
# `test_dice.py --load_iter N`); the reference leaves this to manual
# TensorBoard inspection (README.md:135-137)
python scripts/select_checkpoint.py "$LOG" --write >> "$LOG/driver.log" 2>&1 || true
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG/driver.log"
