#!/bin/bash
# One-glance status of the chip-bound study queue (docs/QUALITY.md):
# banked progress (durable, git-tracked), live run state, and eval results.
cd "$(dirname "$0")/.."

row() {  # $1=bank name  $2=max iters  $3=log dir  $4=results dir glob
  local B
  B=$(ls "study_state/$1"/iter_*_optim.npz 2>/dev/null \
      | sed 's/.*iter_\([0-9]*\)_optim.*/\1/' | sort -n | tail -1)
  printf "%-14s banked %6s / %-6s" "$1" "${B:-0}" "$2"
  if [ -f "$3/eval_final.done" ]; then printf "  final-eval done"; fi
  local L
  L=$(tail -1 "$3/driver.log" 2>/dev/null)
  printf "  %s\n" "${L:-"(no live log)"}"
  grep -h "psnr" "$3"/eval_*.log 2>/dev/null | tail -3 | sed 's/^/    /'
}

row apollo148s4 11000 .study/log_s4
row apollo148ga8 1375 .study/log_ga8
row athena148 3000 .study/log_art
[ -f .study/STOP ] && echo "NOTE: .study/STOP present (bench claimed the chip)"
ps aux | grep -E "train_onecube|test_dice|run_quality|run_study_queue" \
  | grep -v grep | awk '{print "  live:", $2, substr($0, index($0,$11), 80)}'
