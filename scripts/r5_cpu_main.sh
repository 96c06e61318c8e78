#!/bin/bash
# Round-5 CPU queue — the reference-SB3 side of VERDICT items 1 + 5.
# Takes over from the round-4 lanes after the 13:38 relaunch: the PPO 5M
# flagship resume is already running (its PID is $1); the SAC lane died at
# 14:01.  Heavy CPU work is SERIALIZED (4 cores total):
#   1. wait for the in-flight PPO 5M -> commit its artifacts
#   2. SAC 5M flagship resume (solo, full machine — VERDICT item 1)
#   3. sb3-recipe bluerov runs (item 5): PPO 1M vec8, seed-major so s0
#      coverage lands first; then SAC as time allows.
# Checkpoints persist under logs/sb3_vec/ (tracked in git: ephemeral
# machines — today's PPO resume only exists because of this).
cd /root/repo
mkdir -p logs/r5 logs/sb3_vec
PPO_PID="$1"

(
  while true; do
    sleep 1800
    git add docs/sb3/ logs/sb3_vec/ 2>/dev/null
    git commit -q -m "sb3 full-recipe: periodic history/checkpoint snapshot" 2>/dev/null || true
  done
) &
COMMITTER=$!

if [ -n "$PPO_PID" ]; then
  while kill -0 "$PPO_PID" 2>/dev/null; do sleep 60; done
fi
git add docs/sb3/sb3_ppo_ObstaclesCurrentRemus_s0.json logs/r4/sb3_ppo_ocr_s0_5m.log logs/sb3_vec/ 2>/dev/null
git commit -q -m "sb3 flagship PPO s0 at 5M steps (reference recipe, vec16)" || true

python scripts/sb3_compare.py sb3 --algo sac --kind ObstaclesCurrentRemus \
  --steps 5000000 --seed 0 --vec 16 --det-eval 512 --resume \
  > logs/r5/sb3_sac_ocr_s0_5m.log 2>&1
git add docs/sb3/sb3_sac_ObstaclesCurrentRemus_s0.json logs/r5/sb3_sac_ocr_s0_5m.log logs/sb3_vec/ 2>/dev/null
git commit -q -m "sb3 flagship SAC s0 at 5M steps (reference recipe, vec16)" || true

_complete() {  # JSON PATH, TARGET STEPS: done = full steps + det_eval present
  python - "$1" "$2" <<'PY'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    sys.exit(0 if d.get("det_eval") and d.get("steps", 0) >= int(sys.argv[2])
             else 1)
except Exception:
    sys.exit(1)
PY
}

run_sb3() {  # ALGO KIND SEED
  local OUT="docs/sb3/sb3-recipe_$1_$2_s$3.json"
  _complete "$OUT" 1000000 && { echo "skip $OUT"; return; }
  python scripts/sb3_compare.py sb3 --algo "$1" --kind "$2" \
    --steps 1000000 --seed "$3" --vec 8 --det-eval 256 \
    --impl sb3-recipe --resume \
    > "logs/r5/sb3r_$1_$2_s$3.log" 2>&1
  python scripts/sb3_compare.py report >/dev/null 2>&1 || true
  git add docs/sb3_comparison.md docs/sb3_comparison*.png 2>/dev/null
  git add docs/sb3/ "logs/r5/sb3r_$1_$2_s$3.log" logs/sb3_vec/ 2>/dev/null
  git commit -q -m "sb3 full-recipe $1 $2 s$3 (1M, vec8)" || true
}

# seed-major, algos interleaved: complete s0 across kinds+algos first —
# 4 cores cannot fit 18 x 1M runs, so order by marginal evidence value
# and let the round boundary cut the tail.
for seed in 0 1 2; do
  for kind in Simple Capsule Obstacles; do
    run_sb3 ppo "$kind" "$seed"
  done
  for kind in Simple Capsule Obstacles; do
    run_sb3 sac "$kind" "$seed"
  done
done
kill $COMMITTER 2>/dev/null
echo "[r5_cpu_main] done"
