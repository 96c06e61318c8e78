#!/bin/bash
# Round-5 TPU queue 2 — launched after r5_queue_main.sh finishes its
# flagship/bench sections (we kill its ours-recipe marathon and take over).
#   1. g4E3 — one more cosine restart from g4E2 (0.582 tracker), raising
#      the ring-clearance hinge 0.5 -> 0.8: collisions are now 68% of
#      failures (0.395 of 0.417), so the remaining headroom is ring
#      avoidance, the lever that hinge targets.
#   2. If g4E3 beats the round best, 8192-ep eval + twin-row merges.
#   3. Resume the ours-recipe comparison marathon (guards skip done runs).
cd /root/repo
mkdir -p logs/r5
WD="scripts/tpu_watchdog.sh"

_complete() {
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

# ---- 1. g4E3 ------------------------------------------------------------
if [ ! -f logs/remus_crack/g4E3_policy.pkl ]; then
  $WD logs/r5/g4E3.log 1200 3 -- \
    python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.8 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.05 --lr 7e-4 --batch 128 \
      --iters 20000 --eval-every 200 --eval-episodes 2048 \
      --init-params logs/remus_crack/g4E2_policy.pkl --seed 13 --tag g4E3
  git add logs/remus_crack/g4E3*.pkl logs/remus_crack/g4E3.json logs/r5/g4E3.log 2>/dev/null
  git commit -q -m "flagship attempt g4E3: ring-clear 0.8 restart from g4E2 (20k iters)" || true
fi

# ---- 2. merge if it wins ------------------------------------------------
PREV=$(cat logs/r5/BEST_TAG 2>/dev/null)
WIN=$(python - <<'EOF'
import json
def s(t):
    try:
        return json.load(open(f"logs/remus_crack/{t}.json")).get("best_success") or 0.0
    except Exception:
        return 0.0
print("g4E3" if s("g4E3") > max(s("g4E2"), s("g5win")) else "")
EOF
)
if [ -n "$WIN" ]; then
  $WD logs/r5/g4E3_eval8k.log 1200 3 -- \
    python scripts/remus_eval.py logs/remus_crack/g4E3_policy.pkl \
      --episodes 8192 --diag --json-out logs/remus_crack/g4E3_EVAL.json
  STEPS=$((111000 * 128 * 300))
  for ENVID in ObstaclesCurrentDocking3d_remus-v0 ObstaclesDocking3d_remus-v0; do
    $WD "logs/r5/g4E3_merge_${ENVID}.log" 1200 3 -- \
      python scripts/matrix_apg_merge.py "$ENVID" \
        logs/remus_crack/g4E3_policy.pkl --recipe apg-gru-g4E3 \
        --episodes 1024 --total-steps "$STEPS" --wall-s 17500
  done
  python scripts/matrix_backfill_provenance.py >> logs/r5/postamble.log 2>&1
  python scripts/gen_matrix_doc.py >> logs/r5/postamble.log 2>&1
  git add docs/scenario_matrix.md logs/matrix/ logs/remus_crack/g4E3_EVAL.json logs/r5/ 2>/dev/null
  git commit -q -m "flagship round-5: g4E3 8192-ep eval + twin-row merges" || true
fi

# ---- 3. ours-recipe marathon (same as queue 1 section 5) ----------------
run_cmp() {  # ALGO KIND STEPS SEED VEC
  local OUT="docs/sb3/ours-recipe_$1_$2_s$4.json"
  _complete "$OUT" "$3" && { echo "skip $OUT"; return; }
  $WD "logs/r5/oursr_$2_$1_s$4.log" 900 3 -- \
    python scripts/sb3_compare.py ours --algo "$1" --kind "$2" \
      --steps "$3" --seed "$4" --n-envs "$5" --platform tpu --hyper test \
      --impl ours-recipe --det-eval 1024
  python scripts/sb3_compare.py report >/dev/null 2>&1 || true
  git add docs/sb3_comparison.md docs/sb3_comparison*.png 2>/dev/null
  git add docs/sb3/ logs/r5/ 2>/dev/null
  git commit -q -m "ours full-recipe: $1 $2 s$4" || true
}

for seed in 0 1 2; do
  for kind in Simple Capsule Obstacles; do
    run_cmp ppo "$kind" 1000000 "$seed" 8
  done
done
for seed in 0 1 2; do
  for kind in Simple Capsule Obstacles; do
    run_cmp sac "$kind" 1000000 "$seed" 8
  done
done
run_cmp sac ObstaclesCurrentRemus 5000000 0 16
run_cmp ppo ObstaclesCurrentRemus 5000000 0 16
run_cmp sac SimpleRemus 2000000 0 16
echo "[r5_queue2] done"
