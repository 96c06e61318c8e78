#!/bin/bash
# Round-5 TPU queue — VERDICT r4 items 3/4/8 first, then the ours-recipe
# comparison runs (item 5, TPU half).  Serialized: one chip.
#
# Twin-row insight (docs/scenario_matrix.md): ObstaclesDocking3d_remus and
# ObstaclesCurrentDocking3d_remus are the SAME task (position-grid current
# quirk), so every flagship attempt's winner is merged into BOTH rows; the
# round-4 plan's separate r4obsD lane is dropped in favor of pooling all
# chip time into the flagship line.
#
#   1. g4E2  — ring-slow 0.8 continuation of g3cE (20k iters, 2048-ep
#              tracker), the attempt the round-4 queue never reached.
#   2. g5win — composed attempt (VERDICT item 4): phasesplit final policy
#              + spawn-window anneal (the HerSAC 0.50 lever) + ring-entry
#              levers, 3 window stages -> true spawn.
#   3. 8192-episode eval of the round's best; merge winner into both twin
#      rows with provenance; regenerate the matrix doc (postamble).
#   4. REMUS bench + profile refresh (item 8: rays.py changed in r4).
#   5. ours-recipe comparison runs (item 5): PPO bluerov 1M x 8 envs
#      seeds 0-2, then ours-at-reference-scale flagship runs.
cd /root/repo
mkdir -p logs/r5 logs/remus_crack
WD="scripts/tpu_watchdog.sh"

post_matrix() {  # regenerate doc + provenance after any merge (VERDICT item 2)
  python scripts/matrix_backfill_provenance.py >> logs/r5/postamble.log 2>&1
  python scripts/gen_matrix_doc.py >> logs/r5/postamble.log 2>&1
  git add docs/scenario_matrix.md logs/matrix/ 2>/dev/null
}

# ---- 1. g4E2: ring-slow 0.8 continuation --------------------------------
if [ ! -f logs/remus_crack/g4E2_policy.pkl ]; then
  $WD logs/r5/g4E2.log 1200 3 -- \
    python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.05 --lr 7e-4 --batch 128 \
      --iters 20000 --eval-every 200 --eval-episodes 2048 \
      --init-params logs/remus_crack/g3cE_policy.pkl --seed 7 --tag g4E2
  git add logs/remus_crack/g4E2*.pkl logs/remus_crack/g4E2.json logs/r5/g4E2.log 2>/dev/null
  git commit -q -m "flagship attempt g4E2: ring-slow 0.8 continuation of g3cE (20k iters)" || true
fi

# ---- 2. g5win: spawn-window anneal composed with the phasesplit line ----
if [ ! -f logs/remus_crack/g5win_policy.pkl ]; then
  $WD logs/r5/g5win.log 1200 3 -- \
    python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.5 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.05 --lr 7e-4 --batch 128 \
      --stages "1.0:4000:0.2:0.6,1.0:6000:0.5:1.0,1.0:10000:1.0:1.0" \
      --spawn-clearance 0.5 --spawn-speed 1.5 --spawn-aim \
      --eval-every 200 --eval-episodes 1024 \
      --init-params logs/remus_crack/g3cE_policy.pkl --seed 11 --tag g5win
  git add logs/remus_crack/g5win*.pkl logs/remus_crack/g5win.json logs/r5/g5win.log 2>/dev/null
  git commit -q -m "flagship attempt g5win: spawn-window anneal composed onto the phasesplit line (20k iters)" || true
fi

# ---- 3. pick the round best, 8192-ep eval, merge into both twin rows ----
python - <<'EOF' > logs/r5/pick_best.log 2>&1
import json
best, tag = 0.0, None
for t in ("g4E2", "g5win"):
    try:
        d = json.load(open(f"logs/remus_crack/{t}.json"))
        s = d.get("best_success") or 0.0
        print(t, s)
        if s > best:
            best, tag = s, t
    except Exception as e:
        print(t, "ERR", e)
open("logs/r5/BEST_TAG", "w").write(tag or "")
print("best:", tag, best)
EOF
BEST=$(cat logs/r5/BEST_TAG)
if [ -n "$BEST" ]; then
  $WD logs/r5/${BEST}_eval8k.log 1200 3 -- \
    python scripts/remus_eval.py logs/remus_crack/${BEST}_policy.pkl \
      --episodes 8192 --diag --json-out logs/remus_crack/${BEST}_EVAL.json
  # merge into BOTH twin rows (same task): provenance = g3cE chain + 20k
  STEPS=$((91000 * 128 * 300))
  for ENVID in ObstaclesCurrentDocking3d_remus-v0 ObstaclesDocking3d_remus-v0; do
    $WD logs/r5/${BEST}_merge_${ENVID}.log 1200 3 -- \
      python scripts/matrix_apg_merge.py "$ENVID" \
        logs/remus_crack/${BEST}_policy.pkl --recipe "apg-gru-${BEST}" \
        --episodes 1024 --total-steps "$STEPS" --wall-s 15000
  done
  post_matrix
  git add logs/remus_crack/${BEST}_EVAL.json logs/r5/ logs/matrix/ 2>/dev/null
  git commit -q -m "flagship round-5: ${BEST} 8192-ep eval + twin-row merges" || true
fi

# ---- 4. REMUS bench + profile refresh (item 8) --------------------------
$WD logs/r5/profile_remus.log 1200 2 -- python scripts/profile_remus.py
BENCH_ENV=ObstaclesCurrentDocking3d_remus-v0 timeout 1200 python bench.py \
  > logs/r5/bench_remus_r5.log 2>&1
timeout 1200 python bench.py > logs/r5/bench_r5.log 2>&1
git add logs/r5/ 2>/dev/null
git commit -q -m "REMUS + default bench refresh after round-4 rays change" || true

# ---- 5. ours-recipe comparison runs (item 5, TPU half) ------------------
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
echo "[r5_queue_main] done"
