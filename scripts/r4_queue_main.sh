#!/bin/bash
# Round-4 continuation queue (post-restart): the machine died before
# queue 1c / 2 / 3 ran.  One serialized TPU queue, highest-leverage
# first, committing each artifact as it lands (ephemeral machines):
#   0. flagship matrix row — logs/matrix/ObstaclesCurrentDocking3d_remus
#      was never written (VERDICT r3 weak-2): merge the g3cE policy.
#   1. queue-1c back-port rows with the probe-measured recipes
#      (Euclidean phase A on the ring-less Capsule rows, geodesic B/C;
#      gap-via throughout on NoCap which has a real ring).
#   2. queue-2 ours-recipe comparison runs (VERDICT r3 weak-3) — our
#      learners at the reference's actual training scales.
#   3. queue-3 continuations (r4obsD far-weight-3 restart, g4E2
#      flagship continuation) + REMUS bench attribution.
cd /root/repo
mkdir -p logs/r4 logs/remus_crack
WD="scripts/tpu_watchdog.sh"

# ---- 0. flagship matrix row (minutes; unblocks matrix completeness) ----
if [ ! -f logs/matrix/ObstaclesCurrentDocking3d_remus-v0.json ]; then
  $WD logs/r4/flagship_merge.log 1200 3 -- \
    python scripts/matrix_apg_merge.py ObstaclesCurrentDocking3d_remus-v0 \
      logs/remus_crack/g3cE_policy.pkl --recipe apg-gru-phasesplit \
      --episodes 1024
  if python -c "import json;json.load(open('logs/matrix/ObstaclesCurrentDocking3d_remus-v0.json'))"; then
    git add -f logs/matrix/ObstaclesCurrentDocking3d_remus-v0.json logs/r4/flagship_merge.log
    git commit -q -m "matrix: ObstaclesCurrentDocking3d_remus-v0 row (flagship g3cE, 1024-ep true eval)"
  fi
fi

# ---- 1. queue-1c back-port rows ----
run_row() {  # ENV TAG GUIDE_A GUIDE_BC RINGLEV A B C
  ENV=$1; TAG=$2; GA=$3; GBC=$4; RINGLEV=$5; A=$6; B=$7; C=$8
  $WD logs/r4/${TAG}A.log 1200 3 -- \
    python scripts/remus_apg.py --env "$ENV" $GA --rnn 64 --prev-act \
      --pen-weight 0 --d-floor 0.3 --mean-d 0.3 --lr 2e-3 --batch 128 \
      --iters "$A" --eval-every 500 --eval-episodes 256 --seed 0 \
      --tag "${TAG}A"
  $WD logs/r4/${TAG}B.log 1200 3 -- \
    python scripts/remus_apg.py --env "$ENV" $GBC --rnn 64 --prev-act \
      --pen-weight 20 --pen-ring 40 $RINGLEV --d-floor 0.3 --mean-d 0.1 \
      --far-weight 2.0 --act-noise 0.05 --lr 1e-3 --batch 128 \
      --iters "$B" --eval-every 200 --eval-episodes 1024 \
      --init-params "logs/remus_crack/${TAG}A_final.pkl" --seed 1 \
      --tag "${TAG}B"
  $WD logs/r4/${TAG}C.log 1200 3 -- \
    python scripts/remus_apg.py --env "$ENV" $GBC --rnn 64 --prev-act \
      --pen-weight 20 --pen-ring 40 $RINGLEV --d-floor 0.3 --mean-d 0.1 \
      --far-weight 2.0 --act-noise 0.05 --lr 7e-4 --batch 128 \
      --iters "$C" --eval-every 200 --eval-episodes 1024 \
      --init-params "logs/remus_crack/${TAG}B_policy.pkl" --seed 2 \
      --tag "${TAG}C"
  $WD logs/r4/${TAG}_merge.log 1200 3 -- \
    python scripts/matrix_apg_merge.py "$ENV" \
      "logs/remus_crack/${TAG}C_policy.pkl" --recipe apg-gru-backport \
      --episodes 1024
  if python -c "import json;json.load(open('logs/matrix/${ENV}.json'))"; then
    git add -f "logs/matrix/${ENV}.json" "logs/remus_crack/${TAG}C_policy.pkl" \
      "logs/remus_crack/${TAG}A.json" "logs/remus_crack/${TAG}B.json" \
      "logs/remus_crack/${TAG}C.json" logs/r4/${TAG}*.log
    git commit -q -m "matrix backport: ${ENV} APG result"
  fi
}

run_row CapsuleDocking3d_remus-v0 r4cap3 "" "--geodesic" "" 2500 6000 14000
run_row CapsuleCurrentDocking3d_remus-v0 r4capc3 "" "--geodesic" "" 2500 6000 14000
run_row ObstaclesNoCapDocking3d_remus-v0 r4nocap \
  "--gap-via --geo-radius 0.3" "--gap-via --geo-radius 0.3" \
  "--ring-slow 0.5 --ring-clear 0.5" 2000 5000 10000

# ---- 2. queue-2: ours side of the full-recipe comparison ----
run_cmp() {  # algo kind steps seed n_envs
  $WD "logs/r4/oursr_$2_$1_s$4.log" 900 3 -- \
    python scripts/sb3_compare.py ours --algo "$1" --kind "$2" \
      --steps "$3" --seed "$4" --n-envs "$5" --platform tpu \
      --hyper test --impl ours-recipe --det-eval 1024
  git add -f docs/sb3/ours-recipe_* logs/r4/oursr_*.log 2>/dev/null
  git commit -q -m "ours full-recipe: $1 $2 s$4" 2>/dev/null || true
}

for seed in 0 1 2; do
  for kind in Simple Capsule Obstacles; do
    run_cmp ppo "$kind" 1000000 "$seed" 8
  done
done
run_cmp sac ObstaclesCurrentRemus 5000000 0 16
run_cmp sac ObstaclesCurrentRemus 5000000 1 16
run_cmp ppo ObstaclesCurrentRemus 5000000 0 16
run_cmp sac SimpleRemus 2000000 0 16

# ---- 3. queue-3 continuations ----
$WD logs/r4/r4obsD.log 1200 3 -- \
  python scripts/remus_apg.py --env ObstaclesDocking3d_remus-v0 --gap-via \
    --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 --ring-slow 0.5 \
    --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 --far-weight 3.0 \
    --act-noise 0.05 --lr 7e-4 --batch 128 --iters 15000 \
    --eval-every 200 --eval-episodes 1024 \
    --init-params logs/remus_crack/r4obsC_policy.pkl --seed 5 --tag r4obsD
$WD logs/r4/r4obsD_merge.log 1200 3 -- \
  python scripts/matrix_apg_merge.py ObstaclesDocking3d_remus-v0 \
    logs/remus_crack/r4obsD_policy.pkl --recipe apg-gru-backport-D \
    --episodes 1024
git add -f logs/matrix/ObstaclesDocking3d_remus-v0.json \
  logs/remus_crack/r4obsD*.pkl logs/remus_crack/r4obsD.json logs/r4/r4obsD*.log 2>/dev/null
git commit -q -m "matrix backport: ObstaclesDocking3d_remus D continuation" || true

$WD logs/r4/g4E2.log 1200 3 -- \
  python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
    --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
    --ring-slow 0.8 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
    --far-weight 3.0 --act-noise 0.05 --lr 7e-4 --batch 128 \
    --iters 20000 --eval-every 200 --eval-episodes 2048 \
    --init-params logs/remus_crack/g3cE_policy.pkl --seed 7 --tag g4E2
$WD logs/r4/g4E2_eval.log 1200 3 -- \
  python scripts/remus_eval.py logs/remus_crack/g4E2_policy.pkl \
    --episodes 8192 --diag --json-out logs/remus_crack/G4E2_EVAL.json
git add -f logs/remus_crack/g4E2*.pkl logs/remus_crack/g4E2.json \
  logs/remus_crack/G4E2_EVAL.json logs/r4/g4E2*.log 2>/dev/null
git commit -q -m "flagship: g4E2 continuation + 8192-episode eval" || true

$WD logs/r4/profile_remus.log 1200 3 -- python scripts/profile_remus.py
BENCH_ENV=ObstaclesCurrentDocking3d_remus-v0 python bench.py \
  > logs/r4/bench_remus_r4.log 2>&1
git add -f logs/r4/profile_remus.log logs/r4/bench_remus_r4.log 2>/dev/null
git commit -q -m "REMUS bench attribution + refresh" || true
echo "[queue_main] done"
