#!/bin/bash
# Round-4 TPU queue 1b: corrected guidance for the remaining back-port
# rows.  Queue 1's Capsule rows used --geodesic and phase A never learned
# (loss stuck ~9.5, saturation spike by iter 500, all-timeout policies
# drifting with the current; r4capA/B logs), while the gap-via rows
# learned immediately (obs row: 11.9 -> 5.3 in 500 iters, final 0.430).
# The via waypoints give the BPTT gradient reachable intermediate targets
# from the 8-10 m spawn; on ring-less scenarios the phantom vias sit on a
# r=6 circle (ring_az from a zero slot = 0) and blend into the center
# geodesic inside rho<5 — the same landscape shape that works on the obs
# row.  Rows: Capsule, CapsuleCurrent (gap-via now), NoCap (as planned).
cd /root/repo
mkdir -p logs/r4 logs/remus_crack
WD="scripts/tpu_watchdog.sh"

run_row() {
  ENV=$1; TAG=$2; GUIDE=$3; RINGLEV=$4; A=$5; B=$6; C=$7
  $WD logs/r4/${TAG}A.log 1200 3 -- \
    python scripts/remus_apg.py --env "$ENV" $GUIDE --rnn 64 --prev-act \
      --pen-weight 0 --d-floor 0.3 --mean-d 0.3 --lr 2e-3 --batch 128 \
      --iters "$A" --eval-every 500 --eval-episodes 256 --seed 0 \
      --tag "${TAG}A"
  $WD logs/r4/${TAG}B.log 1200 3 -- \
    python scripts/remus_apg.py --env "$ENV" $GUIDE --rnn 64 --prev-act \
      --pen-weight 20 --pen-ring 40 $RINGLEV --d-floor 0.3 --mean-d 0.1 \
      --far-weight 2.0 --act-noise 0.05 --lr 1e-3 --batch 128 \
      --iters "$B" --eval-every 200 --eval-episodes 1024 \
      --init-params "logs/remus_crack/${TAG}A_final.pkl" --seed 1 \
      --tag "${TAG}B"
  $WD logs/r4/${TAG}C.log 1200 3 -- \
    python scripts/remus_apg.py --env "$ENV" $GUIDE --rnn 64 --prev-act \
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

run_row CapsuleDocking3d_remus-v0 r4cap2 "--gap-via" "" 2500 6000 13000
run_row CapsuleCurrentDocking3d_remus-v0 r4capc2 "--gap-via" "" 2500 6000 13000
run_row ObstaclesNoCapDocking3d_remus-v0 r4nocap \
  "--gap-via --geo-radius 0.3" "--ring-slow 0.5 --ring-clear 0.5" \
  2000 5000 10000
