#!/bin/bash
# Round-4 TPU queue 1c: the measured-good recipes for the remaining rows.
# Probe battery (logs/r4/probeA_*/probeB_*): on the ring-less Capsule
# rows the gap-via x GRU x prev-act combination reliably stalls phase A
# (0.000 at every lr/seed tried) while plain Euclidean guidance learns
# approach immediately (0.21 in 800 iters), and switching to the
# geodesic for the collision phases B/C (detour-aware around the center
# shell) beats staying Euclidean 0.59-vs-0.43 at 1200 iters.
# NoCap keeps the obs-row machinery (real ring -> gap-via works there).
cd /root/repo
mkdir -p logs/r4 logs/remus_crack
WD="scripts/tpu_watchdog.sh"

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
