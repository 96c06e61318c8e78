#!/bin/bash
# Round-3 crack chain g3b: the proven phase-split recipe (apgA2/B2/C2
# structure) with the round-2-final knob stack (gap-via, ring-clear,
# far-weight, act-noise) and honest 1024-episode checkpoint selection.
# Phase A: pure approach (pen 0), gap-via guidance, GRU 64.
# Phase B: collision fine-tune warm-started from A's final iterate.
# Phase C: long continuation at low lr.
set -e
cd /root/repo

python scripts/remus_apg.py --rnn 64 --gap-via --pen-weight 0 \
  --d-floor 0.3 --mean-d 0.3 --lr 2e-3 --batch 128 --iters 3000 \
  --eval-every 500 --eval-episodes 256 --seed 0 --tag g3bA \
  > logs/r3/g3bA.log 2>&1

python scripts/remus_apg.py --rnn 64 --gap-via --pen-weight 20 \
  --pen-ring 40 --d-floor 0.3 --mean-d 0.1 --far-weight 2.0 \
  --ring-clear 0.5 --act-noise 0.05 --lr 1e-3 --batch 128 --iters 8000 \
  --eval-every 200 --eval-episodes 1024 \
  --init-params logs/remus_crack/g3bA_final.pkl --seed 1 --tag g3bB \
  > logs/r3/g3bB.log 2>&1

python scripts/remus_apg.py --rnn 64 --gap-via --pen-weight 20 \
  --pen-ring 40 --d-floor 0.3 --mean-d 0.1 --far-weight 2.0 \
  --ring-clear 0.5 --act-noise 0.05 --lr 7e-4 --batch 128 --iters 30000 \
  --eval-every 200 --eval-episodes 1024 \
  --init-params logs/remus_crack/g3bB_policy.pkl --seed 2 --tag g3bC \
  > logs/r3/g3bC.log 2>&1

python scripts/remus_eval.py logs/remus_crack/g3bC_policy.pkl \
  --episodes 2048 --diag > logs/r3/g3bC_eval.log 2>&1
