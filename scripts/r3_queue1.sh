#!/bin/bash
# Round-3 TPU queue 1.
# g3c: phase-split chain (the structure that beat the all-in-one window
#      anneal g3a 0.418-vs-0.395) with the two new levers: --prev-act
#      (actuator-lag observability) and --ring-slow (shed speed at ring
#      shells; 73% of apgC2 collisions are ring grazes).
# then her_window: reproduce the model-free HerSAC 0.50 line (checkpoint
#      was lost with the round-2 machine).
set -e
cd /root/repo

python scripts/remus_apg.py --rnn 64 --gap-via --prev-act --pen-weight 0 \
  --d-floor 0.3 --mean-d 0.3 --lr 2e-3 --batch 128 --iters 3000 \
  --eval-every 500 --eval-episodes 256 --seed 0 --tag g3cA \
  > logs/r3/g3cA.log 2>&1

python scripts/remus_apg.py --rnn 64 --gap-via --prev-act --pen-weight 20 \
  --pen-ring 40 --ring-slow 0.5 --d-floor 0.3 --mean-d 0.1 \
  --far-weight 2.0 --ring-clear 0.5 --act-noise 0.05 --lr 1e-3 \
  --batch 128 --iters 8000 --eval-every 200 --eval-episodes 1024 \
  --init-params logs/remus_crack/g3cA_final.pkl --seed 1 --tag g3cB \
  > logs/r3/g3cB.log 2>&1

python scripts/remus_apg.py --rnn 64 --gap-via --prev-act --pen-weight 20 \
  --pen-ring 40 --ring-slow 0.5 --d-floor 0.3 --mean-d 0.1 \
  --far-weight 2.0 --ring-clear 0.5 --act-noise 0.05 --lr 7e-4 \
  --batch 128 --iters 30000 --eval-every 200 --eval-episodes 1024 \
  --init-params logs/remus_crack/g3cB_policy.pkl --seed 2 --tag g3cC \
  > logs/r3/g3cC.log 2>&1

python scripts/remus_eval.py logs/remus_crack/g3cC_policy.pkl \
  --episodes 2048 --diag > logs/r3/g3cC_eval.log 2>&1

python scripts/remus_crack.py her_window > logs/r3/her_window.log 2>&1
