#!/bin/bash
# Round-3 TPU queue 3: phase-D polish of the g3c line from the 0.511
# tracker-best checkpoint.  Bigger batch (256) + low lr (3e-4 cosine) to
# cut the plateau noise that made the C-phase tail swing 0.35-0.51;
# 2048-episode tracker (binomial std 0.011) for honest best-checkpoint
# selection this close to the 0.5 bar.  Then the high-confidence final
# eval on a FRESH key at 8192 episodes (Wilson half-width ~0.011).
set -e
cd /root/repo

python scripts/remus_apg.py --rnn 64 --gap-via --prev-act --pen-weight 20 \
  --pen-ring 40 --ring-slow 0.5 --d-floor 0.3 --mean-d 0.1 \
  --far-weight 2.0 --ring-clear 0.5 --act-noise 0.05 --lr 3e-4 \
  --batch 256 --iters 20000 --eval-every 200 --eval-episodes 2048 \
  --init-params logs/remus_crack/g3cC_policy.pkl --seed 3 --tag g3cD \
  > logs/r3/g3cD.log 2>&1

python scripts/remus_eval.py logs/remus_crack/g3cD_policy.pkl \
  --episodes 8192 --diag --json-out logs/remus_crack/FLAGSHIP.json \
  > logs/r3/g3cD_eval.log 2>&1
