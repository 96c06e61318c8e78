#!/bin/bash
# Round-4 TPU queue 3 (final): continuations + profiling.
#  - r4obsD: far-weight-3 cosine restart of the ObstaclesDocking3d_remus
#    back-port (0.430 after queue 1) — the same lever that took the
#    flagship 0.503 -> 0.515 (g3cE).
#  - g4E2: one more flagship continuation from g3cE (far-weight 3 kept,
#    ring-slow raised: 75% of residual collisions are ring hits).
#  - REMUS bench attribution (scripts/profile_remus.py) + bench_remus.json
#    refresh.
cd /root/repo
mkdir -p logs/r4 logs/remus_crack
WD="scripts/tpu_watchdog.sh"

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
