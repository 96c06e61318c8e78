#!/bin/bash
# Round-4 CPU follow-on chain: starts when the two flagship SB3 SAC runs
# (5M steps, vec 16) release their cores.
#   after seed-0 SAC: the flagship SB3 PPO run (item 1b wants SAC+PPO)
#   after seed-1 SAC: the bluerov full-recipe SB3 runs (item 3,
#                     main.py:53-63 scale: 1M steps x 8 workers)
# Artifacts are committed as each run lands (ephemeral machines).
cd /root/repo
S0PID=$1; S1PID=$2
mkdir -p logs/r4

commit_sb3() {
  git add -f docs/sb3/*.json 2>/dev/null
  git commit -q -m "sb3 comparison artifact: $1" 2>/dev/null || true
}

(
  while kill -0 "$S0PID" 2>/dev/null; do sleep 60; done
  commit_sb3 "flagship SAC seed 0 history"
  python scripts/sb3_compare.py sb3 --algo ppo --kind ObstaclesCurrentRemus \
    --steps 5000000 --seed 0 --vec 16 --det-eval 512 --resume \
    > logs/r4/sb3_ppo_ocr_s0.log 2>&1
  commit_sb3 "flagship PPO seed 0 (5M, vec16, reference recipe)"
) &

(
  while kill -0 "$S1PID" 2>/dev/null; do sleep 60; done
  commit_sb3 "flagship SAC seed 1 history"
  for seed in 0 1 2; do
    for kind in Simple Capsule Obstacles; do
      python scripts/sb3_compare.py sb3 --algo ppo --kind $kind \
        --steps 1000000 --seed $seed --vec 8 --det-eval 256 \
        --impl sb3-recipe --resume \
        > logs/r4/sb3r_ppo_${kind}_s${seed}.log 2>&1
      commit_sb3 "bluerov full-recipe PPO $kind s$seed (1M, vec8)"
    done
  done
) &
wait
