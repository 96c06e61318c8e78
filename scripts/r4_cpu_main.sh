#!/bin/bash
# Round-4 CPU queue (post-restart): the reference-SB3 side of VERDICT
# items 1b + 3.  The two 2M-step flagship SAC runs finished before the
# restart (docs/sb3/sb3_sac_ObstaclesCurrentRemus_s{0,1}.json: tail-500
# success 0.000 on both) but their /tmp checkpoints died, so the 5M
# extension restarts from scratch into the now-persistent
# logs/sb3_vec/ checkpoint dir.
#   lane A: flagship SAC s0 -> 5M steps, vec 16 (reference main_remus.py
#           recipe).
#   lane B: flagship PPO s0 -> 5M, then bluerov full-recipe PPO
#           (main.py scale: 1M x 8 workers) Simple/Capsule/Obstacles,
#           seeds 0..2 as time allows.
# A committer loop snapshots histories + checkpoints every 15 min.
cd /root/repo
mkdir -p logs/r4 logs/sb3_vec

(
  while true; do
    sleep 900
    git add -f docs/sb3/*.json logs/sb3_vec/*/ckpt.zip 2>/dev/null
    git commit -q -m "sb3 full-recipe: periodic history/checkpoint snapshot" 2>/dev/null || true
  done
) &
COMMITTER=$!

(
  python scripts/sb3_compare.py sb3 --algo sac --kind ObstaclesCurrentRemus \
    --steps 5000000 --seed 0 --vec 16 --det-eval 512 --resume \
    > logs/r4/sb3_sac_ocr_s0_5m.log 2>&1
  git add -f docs/sb3/sb3_sac_ObstaclesCurrentRemus_s0.json logs/r4/sb3_sac_ocr_s0_5m.log
  git commit -q -m "sb3 flagship SAC s0 at 5M steps (reference recipe, vec16)" || true
) &
LANEA=$!

(
  python scripts/sb3_compare.py sb3 --algo ppo --kind ObstaclesCurrentRemus \
    --steps 5000000 --seed 0 --vec 16 --det-eval 512 --resume \
    > logs/r4/sb3_ppo_ocr_s0_5m.log 2>&1
  git add -f docs/sb3/sb3_ppo_ObstaclesCurrentRemus_s0.json logs/r4/sb3_ppo_ocr_s0_5m.log
  git commit -q -m "sb3 flagship PPO s0 at 5M steps (reference recipe, vec16)" || true
  for seed in 0 1 2; do
    for kind in Simple Capsule Obstacles; do
      python scripts/sb3_compare.py sb3 --algo ppo --kind $kind \
        --steps 1000000 --seed $seed --vec 8 --det-eval 256 \
        --impl sb3-recipe --resume \
        > logs/r4/sb3r_ppo_${kind}_s${seed}.log 2>&1
      git add -f "docs/sb3/sb3-recipe_ppo_${kind}_s${seed}.json" "logs/r4/sb3r_ppo_${kind}_s${seed}.log"
      git commit -q -m "sb3 full-recipe PPO $kind s$seed (1M, vec8)" || true
    done
  done
) &
LANEB=$!

wait $LANEA $LANEB
kill $COMMITTER 2>/dev/null
echo "[cpu_main] done"
