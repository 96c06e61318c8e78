#!/bin/bash
# Round-4 TPU queue 2 (runs after queue 1): the OURS side of the
# full-recipe comparison (VERDICT item 3) — our learners at the
# reference's actual training scales and hyper-params (main.py: 1M x 8
# workers bluerov PPO; main_remus.py: SAC/PPO x 16 workers remus), with
# 1024-episode deterministic true-config evals.  Minutes per run on the
# chip vs hours for the SB3 side on CPU.
cd /root/repo
mkdir -p logs/r4
WD="scripts/tpu_watchdog.sh"

run() {  # algo kind steps seed n_envs
  $WD "logs/r4/oursr_$2_$1_s$4.log" 900 3 -- \
    python scripts/sb3_compare.py ours --algo "$1" --kind "$2" \
      --steps "$3" --seed "$4" --n-envs "$5" --platform tpu \
      --hyper test --impl ours-recipe --det-eval 1024
  git add -f docs/sb3/ours-recipe_* 2>/dev/null
  git commit -q -m "ours full-recipe: $1 $2 s$4" 2>/dev/null || true
}

# bluerov PPO, reference main.py scale: 1M steps, 8 env workers, 3 seeds
for seed in 0 1 2; do
  for kind in Simple Capsule Obstacles; do
    run ppo "$kind" 1000000 "$seed" 8
  done
done
# remus recipe scale (main_remus.py: vec 16): flagship SAC 5M x 2 seeds,
# flagship PPO 5M, SimpleRemus SAC 2M
run sac ObstaclesCurrentRemus 5000000 0 16
run sac ObstaclesCurrentRemus 5000000 1 16
run ppo ObstaclesCurrentRemus 5000000 0 16
run sac SimpleRemus 2000000 0 16
