#!/bin/bash
# Round-5 final chip queue: 3 more ours SAC Capsule seeds — the SAC
# Capsule full-recipe comparison is bimodal (lift-off or not) and 3
# seeds per side under-samples it.
cd /root/repo
WD="scripts/tpu_watchdog.sh"
for seed in 3 4 5; do
  OUT="docs/sb3/ours-recipe_sac_Capsule_s${seed}.json"
  [ -f "$OUT" ] && continue
  $WD "logs/r5/oursr_Capsule_sac_s${seed}.log" 900 3 -- \
    python scripts/sb3_compare.py ours --algo sac --kind Capsule \
      --steps 1000000 --seed "$seed" --n-envs 8 --platform tpu \
      --hyper test --impl ours-recipe --det-eval 1024
  python scripts/sb3_compare.py report >/dev/null 2>&1 || true
  git add docs/sb3/ docs/sb3_comparison.md docs/sb3_comparison*.png logs/r5/ 2>/dev/null
  git commit -q -m "ours full-recipe: sac Capsule s${seed}" || true
done
echo "[r5_queue8] done"
