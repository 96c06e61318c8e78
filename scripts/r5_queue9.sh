#!/bin/bash
# Final chip shot: horizon 500 at the stabilized lr (the E-line statement
# names "longer horizons at a stabilized lr" as the next mechanism; test
# it before closing the round).
cd /root/repo
WD="scripts/tpu_watchdog.sh"
if [ ! -f logs/remus_crack/g4EB_policy.pkl ]; then
  $WD logs/r5/g4EB.log 1800 2 -- \
    python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.05 --lr 3e-4 --batch 128 \
      --horizon 500 --iters 12000 --eval-every 200 --eval-episodes 2048 \
      --init-params logs/remus_crack/g4E4_policy.pkl --seed 59 --tag g4EB
  git add logs/remus_crack/g4EB*.pkl logs/remus_crack/g4EB.json logs/r5/g4EB.log 2>/dev/null
  git commit -q -m "flagship attempt g4EB: horizon 500 at lr 3e-4 from g4E4 (12k iters)" || true
fi
BEAT=$(python -c "
import json
try: print('y' if (json.load(open('logs/remus_crack/g4EB.json')).get('best_success') or 0) > 0.595 else '')
except Exception: print('')")
if [ -n "$BEAT" ]; then
  $WD logs/r5/g4EB_eval8k.log 1800 2 -- \
    python scripts/remus_eval.py logs/remus_crack/g4EB_policy.pkl \
      --episodes 8192 --diag --json-out logs/remus_crack/g4EB_EVAL.json
  for ENVID in ObstaclesCurrentDocking3d_remus-v0 ObstaclesDocking3d_remus-v0; do
    $WD "logs/r5/g4EB_merge_${ENVID}.log" 1800 2 -- \
      python scripts/matrix_apg_merge.py "$ENVID" \
        logs/remus_crack/g4EB_policy.pkl --recipe apg-gru-g4EB \
        --episodes 1024 --total-steps $((118000 * 128 * 400)) --wall-s 25000
  done
  cp logs/remus_crack/g4EB_EVAL.json logs/remus_crack/FLAGSHIP.json
  python scripts/gen_matrix_doc.py >> logs/r5/postamble.log 2>&1
  python scripts/sb3_compare.py report >/dev/null 2>&1 || true
  git add docs/ logs/matrix/ logs/remus_crack/ logs/r5/ 2>/dev/null
  git commit -q -m "flagship g4EB new best: eval + twin-row merges" || true
fi
echo "[r5_queue9] done"
