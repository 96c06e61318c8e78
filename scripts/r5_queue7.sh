#!/bin/bash
# Round-5 TPU queue 7 (final): one long 30k-iter cosine on the winning
# g4E4 recipe (the g3cC->g3cE pattern: length itself was part of that
# win) from the g4E4 checkpoint; eval + twin merges only if it wins.
cd /root/repo
WD="scripts/tpu_watchdog.sh"
if [ ! -f logs/remus_crack/g4EA_policy.pkl ]; then
  $WD logs/r5/g4EA.log 1800 3 -- \
    python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.05 --lr 5e-4 --batch 128 \
      --horizon 400 --iters 30000 --eval-every 200 --eval-episodes 2048 \
      --init-params logs/remus_crack/g4E4_policy.pkl --seed 53 --tag g4EA
  git add logs/remus_crack/g4EA*.pkl logs/remus_crack/g4EA.json logs/r5/g4EA.log 2>/dev/null
  git commit -q -m "flagship attempt g4EA: long 30k cosine on the horizon-400 recipe" || true
fi
BEST=$(python -c "
import json
def s(t):
    try: return json.load(open(f'logs/remus_crack/{t}.json')).get('best_success') or 0
    except Exception: return 0
print('g4EA' if s('g4EA') > 0.595 else '')")
if [ -n "$BEST" ]; then
  $WD logs/r5/g4EA_eval8k.log 1800 3 -- \
    python scripts/remus_eval.py logs/remus_crack/g4EA_policy.pkl \
      --episodes 8192 --diag --json-out logs/remus_crack/g4EA_EVAL.json
  for ENVID in ObstaclesCurrentDocking3d_remus-v0 ObstaclesDocking3d_remus-v0; do
    $WD "logs/r5/g4EA_merge_${ENVID}.log" 1800 3 -- \
      python scripts/matrix_apg_merge.py "$ENVID" \
        logs/remus_crack/g4EA_policy.pkl --recipe apg-gru-g4EA \
        --episodes 1024 --total-steps $((136000 * 128 * 380)) --wall-s 23000
  done
  cp logs/remus_crack/g4EA_EVAL.json logs/remus_crack/FLAGSHIP.json
  python scripts/gen_matrix_doc.py >> logs/r5/postamble.log 2>&1
  python scripts/sb3_compare.py report >/dev/null 2>&1 || true
  git add docs/ logs/matrix/ logs/remus_crack/ logs/r5/ 2>/dev/null
  git commit -q -m "flagship g4EA new best: eval + twin-row merges" || true
fi
echo "[r5_queue7] done"
