#!/bin/bash
# Round-5 TPU queue 5 — push the horizon-400 line at the 0.6 headline.
#   1. g4E6 — long gentle continuation of g4E4 (its best was mid-run and
#      the tail diverged at lr 5e-4: run the same levers at lr 3e-4 for
#      20k, the g3cC->g3cE long-cosine pattern).
#   2. g4E7 — far-weight 4 restart from the best of (g4E4, g4E6): the
#      far/near split is still 0.565/0.618 at g4E4; oversample harder.
#   3. Best-of-round eval at 8192 + twin merges + FLAGSHIP refresh.
cd /root/repo
mkdir -p logs/r5
WD="scripts/tpu_watchdog.sh"

best_of() {
  python - "$@" <<'PY'
import json, sys
best, tag = -1.0, ""
for t in sys.argv[1:]:
    try:
        s = json.load(open(f"logs/remus_crack/{t}.json")).get("best_success") or 0
    except Exception:
        s = -1
    if s > best:
        best, tag = s, t
print(tag)
PY
}

if [ ! -f logs/remus_crack/g4E6_policy.pkl ]; then
  $WD logs/r5/g4E6.log 1800 3 -- \
    python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.05 --lr 3e-4 --batch 128 \
      --horizon 400 --iters 20000 --eval-every 200 --eval-episodes 2048 \
      --init-params logs/remus_crack/g4E4_policy.pkl --seed 23 --tag g4E6
  git add logs/remus_crack/g4E6*.pkl logs/remus_crack/g4E6.json logs/r5/g4E6.log 2>/dev/null
  git commit -q -m "flagship attempt g4E6: long lr-3e-4 continuation of the horizon-400 line (20k iters)" || true
fi

BASE=$(best_of g4E4 g4E6)
if [ ! -f logs/remus_crack/g4E7_policy.pkl ]; then
  $WD logs/r5/g4E7.log 1800 3 -- \
    python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 4.0 --act-noise 0.05 --lr 5e-4 --batch 128 \
      --horizon 400 --iters 15000 --eval-every 200 --eval-episodes 2048 \
      --init-params "logs/remus_crack/${BASE}_policy.pkl" --seed 29 --tag g4E7
  git add logs/remus_crack/g4E7*.pkl logs/remus_crack/g4E7.json logs/r5/g4E7.log 2>/dev/null
  git commit -q -m "flagship attempt g4E7: far-weight 4 restart from ${BASE} (15k iters)" || true
fi

WIN=$(best_of g4E4 g4E6 g4E7)
if [ "$WIN" != "g4E4" ] && [ -n "$WIN" ]; then
  $WD "logs/r5/${WIN}_eval8k.log" 1800 3 -- \
    python scripts/remus_eval.py "logs/remus_crack/${WIN}_policy.pkl" \
      --episodes 8192 --diag --json-out "logs/remus_crack/${WIN}_EVAL.json"
  for ENVID in ObstaclesCurrentDocking3d_remus-v0 ObstaclesDocking3d_remus-v0; do
    $WD "logs/r5/${WIN}_merge_${ENVID}.log" 1800 3 -- \
      python scripts/matrix_apg_merge.py "$ENVID" \
        "logs/remus_crack/${WIN}_policy.pkl" --recipe "apg-gru-${WIN}" \
        --episodes 1024 --total-steps $((161000 * 128 * 360)) --wall-s 24000
  done
  cp "logs/remus_crack/${WIN}_EVAL.json" logs/remus_crack/FLAGSHIP.json
  python scripts/gen_matrix_doc.py >> logs/r5/postamble.log 2>&1
  python scripts/sb3_compare.py report >/dev/null 2>&1 || true
  git add docs/scenario_matrix.md docs/sb3_comparison.md logs/matrix/ logs/remus_crack/ logs/r5/ 2>/dev/null
  git commit -q -m "flagship queue 5: ${WIN} new best - eval + twin-row merges" || true
fi
echo "[r5_queue5] done"
