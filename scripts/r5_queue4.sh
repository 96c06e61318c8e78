#!/bin/bash
# Round-5 TPU queue 4 — launched after queue 3's marathon: two more
# flagship levers, measured one at a time (history: new-lever cosine
# restarts gain, same-lever polish and over-constraint lose).
#   1. g4E4 — BPTT horizon 300 -> 400 from g4E2: far-side detours take
#      the longest paths and the truncation may be cutting their credit
#      (g4E2 far 0.538 vs near 0.595).
#   2. g4E5 — action-noise anneal 0.05 -> 0.02 polish from the best of
#      (g4E2, g4E4).
#   3. Winner (if any) -> 8192-ep eval, twin-row merges, FLAGSHIP.json
#      refresh, doc regen.
cd /root/repo
mkdir -p logs/r5
WD="scripts/tpu_watchdog.sh"

best_of() {  # prints tag with highest tracker best among args
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

if [ ! -f logs/remus_crack/g4E4_policy.pkl ]; then
  $WD logs/r5/g4E4.log 1800 3 -- \
    python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.05 --lr 5e-4 --batch 128 \
      --horizon 400 --iters 15000 --eval-every 200 --eval-episodes 2048 \
      --init-params logs/remus_crack/g4E2_policy.pkl --seed 17 --tag g4E4
  git add logs/remus_crack/g4E4*.pkl logs/remus_crack/g4E4.json logs/r5/g4E4.log 2>/dev/null
  git commit -q -m "flagship attempt g4E4: BPTT horizon 400 restart from g4E2 (15k iters)" || true
fi

BASE=$(best_of g4E2 g4E4)
if [ ! -f logs/remus_crack/g4E5_policy.pkl ]; then
  $WD logs/r5/g4E5.log 1800 3 -- \
    python scripts/remus_apg.py --env ObstaclesCurrentDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.5 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.02 --lr 3e-4 --batch 128 \
      --iters 10000 --eval-every 200 --eval-episodes 2048 \
      --init-params "logs/remus_crack/${BASE}_policy.pkl" --seed 19 --tag g4E5
  git add logs/remus_crack/g4E5*.pkl logs/remus_crack/g4E5.json logs/r5/g4E5.log 2>/dev/null
  git commit -q -m "flagship attempt g4E5: act-noise 0.02 polish from ${BASE} (10k iters)" || true
fi

WIN=$(best_of g4E2 g4E4 g4E5)
if [ "$WIN" != "g4E2" ] && [ -n "$WIN" ]; then
  $WD "logs/r5/${WIN}_eval8k.log" 1800 3 -- \
    python scripts/remus_eval.py "logs/remus_crack/${WIN}_policy.pkl" \
      --episodes 8192 --diag --json-out "logs/remus_crack/${WIN}_EVAL.json"
  for ENVID in ObstaclesCurrentDocking3d_remus-v0 ObstaclesDocking3d_remus-v0; do
    $WD "logs/r5/${WIN}_merge_${ENVID}.log" 1800 3 -- \
      python scripts/matrix_apg_merge.py "$ENVID" \
        "logs/remus_crack/${WIN}_policy.pkl" --recipe "apg-gru-${WIN}" \
        --episodes 1024 --total-steps $((126000 * 128 * 350)) --wall-s 20000
  done
  cp "logs/remus_crack/${WIN}_EVAL.json" logs/remus_crack/FLAGSHIP.json
else
  cp logs/remus_crack/g4E2_EVAL.json logs/remus_crack/FLAGSHIP.json
fi
python scripts/gen_matrix_doc.py >> logs/r5/postamble.log 2>&1
python scripts/sb3_compare.py report >/dev/null 2>&1 || true
git add docs/scenario_matrix.md docs/sb3_comparison.md logs/matrix/ logs/remus_crack/ logs/r5/ 2>/dev/null
git commit -q -m "flagship queue 4: ${WIN} outcome + FLAGSHIP artifact refresh" || true
echo "[r5_queue4] done"
