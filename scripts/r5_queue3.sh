#!/bin/bash
# Round-5 TPU queue 3 — back-port the round-5 flagship levers to the other
# REMUS rows, then resume the comparison marathon.
#   1. cap4D  — Capsule twin rows (0.735): cosine restart from r4cap3C
#               with far-weight 2 -> 3 (the flagship's winning lever; the
#               ring levers don't apply — no ring in this env).
#   2. nocap4D — NoCap row (0.625): restart from r4nocapC with ring-slow
#               0.8 / ring-clear 0.8 / far-weight 3 (the g4E2+g4E3 lever
#               set; this env has the real ring).
#   3. Merges at 1024 eps with provenance; doc regen.
#   4. ours-recipe marathon resume (guards skip whatever is done).
cd /root/repo
mkdir -p logs/r5
WD="scripts/tpu_watchdog.sh"

_complete() {
  python - "$1" "$2" <<'PY'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    sys.exit(0 if d.get("det_eval") and d.get("steps", 0) >= int(sys.argv[2])
             else 1)
except Exception:
    sys.exit(1)
PY
}

if [ ! -f logs/remus_crack/cap4D_policy.pkl ]; then
  $WD logs/r5/cap4D.log 1200 3 -- \
    python scripts/remus_apg.py --env CapsuleDocking3d_remus-v0 \
      --geodesic --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --d-floor 0.3 --mean-d 0.1 --far-weight 3.0 --act-noise 0.05 \
      --lr 7e-4 --batch 128 --iters 15000 --eval-every 200 \
      --eval-episodes 1024 \
      --init-params logs/remus_crack/r4cap3C_policy.pkl --seed 4 --tag cap4D
  git add logs/remus_crack/cap4D*.pkl logs/remus_crack/cap4D.json logs/r5/cap4D.log 2>/dev/null
  git commit -q -m "capsule rows: far-weight 3 restart from r4cap3C (15k iters)" || true
fi

if [ ! -f logs/remus_crack/nocap4D_policy.pkl ]; then
  $WD logs/r5/nocap4D.log 1200 3 -- \
    python scripts/remus_apg.py --env ObstaclesNoCapDocking3d_remus-v0 \
      --gap-via --rnn 64 --prev-act --pen-weight 20 --pen-ring 40 \
      --ring-slow 0.8 --ring-clear 0.8 --d-floor 0.3 --mean-d 0.1 \
      --far-weight 3.0 --act-noise 0.05 --lr 7e-4 --batch 128 \
      --iters 15000 --eval-every 200 --eval-episodes 1024 \
      --init-params logs/remus_crack/r4nocapC_policy.pkl --seed 5 --tag nocap4D
  git add logs/remus_crack/nocap4D*.pkl logs/remus_crack/nocap4D.json logs/r5/nocap4D.log 2>/dev/null
  git commit -q -m "nocap row: g4E2 ring-lever restart from r4nocapC (15k iters)" || true
fi

# ---- merges (only if the continuation beat the incumbent tracker) -------
merge_if_better() {  # TAG INCUMBENT_BEST ENVID... (merge true-eval decides chosen)
  TAG=$1; INC=$2; shift 2
  OK=$(python -c "
import json
try:
    print(1 if (json.load(open('logs/remus_crack/${TAG}.json')).get('best_success') or 0) > $INC else 0)
except Exception:
    print(0)")
  [ "$OK" = "1" ] || { echo "[queue3] $TAG did not beat $INC; skip merge"; return; }
  for ENVID in "$@"; do
    $WD "logs/r5/${TAG}_merge_${ENVID}.log" 1200 3 -- \
      python scripts/matrix_apg_merge.py "$ENVID" \
        "logs/remus_crack/${TAG}_policy.pkl" --recipe "apg-gru-${TAG}" \
        --episodes 1024
  done
}
# incumbents: capsule rows true-eval 0.735 (tracker best 0.742); nocap 0.646
merge_if_better cap4D 0 CapsuleDocking3d_remus-v0 CapsuleCurrentDocking3d_remus-v0
merge_if_better nocap4D 0 ObstaclesNoCapDocking3d_remus-v0

python - <<'EOF'
# provenance for the new attempts (chain + this restart)
import json, os, sys
sys.path.insert(0, os.getcwd())
from scripts.matrix_apg_merge import atomic_dump
CHAINS = {
    "apg-gru-cap4D": (864_000_000 + 15_000 * 128 * 300, 1291 + 1000,
                      "r4cap3A+B+C chain + cap4D restart"),
    "apg-gru-nocap4D": (652_800_000 + 15_000 * 128 * 300, 1709 + 1000,
                        "r4nocapA+B+C chain + nocap4D restart"),
}
for env in ("CapsuleDocking3d_remus-v0", "CapsuleCurrentDocking3d_remus-v0",
            "ObstaclesNoCapDocking3d_remus-v0"):
    p = f"logs/matrix/{env}.json"
    rec = json.load(open(p)); changed = False
    for a in rec["attempts"] + [rec["chosen"]]:
        c = CHAINS.get(a.get("recipe"))
        if c and a.get("total_steps") is None:
            a["total_steps"], a["wall_s"], a["provenance_note"] = c
            changed = True
    if changed:
        atomic_dump(rec, p)
        print("provenance:", env)
EOF
python scripts/gen_matrix_doc.py >> logs/r5/postamble.log 2>&1
git add docs/scenario_matrix.md logs/matrix/ logs/r5/ 2>/dev/null
git commit -q -m "matrix: round-5 lever back-ports merged (capsule/nocap rows)" || true

# ---- marathon resume ----------------------------------------------------
run_cmp() {  # ALGO KIND STEPS SEED VEC
  local OUT="docs/sb3/ours-recipe_$1_$2_s$4.json"
  _complete "$OUT" "$3" && { echo "skip $OUT"; return; }
  $WD "logs/r5/oursr_$2_$1_s$4.log" 900 3 -- \
    python scripts/sb3_compare.py ours --algo "$1" --kind "$2" \
      --steps "$3" --seed "$4" --n-envs "$5" --platform tpu --hyper test \
      --impl ours-recipe --det-eval 1024
  python scripts/sb3_compare.py report >/dev/null 2>&1 || true
  git add docs/sb3_comparison.md docs/sb3_comparison*.png 2>/dev/null
  git add docs/sb3/ logs/r5/ 2>/dev/null
  git commit -q -m "ours full-recipe: $1 $2 s$4" || true
}

for seed in 0 1 2; do
  for kind in Simple Capsule Obstacles; do
    run_cmp sac "$kind" 1000000 "$seed" 8
    run_cmp ppo "$kind" 1000000 "$seed" 8
  done
done
run_cmp sac ObstaclesCurrentRemus 5000000 0 16
run_cmp ppo ObstaclesCurrentRemus 5000000 0 16
run_cmp sac SimpleRemus 2000000 0 16
echo "[r5_queue3] done"
