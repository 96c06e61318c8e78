#!/bin/bash
# Round-3 queue 6 (optional, time-permitting after the matrix queue):
# one more cosine restart of the flagship g3c line from the cracked g3cE
# checkpoint (0.5153 [0.5044, 0.5261]).  Each prior restart bought
# +0.01-0.02 (C 0.5034 -> E 0.5153); recipe unchanged from E (far-weight 3
# was the lever that closed the far-side split), fresh seed, 2048-episode
# tracker for honest best-checkpoint selection.  Final eval at 8192
# episodes only replaces FLAGSHIP.json if it beats the E record.
set -e
cd /root/repo
mkdir -p logs/r3

ITERS=${ITERS:-15000}
python scripts/remus_apg.py --rnn 64 --gap-via --prev-act --pen-weight 20 \
  --pen-ring 40 --ring-slow 0.5 --d-floor 0.3 --mean-d 0.1 \
  --far-weight 3.0 --ring-clear 0.5 --act-noise 0.05 --lr 7e-4 \
  --batch 128 --iters "$ITERS" --eval-every 200 --eval-episodes 2048 \
  --init-params logs/remus_crack/g3cE_policy.pkl --seed 5 --tag g3cF \
  > logs/r3/g3cF.log 2>&1

python scripts/remus_eval.py logs/remus_crack/g3cF_policy.pkl \
  --episodes 8192 --diag --json-out logs/remus_crack/FLAGSHIP_F.json \
  > logs/r3/g3cF_eval.log 2>&1

python3 - <<'EOF'
import json, shutil
e = json.load(open("logs/remus_crack/FLAGSHIP.json"))
f = json.load(open("logs/remus_crack/FLAGSHIP_F.json"))
if f["wilson95"][0] > e["wilson95"][0]:
    shutil.copy("logs/remus_crack/FLAGSHIP_F.json",
                "logs/remus_crack/FLAGSHIP.json")
    print("g3cF beats g3cE:", f["success"], f["wilson95"])
else:
    print("g3cF does not beat g3cE:", f["success"], f["wilson95"],
          "(keeping E record)")
EOF
