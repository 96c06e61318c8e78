#!/bin/bash
# Round-3 TPU queue 4: g3cE high-precision eval, then the remaining
# matrix rows (cheap -> heavy; SimpleDocking3d-v0 already done).
cd /root/repo

python scripts/remus_eval.py logs/remus_crack/g3cE_policy.pkl \
  --episodes 8192 --diag --json-out logs/remus_crack/FLAGSHIP_E.json \
  > logs/r3/g3cE_eval.log 2>&1

for row in SimpleCurrentDocking3d-v0 ObstaclesNoCapDocking3d-v0 \
           SimpleDocking3d_remus-v0 SimpleCurrentDocking3d_remus-v0 \
           CapsuleDocking3d-v0 CapsuleCurrentDocking3d-v0 \
           ObstaclesDocking3d-v0 ObstaclesCurrentDocking3d-v0 \
           ObstaclesNoCapDocking3d_remus-v0; do
  timeout 7200 python scripts/scenario_matrix.py "$row" \
    > "logs/r3/matrix_${row}.log" 2>&1
done

MATRIX_BUDGET_MULT=0.6 bash scripts/r3_queue2b.sh > logs/r3/queue2b.log 2>&1
