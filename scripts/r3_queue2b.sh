#!/bin/bash
# Round-3 TPU queue 2b: the three heavy REMUS precision rows.
# MATRIX_BUDGET_MULT trims the mastery-gate overtime so all three fit the
# remaining round wall-clock (0.6 x budget_mult 2.0 = 1.2x nominal).
cd /root/repo
export MATRIX_BUDGET_MULT=${MATRIX_BUDGET_MULT:-0.6}

for row in SimpleCurrentDocking3d_remus-v0 CapsuleDocking3d_remus-v0 \
           CapsuleCurrentDocking3d_remus-v0 ObstaclesDocking3d_remus-v0; do
  timeout 7200 python scripts/scenario_matrix.py "$row" \
    > "logs/r3/matrix_${row}.log" 2>&1
done
