#!/bin/bash
# Round-3 queue 5 (fresh machine): re-run the full 14-row scenario matrix.
# The round's earlier matrix artifacts lived in gitignored logs/ and were
# lost with the previous machine — this queue regenerates every row and
# COMMITS each row's json+model as it lands (git add -f past .gitignore).
#
# Rows run cheap -> heavy.  Per-row budget valve: logs/r3/mult is re-read
# before every row, so the remaining rows can be trimmed mid-queue
# (echo 0.5 > logs/r3/mult) without touching the running script.
cd /root/repo
mkdir -p logs/r3 logs/matrix
[ -f logs/r3/mult ] || echo 1.0 > logs/r3/mult

run_row() {
  local row=$1 mult=$2
  local eff
  eff=$(python3 -c "print(float(open('logs/r3/mult').read()) * $mult)")
  echo "=== $row (MATRIX_BUDGET_MULT=$eff) $(date -u +%H:%M:%S) ==="
  MATRIX_BUDGET_MULT=$eff bash scripts/tpu_watchdog.sh \
    "logs/r3/matrix_${row}.log" 600 2 -- \
    python scripts/scenario_matrix.py "$row"
  if [ -f "logs/matrix/${row}.json" ]; then
    git add -f "logs/matrix/${row}.json" "logs/matrix/${row%-v0}_model"* \
      2>/dev/null
    git commit -m "matrix: ${row} result" -- \
      "logs/matrix/${row}.json" "logs/matrix/${row%-v0}_model"* \
      2>/dev/null || true
  fi
}

# --- cheap PPO rows (minutes each) -----------------------------------
run_row SimpleDocking3d-v0 1.0
run_row SimpleCurrentDocking3d-v0 1.0
run_row ObstaclesCurrentDocking3d-v0 1.0
run_row ObstaclesNoCapDocking3d-v0 1.0
# --- PPO precision rows (window-ladder) ------------------------------
run_row CapsuleDocking3d-v0 1.0
run_row CapsuleCurrentDocking3d-v0 1.0
run_row ObstaclesDocking3d-v0 1.0
# --- REMUS SAC rows ---------------------------------------------------
run_row SimpleDocking3d_remus-v0 1.0
run_row SimpleCurrentDocking3d_remus-v0 1.0
run_row ObstaclesNoCapDocking3d_remus-v0 1.0
# --- heavy REMUS HER-window rows (budget-trimmed to fit the round) ---
run_row CapsuleDocking3d_remus-v0 0.5
run_row CapsuleCurrentDocking3d_remus-v0 0.5
run_row ObstaclesDocking3d_remus-v0 0.5
echo "=== queue5 complete $(date -u +%H:%M:%S) ==="
