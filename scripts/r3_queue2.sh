#!/bin/bash
# Round-3 TPU queue 2: the scenario results matrix (cheap rows first) +
# the REMUS-path bench artifact.  One row per process invocation (fresh
# JAX state; the tunneled chip's remote compile is most reliable that way).
cd /root/repo

# committed REMUS bench artifact (verdict weak #5: the 12.1M steps/s
# figure in docs/performance.md had no reproducible artifact)
BENCH_ENV=ObstaclesDocking3d_remus-v0 timeout 1800 python bench.py \
  > bench_remus.json 2> logs/r3/bench_remus.err

for row in SimpleDocking3d-v0 SimpleCurrentDocking3d-v0 \
           ObstaclesNoCapDocking3d-v0 \
           SimpleDocking3d_remus-v0 SimpleCurrentDocking3d_remus-v0 \
           CapsuleDocking3d-v0 CapsuleCurrentDocking3d-v0 \
           ObstaclesDocking3d-v0 ObstaclesCurrentDocking3d-v0 \
           ObstaclesNoCapDocking3d_remus-v0; do
  timeout 7200 python scripts/scenario_matrix.py "$row" \
    > "logs/r3/matrix_${row}.log" 2>&1
done
