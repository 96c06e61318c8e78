#!/bin/bash
# Rapid phase-A probe battery on CapsuleDocking3d_remus: which knob makes
# the approach learnable?  (obs row learns in 500 iters with identical
# machinery; both guidance variants stall on this row with an early
# saturation spike.)  800 iters each, ~2-3 min/probe on the chip.
cd /root/repo
mkdir -p logs/r4
WD="scripts/tpu_watchdog.sh"
COMMON="--pen-weight 0 --d-floor 0.3 --mean-d 0.3 --batch 128 --iters 800 \
  --eval-every 400 --eval-episodes 128"

$WD logs/r4/probeA_base.log 900 2 -- python scripts/remus_apg.py \
  --env CapsuleDocking3d_remus-v0 --gap-via --rnn 64 --prev-act \
  --lr 2e-3 --seed 0 $COMMON --tag probeA_base
$WD logs/r4/probeA_eucl.log 900 2 -- python scripts/remus_apg.py \
  --env CapsuleDocking3d_remus-v0 --rnn 64 --prev-act \
  --lr 2e-3 --seed 0 $COMMON --tag probeA_eucl
$WD logs/r4/probeA_mlp.log 900 2 -- python scripts/remus_apg.py \
  --env CapsuleDocking3d_remus-v0 --gap-via --prev-act \
  --lr 2e-3 --seed 0 $COMMON --tag probeA_mlp
$WD logs/r4/probeA_noprev.log 900 2 -- python scripts/remus_apg.py \
  --env CapsuleDocking3d_remus-v0 --gap-via --rnn 64 \
  --lr 2e-3 --seed 0 $COMMON --tag probeA_noprev
$WD logs/r4/probeA_lr5e4.log 900 2 -- python scripts/remus_apg.py \
  --env CapsuleDocking3d_remus-v0 --gap-via --rnn 64 --prev-act \
  --lr 5e-4 --seed 0 $COMMON --tag probeA_lr5e4
$WD logs/r4/probeA_seed3.log 900 2 -- python scripts/remus_apg.py \
  --env CapsuleDocking3d_remus-v0 --gap-via --rnn 64 --prev-act \
  --lr 2e-3 --seed 3 $COMMON --tag probeA_seed3
$WD logs/r4/probeA_obsctl.log 900 2 -- python scripts/remus_apg.py \
  --env ObstaclesDocking3d_remus-v0 --gap-via --rnn 64 --prev-act \
  --lr 2e-3 --seed 0 $COMMON --tag probeA_obsctl
grep -H "iter 79\|FINAL" logs/r4/probeA_*.log
