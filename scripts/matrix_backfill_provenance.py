"""Backfill training provenance (total_steps / wall_s) on APG matrix rows.

VERDICT r4 weak-5: the round-4 queues never passed --total-steps/--wall-s
to matrix_apg_merge, so every apg-merged attempt in logs/matrix prints "—"
for train steps in docs/scenario_matrix.md.  The numbers exist in the
committed per-phase run JSONs (logs/remus_crack/<tag>.json: iters, batch,
horizon, wall_s) — a phase-chain's provenance is the SUM over its phases
(simulated BPTT env-steps = iters*batch*horizon each).

The flagship apg-gru-phasesplit chain (g3cE) ran in round 3 and its phase
JSONs did not survive that machine; its provenance is the documented chain
(docs/performance.md "full winning recipe": 3k+8k+30k+30k = 71k iterations
at batch 128 x horizon 300 ~= 2.73B steps, ~3.5 h wall).

Idempotent: only fills attempts whose provenance is null.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CRACK = "logs/remus_crack"

# (env_id, recipe) -> provenance source
PHASE_CHAINS = {
    ("CapsuleDocking3d_remus-v0", "apg-gru-backport"):
        ["r4cap3A", "r4cap3B", "r4cap3C"],
    ("CapsuleCurrentDocking3d_remus-v0", "apg-gru-backport"):
        ["r4capc3A", "r4capc3B", "r4capc3C"],
    ("ObstaclesNoCapDocking3d_remus-v0", "apg-gru-backport"):
        ["r4nocapA", "r4nocapB", "r4nocapC"],
    ("ObstaclesDocking3d_remus-v0", "apg-gru-backport"):
        ["r4obsA", "r4obsB", "r4obsC"],
}
EXTRA = {
    ("ObstaclesNoCapDocking3d_remus-v0", "apg-gru-nocap5E"):
        {"total_steps": 652_800_000 + 15_000 * 128 * 300
         + 15_000 * 128 * 400,
         "wall_s": 1709.0 + 1000.0 + 3011.0,
         "provenance_note": "r4nocap chain + nocap4D + nocap5E restarts"},
    ("CapsuleDocking3d_remus-v0", "apg-gru-cap5E"):
        {"total_steps": 864_000_000 + 15_000 * 128 * 300
         + 15_000 * 128 * 400,
         "wall_s": 1291.0 + 1000.0 + 2178.0,
         "provenance_note": "r4cap3 chain + cap4D + cap5E restarts"},
    ("CapsuleCurrentDocking3d_remus-v0", "apg-gru-cap5E"):
        {"total_steps": 864_000_000 + 15_000 * 128 * 300
         + 15_000 * 128 * 400,
         "wall_s": 1291.0 + 1000.0 + 2178.0,
         "provenance_note": "r4cap3 chain + cap4D + cap5E restarts"},
}
# docs/performance.md: phases A(3k)+B(8k)+C(30k)+E(30k), batch 128,
# horizon 300, ~3.5 h wall on one chip including tunnel stalls.
FLAGSHIP = {"total_steps": 71_000 * 128 * 300, "wall_s": 12600.0,
            "provenance_note":
                "documented g3cE chain (docs/performance.md): 71k BPTT "
                "iters x batch 128 x horizon 300; wall ~3.5 h incl. "
                "tunnel stalls (round-3 phase JSONs lost with that "
                "machine)"}


def chain_provenance(tags):
    total, wall = 0, 0.0
    for t in tags:
        with open(f"{CRACK}/{t}.json") as f:
            d = json.load(f)
        total += int(d["iters"]) * int(d["batch"]) * int(d["horizon"])
        wall += float(d["wall_s"])
    return {"total_steps": total, "wall_s": wall,
            "provenance_note": "sum over phases " + "+".join(tags)}


def fill(entry, prov):
    changed = False
    if entry.get("total_steps") is None:
        entry["total_steps"] = prov["total_steps"]
        changed = True
    if entry.get("wall_s") is None:
        entry["wall_s"] = prov["wall_s"]
        changed = True
    if changed:
        entry["provenance_note"] = prov["provenance_note"]
    return changed


def main():
    from scripts.matrix_apg_merge import atomic_dump

    rows = {}
    for (env, recipe), tags in PHASE_CHAINS.items():
        rows.setdefault(env, {})[recipe] = chain_provenance(tags)
    for env in ("ObstaclesDocking3d_remus-v0",
                "ObstaclesCurrentDocking3d_remus-v0"):
        rows.setdefault(env, {})["apg-gru-phasesplit"] = FLAGSHIP
    for (env, recipe), prov in EXTRA.items():
        rows.setdefault(env, {})[recipe] = prov

    for env, by_recipe in sorted(rows.items()):
        path = f"logs/matrix/{env}.json"
        rec = json.load(open(path))
        changed = False
        for a in rec["attempts"]:
            prov = by_recipe.get(a.get("recipe"))
            if prov is not None:
                changed |= fill(a, prov)
        prov = by_recipe.get(rec["chosen"].get("recipe"))
        if prov is not None:
            changed |= fill(rec["chosen"], prov)
        if changed:
            atomic_dump(rec, path)
        print(f"[{env}] " + "; ".join(
            f"{r}: steps={p['total_steps']:,} wall={p['wall_s']:.0f}s"
            for r, p in by_recipe.items())
            + ("" if changed else "  (already filled)"))


if __name__ == "__main__":
    main()
