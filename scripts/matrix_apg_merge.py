"""Merge an APG-policy eval into a scenario-matrix row JSON.

Round 4 back-ports the flagship differentiable-sim recipe
(scripts/remus_apg.py, the machinery that cracked
ObstaclesCurrentDocking3d_remus at 0.515) across the weak REMUS matrix
rows.  The APG policies are pytree pkls, not rl/ models, so
scenario_matrix.run_extra cannot evaluate them — this tool runs the same
TRUE-config eval (deterministic policy, done-latched semantics, 1024
fresh episodes, Wilson 95%) on a policy pkl and appends the result as an
attempt to logs/matrix/<env_id>.json, updating "chosen" if it wins.

Usage:
  python scripts/matrix_apg_merge.py <env_id> <policy.pkl> [--recipe NAME]
                                     [--episodes 1024] [--wall-s S]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gym_dockauv_tpu.envs.core import make_env
from scripts.remus_eval import build_policy, wilson

OUT = "logs/matrix"


def atomic_dump(obj, path):
    """ADVICE r3: never leave a truncated row JSON for the queue script
    to commit — write to a temp file and os.replace()."""
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def true_eval_policy(env_id, policy_path, episodes=1024, seed=1234,
                     chunk=256):
    with open(policy_path, "rb") as f:
        params = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
    core = make_env(env_id)
    # the APG policies act over the effective +/-0.52 rad fin band
    # (in-dynamics saturation, remus100.py:462-470)
    low = jnp.asarray(core.action_low).at[0:2].set(-0.52)
    high = jnp.asarray(core.action_high).at[0:2].set(0.52)
    pol, h0 = build_policy(params, low, high)

    @jax.jit
    def eval_chunk(key):
        keys = jax.random.split(key, chunk)
        states, obs = jax.vmap(core.reset)(
            keys, jnp.zeros((chunk,), jnp.int32))
        hs = jnp.zeros((chunk,) + h0.shape)

        def body(carry, _):
            states, obs, hs, alive, goal, col = carry
            a, hs = jax.vmap(pol)(obs, hs)
            states, res = jax.vmap(core.step)(states, a)
            goal = goal | (res.info.goal_reached & alive)
            col = col | (res.info.collision & alive)
            alive = alive & ~res.done
            return (states, res.obs, hs, alive, goal, col), None

        init = (states, obs, hs, jnp.ones((chunk,), bool),
                jnp.zeros((chunk,), bool), jnp.zeros((chunk,), bool))
        (_, _, _, _, goal, col), _ = jax.lax.scan(
            body, init, None, length=core.config.max_timesteps + 1)
        return goal, col

    n_chunks = (episodes + chunk - 1) // chunk
    n = n_chunks * chunk
    G, C = [], []
    key = jax.random.PRNGKey(seed)
    for _ in range(n_chunks):
        key, k = jax.random.split(key)
        g, c = jax.tree_util.tree_map(np.asarray, eval_chunk(k))
        G.append(g), C.append(c)
    goal, col = np.concatenate(G), np.concatenate(C)
    p = float(goal.mean())
    lo, hi = wilson(p, n)
    return {"success": p, "wilson95": [float(lo), float(hi)],
            "collision": float(col.mean()), "episodes": n}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id")
    ap.add_argument("policy")
    ap.add_argument("--recipe", default="apg-gru")
    ap.add_argument("--episodes", type=int, default=1024)
    ap.add_argument("--wall-s", type=float, default=None,
                    help="training wall-clock to record (from the apg "
                    "run's json)")
    ap.add_argument("--total-steps", type=int, default=None,
                    help="simulated env-steps of BPTT training to record")
    args = ap.parse_args()

    ev = true_eval_policy(args.env_id, args.policy, args.episodes)
    print(f"[{args.env_id}] {args.recipe} TRUE EVAL: {ev}", flush=True)

    path = f"{OUT}/{args.env_id}.json"
    rec0 = (json.load(open(path)) if os.path.exists(path)
            else {"env_id": args.env_id, "seed": 0, "chosen": None,
                  "attempts": []})
    rec = {"attempt": len(rec0["attempts"]), "recipe": args.recipe,
           "algo": "apg", "policy": args.policy,
           "stages": [], "total_steps": args.total_steps,
           "wall_s": args.wall_s, "true_eval": ev}
    rec0["attempts"].append(rec)
    if (rec0["chosen"] is None
            or ev["success"] > rec0["chosen"]["true_eval"]["success"]):
        rec0["chosen"] = rec
    atomic_dump(rec0, path)
    print(f"[{args.env_id}] merged; chosen = {rec0['chosen']['recipe']} "
          f"{rec0['chosen']['true_eval']['success']:.3f}", flush=True)


if __name__ == "__main__":
    main()
