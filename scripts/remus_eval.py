"""High-confidence deterministic evaluation of a REMUS crack policy.

The APG training script (scripts/remus_apg.py) tracks det success on a
FIXED 256-episode eval key every --eval-every iters; at n=256 the binomial
std is ~0.031, so readings near the 0.5 done-bar are inconclusive.  This
tool loads a saved policy pkl (stateless MLP or GRU — inferred from the
pytree structure) and evaluates it on N fresh episodes of the TRUE
ObstaclesCurrentDocking3d_remus-v0 config with done-latched episode
semantics (success only counts if no prior collision/timeout), reporting
a Wilson 95% interval.

Usage: python scripts/remus_eval.py <policy.pkl> [--episodes 2048] [--key 42]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gym_dockauv_tpu.envs.core import make_env
from gym_dockauv_tpu.ops.rays import dist_segment_point

DEFAULT_ENV = "ObstaclesCurrentDocking3d_remus-v0"


def mlp_apply(params, x):
    for w, b in params[:-1]:
        x = jnp.tanh(x @ w + b)
    w, b = params[-1]
    return x @ w + b


def build_policy(params, low, high):
    """Return (policy_step(obs, h) -> (action, h'), h0) for either pytree
    layout written by remus_apg.py: a GRU dict {wzr,bzr,wn,bn,head} or a
    plain MLP list of (w, b).  Policies trained with --prev-act have
    input dim 39 (obs + previous raw action); the extra 3 slots ride at
    the tail of the carry vector."""
    if isinstance(params, dict):
        H = params["bn"].shape[0]
        n_prev = params["wzr"].shape[0] - H - 36  # 0, or 3 (--prev-act)

        def step(obs, h_ext):
            h = h_ext[:H]
            x = (jnp.concatenate([obs, h_ext[H:]]) if n_prev else obs)
            xh = jnp.concatenate([x, h])
            zr = jax.nn.sigmoid(xh @ params["wzr"] + params["bzr"])
            z, r = zr[:H], zr[H:]
            n = jnp.tanh(jnp.concatenate([x, r * h]) @ params["wn"]
                         + params["bn"])
            h = (1.0 - z) * h + z * n
            pre = mlp_apply(params["head"], jnp.concatenate([h, x]))
            raw = jnp.tanh(pre)
            h_out = jnp.concatenate([h, raw]) if n_prev else h
            return low + (raw + 1.0) * 0.5 * (high - low), h_out
        return step, jnp.zeros((H + n_prev,))

    n_prev = params[0][0].shape[0] - 36

    def step(obs, h):
        x = jnp.concatenate([obs, h]) if n_prev else obs
        raw = jnp.tanh(mlp_apply(params, x))
        return low + (raw + 1.0) * 0.5 * (high - low), \
            (raw if n_prev else h)
    return step, jnp.zeros((n_prev,))


def wilson(p, n, z=1.96):
    den = 1 + z * z / n
    c = (p + z * z / (2 * n)) / den
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return c - half, c + half


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("policy")
    ap.add_argument("--env", default=DEFAULT_ENV,
                    help="any *_remus-v0 scenario (round 4: the APG "
                    "recipe back-ports across the matrix)")
    ap.add_argument("--episodes", type=int, default=2048)
    ap.add_argument("--key", type=int, default=42)
    ap.add_argument("--chunk", type=int, default=512,
                    help="episodes per device batch (memory bound)")
    ap.add_argument("--json-out", default=None,
                    help="also write the eval record to this path (e.g. "
                    "logs/remus_crack/FLAGSHIP.json, which "
                    "scenario_matrix.py report picks up for the flagship "
                    "row)")
    ap.add_argument("--diag", action="store_true",
                    help="also report the failure taxonomy: success split "
                    "by goal side (near = goal azimuth within 90 deg of "
                    "the spawn azimuth, far = the detour half), collision "
                    "shell attribution (center vs ring), and min "
                    "distance-to-goal ever reached on failed episodes")
    args = ap.parse_args()

    with open(args.policy, "rb") as f:
        params = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))

    core = make_env(args.env)
    # same effective-actuator fin band the APG policies were trained over
    # (the in-dynamics saturation clips at +/-0.52 rad, remus100.py:462-470)
    low = jnp.asarray(core.action_low).at[0:2].set(-0.52)
    high = jnp.asarray(core.action_high).at[0:2].set(0.52)
    pol, h0 = build_policy(params, low, high)

    @jax.jit
    def eval_chunk(key):
        keys = jax.random.split(key, args.chunk)
        states, obs = jax.vmap(core.reset)(
            keys, jnp.zeros((args.chunk,), jnp.int32))
        hs = jnp.zeros((args.chunk,) + h0.shape)
        goal_xy = states.goal[:, :2]
        spawn_xy = states.vehicle[:, :2]  # eta[0:2] = world xy
        # far side = goal azimuth more than 90 deg from the spawn azimuth
        # around the center capsule (the detour half; see
        # geodesic_distance's failure telemetry in remus_apg.py)
        far = jnp.sum(goal_xy * spawn_xy, axis=-1) < 0.0

        def body(carry, _):
            states, obs, hs, alive, goal, col, colr, mind = carry
            a, hs = jax.vmap(pol)(obs, hs)
            states, res = jax.vmap(core.step)(states, a)
            mind = jnp.minimum(mind, jnp.where(alive, res.info.delta_d,
                                               jnp.inf))
            just_col = res.info.collision & alive
            # attribute the collision to the nearest shell at death:
            # capsule 0 is the center (carries the goal), 1+ the ring
            d_caps = dist_segment_point(
                res.info.position[:, None, :], states.cap_a, states.cap_b)
            d_caps = jnp.where(states.cap_valid,
                               d_caps - states.cap_r, jnp.inf)
            # slot 0 is the center capsule except for NoCap scenarios,
            # where the ring occupies slots 0-3 (scenarios.py:126-145)
            ring_start = 0 if "NoCap" in args.env else 1
            ring_hit = jnp.argmin(d_caps, axis=-1) >= ring_start
            goal = goal | (res.info.goal_reached & alive)
            col = col | just_col
            colr = colr | (just_col & ring_hit)
            alive = alive & ~res.done
            return (states, res.obs, hs, alive, goal, col, colr, mind), None

        init = (states, obs, hs, jnp.ones((args.chunk,), bool),
                jnp.zeros((args.chunk,), bool),
                jnp.zeros((args.chunk,), bool),
                jnp.zeros((args.chunk,), bool),
                jnp.full((args.chunk,), jnp.inf))
        (_, _, _, _, goal, col, colr, mind), _ = jax.lax.scan(
            body, init, None, length=core.config.max_timesteps + 1)
        return goal, col, colr, far, mind

    n_chunks = (args.episodes + args.chunk - 1) // args.chunk
    n = n_chunks * args.chunk
    G, C, CR, F, MD = [], [], [], [], []
    key = jax.random.PRNGKey(args.key)
    for i in range(n_chunks):
        key, k = jax.random.split(key)
        cg, cc, ccr, cf, cmd = jax.tree_util.tree_map(np.asarray,
                                                      eval_chunk(k))
        G.append(cg), C.append(cc), CR.append(ccr), F.append(cf)
        MD.append(cmd)
        print(f"  chunk {i + 1}/{n_chunks}: running success "
              f"{np.concatenate(G).mean():.4f}", flush=True)
    goal = np.concatenate(G)
    col = np.concatenate(C)
    colr = np.concatenate(CR)
    far = np.concatenate(F)
    mind = np.concatenate(MD)
    p, pc = goal.mean(), col.mean()
    lo, hi = wilson(p, n)
    print(f"{args.policy}: {n} episodes  success={p:.4f} "
          f"[{lo:.4f}, {hi:.4f}]95  collision={pc:.4f} "
          f"timeout={1 - p - pc:.4f}")
    if args.json_out:
        import json
        with open(args.json_out, "w") as f:
            json.dump({"policy": args.policy, "episodes": n,
                       "success": float(p), "wilson95": [float(lo), float(hi)],
                       "collision": float(pc), "key": args.key,
                       "far_success": float(goal[far].mean()),
                       "near_success": float(goal[~far].mean())}, f,
                      indent=1)
    if args.diag:
        nf, nn = far.sum(), (~far).sum()
        fail = ~goal
        print(f"  far-side  ({nf:4d} eps): success {goal[far].mean():.4f}  "
              f"collision {col[far].mean():.4f}")
        print(f"  near-side ({nn:4d} eps): success {goal[~far].mean():.4f}  "
              f"collision {col[~far].mean():.4f}")
        if col.any():
            print(f"  collisions on RING {colr[col].mean():.3f} / "
                  f"CENTER {1 - colr[col].mean():.3f}")
        if fail.any():
            q = np.percentile(mind[fail], [10, 50, 90])
            print(f"  failed-episode min delta_d p10/p50/p90: "
                  f"{q[0]:.2f} / {q[1]:.2f} / {q[2]:.2f} "
                  f"(tol {core.config.dist_goal_reached_tol})")


if __name__ == "__main__":
    main()
