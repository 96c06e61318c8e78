"""Differentiable-simulation diagnostic for ObstaclesCurrentDocking3d_remus.

Every curriculum variant in scripts/remus_crack.py stalls on TERMINAL
PRECISION: model-free learners cap at det success ~0.1-0.5 at the true
0.5 m tolerance (the goal sits exactly ON the docking capsule's collision
shell).  Before inventing another shaping ladder, this script measures what
is PHYSICALLY achievable: the env is a pure differentiable JAX function and
each episode is deterministic given its scenario (current speed is pinned
at 0.5 m/s with a fixed random direction, docking3d.py:989-1000), so we can
Adam-optimize an open-loop action sequence per instance by backprop through
the exact dynamics (5x-Euler REMUS tick, remus100.py:493-518) and the exact
collision geometry.

If open-loop trajectory optimization docks ~all instances, the task is
controllable and the RL gap is a learning problem (-> analytic policy
gradients / distillation).  If it also caps out, the done-bar needs
rethinking.

Usage: python scripts/remus_trajopt.py [--batch 64] [--horizon 300]
                                       [--iters 400] [--seed 0]
Writes logs/remus_crack/trajopt.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gym_dockauv_tpu.envs.core import make_env
from gym_dockauv_tpu.ops import rays

ENV_ID = "ObstaclesCurrentDocking3d_remus-v0"
OUT = "logs/remus_crack"


def capsule_sdf(state, position):
    """Smooth signed distance from the vehicle sphere to the nearest
    obstacle collision shell (>0 = free).  Same geometry as the env's
    _collision predicate (core.py:280-288) minus the boolean."""
    d = rays.dist_segment_point(position[..., None, :], state.cap_a, state.cap_b)
    sdf = d - state.cap_r - 1.0  # safety_radius = 1 (auvsim.py:43)
    return jnp.min(jnp.where(state.cap_valid, sdf, jnp.inf), axis=-1)


def build(core, horizon, tol):
    # Parameterize fins over the EFFECTIVE +/-0.52 rad actuator-saturation
    # band, not the raw +/-10 rad bound: the in-dynamics clip
    # (remus100.py:462-470) has zero gradient outside the band, so
    # full-range tanh parameterization leaves the fins gradient-dead.
    # Optimized commands remain a strict subset of the true action space.
    low = jnp.asarray(core.action_low).copy()
    high = jnp.asarray(core.action_high).copy()
    low = low.at[0:2].set(jnp.maximum(low[0:2], -0.52))
    high = high.at[0:2].set(jnp.minimum(high[0:2], 0.52))

    def rollout(z, state0):
        """z: (H, 3) unconstrained params -> tanh -> action bounds."""
        u = low + (jnp.tanh(z) + 1.0) * 0.5 * (high - low)

        def body(state, a):
            state, res = core.step(state, a)
            sdf = capsule_sdf(state, res.info.position)
            return state, (res.info.delta_d, sdf, res.info.collision,
                           res.done)

        _, (d, sdf, col, done) = jax.lax.scan(body, state0, u)
        return d, sdf, col, done

    def loss_fn(z, state0):
        d, sdf, col, done = rollout(z, state0)
        # soft penetration accumulated up to each step: docking only
        # counts if the approach stayed collision-free until touch
        pen = jax.nn.softplus(-sdf / 0.25) * 0.25
        cum_pen = jnp.cumsum(pen)
        cost = d + 10.0 * cum_pen
        tau = 0.3
        soft_min = -tau * jax.nn.logsumexp(-cost / tau)
        # dense terms: approach everywhere + stay clear everywhere (the
        # softmin alone has near-zero gradient far from its argmin)
        approach = jnp.mean(d)
        clearance = jnp.mean(jax.nn.softplus(-(sdf - 0.1) / 0.25) * 0.25)
        # mild control-rate smoothness keeps fins off the rails
        rate = jnp.mean(jnp.square(jnp.diff(jnp.tanh(z), axis=0)))
        return soft_min + 0.05 * approach + 5.0 * clearance + 0.01 * rate

    def metrics(z, state0):
        d, sdf, col, done = rollout(z, state0)
        # dead strictly BEFORE step t (collision or drift-out terminal)
        dead = col | (d > core.config.max_dist_from_goal)
        dead_before = jnp.concatenate([jnp.zeros((1,), bool),
                                       jnp.cumsum(dead)[:-1] > 0])
        success = jnp.any((d < tol) & ~dead_before)
        collided = jnp.any(col & ~dead_before)
        return success, collided, jnp.min(jnp.where(dead_before, jnp.inf, d))

    return loss_fn, metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=300)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    core = make_env(ENV_ID)
    tol = core.config.dist_goal_reached_tol
    loss_fn, metrics = build(core, args.horizon, tol)

    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.batch)
    states0, _ = jax.vmap(core.reset)(keys, jnp.zeros((args.batch,), jnp.int32))

    # init: mid-rpm cruise, neutral fins
    z0 = jnp.zeros((args.batch, args.horizon, 3))
    z0 = z0.at[..., 2].set(0.5)

    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt_state = opt.init(z0)

    batched_loss = lambda z, s: jnp.sum(jax.vmap(loss_fn)(z, s))

    @jax.jit
    def step(z, opt_state, states0):
        loss, g = jax.value_and_grad(batched_loss)(z, states0)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(z, updates), opt_state, loss

    jit_metrics = jax.jit(jax.vmap(metrics))

    t0 = time.time()
    z = z0
    for i in range(args.iters):
        z, opt_state, loss = step(z, opt_state, states0)
        if i % 50 == 0 or i == args.iters - 1:
            suc, col, mind = jit_metrics(z, states0)
            print(f"[trajopt] iter {i}: loss={float(loss)/args.batch:.3f} "
                  f"success={float(jnp.mean(suc)):.3f} "
                  f"collision={float(jnp.mean(col)):.3f} "
                  f"median_min_d={float(jnp.median(mind)):.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    suc, col, mind = jit_metrics(z, states0)
    result = {
        "batch": args.batch, "horizon": args.horizon, "iters": args.iters,
        "seed": args.seed,
        "success": float(jnp.mean(suc)),
        "collision": float(jnp.mean(col)),
        "min_d_quartiles": [float(q) for q in
                            jnp.percentile(mind, jnp.array([25., 50., 75.]))],
        "wall_s": time.time() - t0,
    }
    os.makedirs(OUT, exist_ok=True)
    with open(f"{OUT}/trajopt.json", "w") as f:
        json.dump(result, f, indent=1)
    print(f"[trajopt] FINAL {result}", flush=True)


if __name__ == "__main__":
    main()
