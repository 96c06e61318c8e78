"""Closed-loop analytic-policy-gradient (APG) crack of ObstaclesCurrentRemus.

scripts/remus_trajopt.py showed that backprop through the exact env docks
single instances at the TRUE 0.5 m tolerance (min_d 0.04-0.2) but per-
instance open-loop shooting hits local minima on spawns that need a
turn-around.  Here a single feedback policy pi(obs) -> action is trained by
BPTT through full rollouts across a fresh batch of scenario instances per
iteration — the shared policy generalizes the turn/approach law across
instances, which is exactly what model-free SAC/PPO failed to learn at this
precision (caps det ~0.1-0.5; see remus_crack.py post-mortems).

Gradient hygiene (what made it work):
- fins are parameterized over the effective +/-0.52 rad actuator band: the
  in-dynamics saturation clip (remus100.py:462-470) is gradient-dead
  outside it (trajopt run 1: zero progress at full +/-10 rad range).
- gradients are stopped on the radar block obs[16:36]: ray-intersection
  geometry is piecewise-smooth at best; the policy still SEES the radar,
  while collision avoidance learns through a smooth capsule-SDF penalty.
- dense shaping (mean distance + mean clearance hinge) on top of the
  soft-first-passage objective: softmin alone has near-zero gradient far
  from its argmin.

Usage: python scripts/remus_apg.py [--iters 3000] [--batch 128] ...
Writes logs/remus_crack/apg.json (+ eval history) and the policy params.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
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
    d = rays.dist_segment_point(position[..., None, :], state.cap_a, state.cap_b)
    sdf = d - state.cap_r - 1.0
    return jnp.min(jnp.where(state.cap_valid, sdf, jnp.inf), axis=-1)


def mlp_init(key, sizes):
    params = []
    for i, (m, n) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, k = jax.random.split(key)
        scale = jnp.sqrt(2.0 / m)
        if i == len(sizes) - 2:
            scale = 0.01  # small head: start near mid-range actions
        params.append((jax.random.normal(k, (m, n)) * scale, jnp.zeros(n)))
    return params


def mlp_apply(params, x):
    for w, b in params[:-1]:
        x = jnp.tanh(x @ w + b)
    w, b = params[-1]
    return x @ w + b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--horizon", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--obs-grad", default="none",
                    choices=("none", "head", "full"),
                    help="which obs block gradients flow through; 'none' "
                    "(detached-state pathwise gradients) is NaN-free at "
                    "every horizon, 'head' (goal-relative dims 0:16) NaNs "
                    "past ~150 steps via a _nav_errors singularity")
    ap.add_argument("--pen-weight", type=float, default=0.0,
                    help="capsule penetration penalty weight; 0 = pure "
                    "approach (phase A), >0 for the collision fine-tune "
                    "(phase B, warm-started via --init-params)")
    ap.add_argument("--act-reg", type=float, default=1e-3,
                    help="L2 penalty on the pre-tanh head output: without "
                    "it the head drifts to |pre|~13 (100%% saturated, "
                    "tanh' = 0) and learning freezes permanently "
                    "(measured, apg run 1)")
    ap.add_argument("--init-params", default=None,
                    help="warm-start policy pkl (phase B)")
    ap.add_argument("--tag", default="apg",
                    help="output filename stem under logs/remus_crack/")
    args = ap.parse_args()

    core = make_env(ENV_ID)
    tol = float(core.config.dist_goal_reached_tol)
    low = jnp.asarray(core.action_low).at[0:2].set(-0.52)
    high = jnp.asarray(core.action_high).at[0:2].set(0.52)

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    params = mlp_init(k_init, (36, 256, 256, 3))
    if args.init_params:
        with open(args.init_params, "rb") as f:
            params = jax.tree_util.tree_map(
                jnp.asarray, pickle.load(f))

    def policy_pre(params, obs):
        if args.obs_grad == "none":
            obs = jax.lax.stop_gradient(obs)
        elif args.obs_grad == "head":
            obs = obs.at[16:].set(jax.lax.stop_gradient(obs[16:]))
        return mlp_apply(params, obs)

    def policy(params, obs):
        raw = jnp.tanh(policy_pre(params, obs))
        return low + (raw + 1.0) * 0.5 * (high - low)

    def rollout(params, state0, obs0):
        def body(carry, _):
            state, obs = carry
            pre = policy_pre(params, obs)
            raw = jnp.tanh(pre)
            a = low + (raw + 1.0) * 0.5 * (high - low)
            state, res = core.step(state, a)
            sdf = capsule_sdf(state, res.info.position)
            return (state, res.obs), (res.info.delta_d, sdf,
                                      jnp.mean(pre ** 2))
        _, (d, sdf, pre2) = jax.lax.scan(
            body, (state0, obs0), None, length=args.horizon)
        return d, sdf, pre2

    def instance_loss(params, state0, obs0):
        d, sdf, pre2 = rollout(params, state0, obs0)
        # pure penetration hinge (5 cm margin, 10 cm smoothing): the task
        # terminal is ON the central capsule's collision shell, so any
        # wider clearance margin actively repels the dock approach (the
        # first loss rev used margin 0.1/weight 5.0 and never approached)
        pen = jax.nn.softplus(-(sdf - 0.05) / 0.1) * 0.1
        cum_pen = jnp.cumsum(pen)
        cost = d + args.pen_weight * cum_pen
        tau = 0.3
        soft_min = -tau * jax.nn.logsumexp(-cost / tau)
        return (soft_min + 0.3 * jnp.mean(d)
                + 0.2 * args.pen_weight * jnp.mean(pen)
                + args.act_reg * jnp.mean(pre2))

    def batch_loss(params, keys):
        states0, obs0 = jax.vmap(core.reset)(
            keys, jnp.zeros((keys.shape[0],), jnp.int32))
        losses = jax.vmap(instance_loss, in_axes=(None, 0, 0))(
            params, states0, obs0)
        # one unlucky instance (grad-singular geometry event) must not
        # poison the batch: mask non-finite losses out of the mean
        ok = jnp.isfinite(losses)
        return jnp.sum(jnp.where(ok, losses, 0.0)) / jnp.maximum(
            jnp.sum(ok), 1)

    sched = optax.cosine_decay_schedule(args.lr, args.iters, alpha=0.1)
    # b2=0.99: a single BPTT gradient spike at b2=0.999 poisons Adam's
    # second moment for thousands of iterations (measured: policy docks
    # all instances at iter ~150, then one spike freezes learning for the
    # rest of the run); clip to 1.0 BEFORE adam for the same reason
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(learning_rate=sched, b2=0.99))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        keys = jax.random.split(key, args.batch)
        loss, g = jax.value_and_grad(batch_loss)(params, keys)
        # BPTT through 300 dynamics steps occasionally spikes to inf
        # (measured gnorm up to 1e5); clip_by_global_norm of an inf norm
        # is 0*inf = NaN params, so zero non-finite leaves first
        g = jax.tree_util.tree_map(
            lambda x: jnp.where(jnp.isfinite(x), x, 0.0), g)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # --- det eval with true episode semantics (done-latched) -------------
    def eval_rollout(params, key, n_episodes=256):
        keys = jax.random.split(key, n_episodes)
        states, obs = jax.vmap(core.reset)(
            keys, jnp.zeros((n_episodes,), jnp.int32))
        step_env = jax.vmap(core.step)

        def body(carry, _):
            states, obs, alive, goal, col = carry
            a = jax.vmap(lambda o: policy(params, o))(obs)
            states, res = step_env(states, a)
            goal = goal | (res.info.goal_reached & alive)
            col = col | (res.info.collision & alive)
            alive = alive & ~res.done
            return (states, res.obs, alive, goal, col), None

        init = (states, obs, jnp.ones((n_episodes,), bool),
                jnp.zeros((n_episodes,), bool), jnp.zeros((n_episodes,), bool))
        (_, _, _, goal, col), _ = jax.lax.scan(
            body, init, None, length=core.config.max_timesteps + 1)
        return jnp.mean(goal), jnp.mean(col)

    jit_eval = jax.jit(eval_rollout, static_argnames=())

    @jax.jit
    def head_saturation(params, key):
        keys = jax.random.split(key, 32)
        states, obs = jax.vmap(core.reset)(
            keys, jnp.zeros((32,), jnp.int32))

        def body(carry, _):
            st, ob = carry
            pre = jax.vmap(lambda o: policy_pre(params, o))(ob)
            a = low + (jnp.tanh(pre) + 1.0) * 0.5 * (high - low)
            st, res = jax.vmap(core.step)(st, a)
            return (st, res.obs), jnp.mean(jnp.abs(pre) > 3.0)
        _, sat = jax.lax.scan(body, (states, obs), None, length=100)
        return jnp.mean(sat)

    t0 = time.time()
    history = []
    best = (-1.0, None)
    for i in range(args.iters):
        key, k = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, k)
        if i % args.eval_every == 0 or i == args.iters - 1:
            suc, col = jit_eval(params, jax.random.PRNGKey(7777))
            sat = float(head_saturation(params, jax.random.PRNGKey(3)))
            suc, col = float(suc), float(col)
            history.append({"iter": i, "loss": float(loss),
                            "det_success": suc, "det_collision": col,
                            "saturation": sat,
                            "wall_s": time.time() - t0})
            if suc > best[0]:
                best = (suc, jax.tree_util.tree_map(np.asarray, params))
            print(f"[{args.tag}] iter {i}: loss={float(loss):.3f} "
                  f"det_success={suc:.3f} det_collision={col:.3f} "
                  f"sat={sat:.2f} ({time.time()-t0:.0f}s)", flush=True)

    os.makedirs(OUT, exist_ok=True)
    suc, col = jit_eval(params, jax.random.PRNGKey(1234))
    final = {"variant": args.tag, "iters": args.iters, "batch": args.batch,
             "horizon": args.horizon, "lr": args.lr, "seed": args.seed,
             "obs_grad": args.obs_grad, "pen_weight": args.pen_weight,
             "act_reg": args.act_reg, "init_params": args.init_params,
             "final_success": float(suc), "final_collision": float(col),
             "best_success": best[0], "history": history,
             "wall_s": time.time() - t0}
    with open(f"{OUT}/{args.tag}.json", "w") as f:
        json.dump(final, f, indent=1)
    save = best[1] if best[0] > float(suc) else \
        jax.tree_util.tree_map(np.asarray, params)
    with open(f"{OUT}/{args.tag}_policy.pkl", "wb") as f:
        pickle.dump(save, f)
    print(f"[{args.tag}] FINAL success={float(suc):.3f} "
          f"collision={float(col):.3f} "
          f"best={best[0]:.3f} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
