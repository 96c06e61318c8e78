"""Expert-distillation crack of ObstaclesCurrentRemus: per-instance
trajectory optimization -> behavior cloning -> (optional) APG fine-tune.

Why this pipeline: open-loop BPTT through the exact differentiable env
docks single instances at the TRUE 0.5 m tolerance (scripts/remus_trajopt.py:
min_d 0.04-0.2), while closed-loop policy training (APG, SAC, HER ladders)
plateaus at det success 0.4-0.5 — the feedback policies get stuck in
topology local minima (far-side goals need a commitment to going around the
center capsule one way or the other; a single smooth policy gradient cannot
split the decision).  Per-instance shooting CAN pick the topology via
multi-restart (left loop / right loop / straight), so:

  1) EXPERT: vmap'd Adam over raw action sequences, R restarts per
     instance, first-passage cost with the same survival/cummin/geodesic
     machinery as scripts/remus_apg.py; keep the restart that docks under
     strict episode semantics (done-latched, collision kills).
  2) BC: fit the policy MLP on (obs, action) pairs from the successful
     prefixes (up to the dock step).
  3) Fine-tune with scripts/remus_apg.py --init-params <bc.pkl>.

Stage 1/2 outputs land in logs/remus_crack/ as expert_*.npz / distill_*.pkl.
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
from scripts.remus_apg import (
    capsule_sdf, geodesic_distance, mlp_init, mlp_apply)

ENV_ID = "ObstaclesCurrentDocking3d_remus-v0"
OUT = "logs/remus_crack"


def build(core, horizon, pen_weight=20.0, tau=0.3, mean_d=0.05):
    low = jnp.asarray(core.action_low).at[0:2].set(-0.52)
    high = jnp.asarray(core.action_high).at[0:2].set(0.52)

    def act_of_raw(raw):
        return low + (jnp.tanh(raw) + 1.0) * 0.5 * (high - low)

    def sim(raw_seq, state0, obs0):
        """Roll an open-loop raw action sequence; returns per-step
        (true_d, geo_d, sdf0, sdfr, obs, action)."""
        def body(carry, raw):
            state, obs = carry
            a = act_of_raw(raw)
            state, res = core.step(state, a)
            sdf0, sdfr = capsule_sdf(state, res.info.position)
            gd = geodesic_distance(res.info.position, state.goal)
            return (state, res.obs), (res.info.delta_d, gd, sdf0, sdfr,
                                      obs, a)
        (_, _), outs = jax.lax.scan(body, (state0, obs0), raw_seq)
        return outs

    def cost_fn(raw_seq, state0, obs0):
        d, gd, sdf0, sdfr, _, _ = sim(raw_seq, state0, obs0)
        dead = (jax.nn.sigmoid(-jax.lax.cummin(sdf0) / 0.05)
                + jax.nn.sigmoid(-jax.lax.cummin(sdfr) / 0.15))
        dead = jnp.concatenate([jnp.zeros((1,), dead.dtype), dead[:-1]])
        cost = gd + pen_weight * dead
        soft_min = -tau * jax.nn.logsumexp(-cost / tau)
        return soft_min + mean_d * jnp.mean(gd)

    def strict_eval(raw_seq, state0, obs0):
        """Episode-semantics replay: success iff goal_reached fires while
        alive (collision latches the same step but kills from the next)."""
        def body(carry, raw):
            state, alive, goal, col = carry
            state, res = core.step(state, act_of_raw(raw))
            goal = goal | (res.info.goal_reached & alive)
            col = col | (res.info.collision & alive)
            alive = alive & ~res.done
            return (state, alive, goal, col), res.info.goal_reached & goal
        (_, _, goal, col), dock_flags = jax.lax.scan(
            body, (state0, jnp.asarray(True), jnp.asarray(False),
                   jnp.asarray(False)), raw_seq)
        # first step index where success had latched (horizon if never)
        t_dock = jnp.argmax(dock_flags)
        t_dock = jnp.where(goal, t_dock, raw_seq.shape[0] - 1)
        return goal, col, t_dock

    return act_of_raw, sim, cost_fn, strict_eval, (low, high)


def stage_expert(args):
    core = make_env(ENV_ID)
    act_of_raw, sim, cost_fn, strict_eval, (low, high) = build(
        core, args.horizon, mean_d=args.mean_d)

    guide = None
    if args.guide_policy:
        with open(args.guide_policy, "rb") as f:
            guide = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))

    def guide_raw_seq(state0, obs0):
        """Closed-loop rollout of the guide policy, recorded as the RAW
        (pre-tanh) open-loop sequence: policy-guided shooting init.  The
        best feedback policy already solves the global topology (which
        way around, which ring gap) on ~half the instances and nearly
        docks on more; per-instance Adam then only refines locally."""
        def body(carry, _):
            state, obs = carry
            pre = mlp_apply(guide, obs)
            a = low + (jnp.tanh(pre) + 1.0) * 0.5 * (high - low)
            state, res = core.step(state, a)
            return (state, res.obs), jnp.clip(pre, -3.0, 3.0)
        _, raw = jax.lax.scan(body, (state0, obs0), None,
                              length=args.horizon)
        return raw

    def optimize_one(key, state0, obs0):
        """R restarts of Adam over the raw sequence; returns the best
        docking restart (or the lowest-cost one if none docks)."""
        def init_restart(k, i):
            # topology-diverse inits: straight, left/right arcs, random
            base = jnp.zeros((args.horizon, 3))
            yaw_bias = jnp.where(
                i % 4 == 1, 0.3, jnp.where(i % 4 == 2, -0.3, 0.0))
            base = base.at[:, 1].set(yaw_bias)  # rudder channel bias
            noise = 0.1 * jax.random.normal(k, (args.horizon, 3))
            return base + jnp.where(i % 4 == 3, noise, noise * 0.1)

        keys = jax.random.split(key, args.restarts)
        raws = jax.vmap(init_restart)(keys, jnp.arange(args.restarts))
        if guide is not None:
            graw = guide_raw_seq(state0, obs0)
            if args.guide_only:
                # MODE-CONSISTENT experts: every restart is the guide's
                # own rollout with graded perturbation.  Mixing guide and
                # topology-diverse inits (d1) made the winning experts
                # jump between "left around" and "right around" on near-
                # identical states — a multimodal action distribution that
                # MSE behavior cloning averages into drive-at-the-capsule
                # (BC det success 0.27 vs expert 0.50).
                def mix(k, i, base):
                    pert = 0.04 * i * jax.random.normal(k, base.shape)
                    return graw + pert
            else:
                # half guide-seeded, half topology-diverse
                def mix(k, i, base):
                    pert = 0.05 * i * jax.random.normal(k, base.shape)
                    return jnp.where(i < args.restarts // 2,
                                     graw + pert, base)
            raws = jax.vmap(mix)(keys, jnp.arange(args.restarts), raws)

        opt = optax.adam(args.expert_lr)

        def run_restart(raw):
            opt_state = opt.init(raw)

            def step(carry, _):
                raw, opt_state = carry
                c, g = jax.value_and_grad(cost_fn)(raw, state0, obs0)
                g = jax.tree_util.tree_map(
                    lambda x: jnp.where(jnp.isfinite(x), x, 0.0), g)
                updates, opt_state = opt.update(g, opt_state)
                return (optax.apply_updates(raw, updates), opt_state), c
            (raw, _), _ = jax.lax.scan(
                step, (raw, opt_state), None, length=args.expert_iters)
            goal, col, t_dock = strict_eval(raw, state0, obs0)
            c_final = cost_fn(raw, state0, obs0)
            return raw, goal, c_final, t_dock

        raws, goals, costs, t_docks = jax.vmap(run_restart)(raws)
        # prefer docking restarts (rank: docked first, then cost)
        rank = jnp.where(goals, costs - 1e6, costs)
        b = jnp.argmin(rank)
        return raws[b], goals[b], t_docks[b]

    @jax.jit
    def expert_batch(key):
        k_env, k_opt = jax.random.split(key)
        keys = jax.random.split(k_env, args.expert_batch)
        states0, obs0 = jax.vmap(core.reset)(
            keys, jnp.zeros((args.expert_batch,), jnp.int32))
        okeys = jax.random.split(k_opt, args.expert_batch)
        raws, goals, t_docks = jax.vmap(optimize_one)(okeys, states0, obs0)
        # replay the winners to collect (obs, action) pairs
        _, _, _, _, obs_seq, act_seq = jax.vmap(
            lambda r, s, o: sim(r, s, o))(raws, states0, obs0)
        return obs_seq, act_seq, goals, t_docks

    all_obs, all_act, all_len = [], [], []
    n_total = n_docked = 0
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for b in range(args.expert_rounds):
        key, k = jax.random.split(key)
        obs_seq, act_seq, goals, t_docks = expert_batch(k)
        goals = np.asarray(goals)
        t_docks = np.asarray(t_docks)
        n_total += goals.size
        n_docked += int(goals.sum())
        for i in np.nonzero(goals)[0]:
            L = int(t_docks[i]) + 1
            all_obs.append(np.asarray(obs_seq[i][:L]))
            all_act.append(np.asarray(act_seq[i][:L]))
            all_len.append(L)
        print(f"[expert] round {b}: docked {int(goals.sum())}/{goals.size} "
              f"(cum {n_docked}/{n_total} = {n_docked/max(n_total,1):.2f}) "
              f"({time.time()-t0:.0f}s)", flush=True)

    obs = np.concatenate(all_obs) if all_obs else np.zeros((0, 36))
    act = np.concatenate(all_act) if all_act else np.zeros((0, 3))
    np.savez_compressed(
        f"{OUT}/expert_{args.tag}.npz", obs=obs, act=act,
        lens=np.asarray(all_len), n_total=n_total, n_docked=n_docked)
    print(f"[expert] saved {obs.shape[0]} pairs from {n_docked} docking "
          f"trajectories -> {OUT}/expert_{args.tag}.npz", flush=True)


def stage_pexpert(args):
    """Policy-space experts: per round, fine-tune a COPY of the guide
    policy on a FIXED batch of instances (per-instance-set overfit), then
    harvest its successful closed-loop rollouts as BC data.

    Why: raw action-sequence shooting produces open-loop choreography no
    feedback law reproduces (d1/d2: expert rate 0.50 but BC mse ~0.06 and
    det success ~0.28), and it barely beats its own guide per instance.
    Overfitting the POLICY to a small fixed instance set docked 8/8 in
    the original A/B diagnostic — the policy class acts as a smoothing
    prior, and its rollouts are realizable by definition.
    """
    core = make_env(ENV_ID)
    low = jnp.asarray(core.action_low).at[0:2].set(-0.52)
    high = jnp.asarray(core.action_high).at[0:2].set(0.52)
    with open(args.guide_policy, "rb") as f:
        guide = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))

    def policy_act(params, obs):
        pre = mlp_apply(params, jax.lax.stop_gradient(obs))
        return low + (jnp.tanh(pre) + 1.0) * 0.5 * (high - low), pre

    def instance_loss(params, state0, obs0):
        def body(carry, _):
            state, obs = carry
            a, pre = policy_act(params, obs)
            state, res = core.step(state, a)
            sdf0, sdfr = capsule_sdf(state, res.info.position)
            gd = geodesic_distance(res.info.position, state.goal)
            return (state, res.obs), (gd, sdf0, sdfr, jnp.mean(pre ** 2))
        _, (d, sdf0, sdfr, pre2) = jax.lax.scan(
            body, (state0, obs0), None, length=args.horizon)
        dead = (jax.nn.sigmoid(-jax.lax.cummin(sdf0) / 0.05)
                + jax.nn.sigmoid(-jax.lax.cummin(sdfr) / 0.15))
        dead = jnp.concatenate([jnp.zeros((1,), dead.dtype), dead[:-1]])
        cost = d + 20.0 * dead
        soft_min = -0.3 * jax.nn.logsumexp(-cost / 0.3)
        return soft_min + args.mean_d * jnp.mean(d) + 1e-3 * jnp.mean(pre2)

    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(args.pexpert_lr, b2=0.99))

    @jax.jit
    def reset_batch(key):
        keys = jax.random.split(key, args.expert_batch)
        return jax.vmap(core.reset)(
            keys, jnp.zeros((args.expert_batch,), jnp.int32))

    @jax.jit
    def finetune_chunk(params, opt_state, states0, obs0):
        def train_it(carry, _):
            params, opt_state = carry
            losses, grads = jax.vmap(
                lambda s0, o0: jax.value_and_grad(instance_loss)(
                    params, s0, o0))(states0, obs0)
            gnorm = jnp.sqrt(jax.tree_util.tree_reduce(
                jnp.add, jax.tree_util.tree_map(
                    lambda x: jnp.sum(
                        x ** 2, axis=tuple(range(1, x.ndim))), grads)))
            leaf_ok = jax.tree_util.tree_reduce(
                jnp.logical_and,
                jax.tree_util.tree_map(
                    lambda x: jnp.all(
                        jnp.isfinite(x),
                        axis=tuple(range(1, x.ndim))), grads))
            ok = jnp.isfinite(losses) & leaf_ok
            n = jnp.maximum(jnp.sum(ok), 1)
            scale = jnp.where(
                ok, jnp.minimum(1.0, 10.0 / (gnorm + 1e-8)), 0.0) / n
            g = jax.tree_util.tree_map(
                lambda x: jnp.tensordot(
                    scale, jnp.where(jnp.isfinite(x), x, 0.0), axes=1),
                grads)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(params, updates), opt_state), None

        (params, opt_state), _ = jax.lax.scan(
            train_it, (params, opt_state), None,
            length=args.pexpert_chunk)
        return params, opt_state

    @jax.jit
    def harvest(tuned, states0, obs0):
        # closed-loop rollout of the tuned policy, episode semantics,
        # record (obs, act) and the dock step
        def body(carry, _):
            state, obs, alive, goal, col = carry
            a, _ = jax.vmap(lambda o: policy_act(tuned, o))(obs)
            state, res = jax.vmap(core.step)(state, a)
            dock_now = res.info.goal_reached & alive
            goal = goal | dock_now
            col = col | (res.info.collision & alive)
            alive = alive & ~res.done
            return (state, res.obs, alive, goal, col), (obs, a, goal)

        B = args.expert_batch
        init = (states0, obs0, jnp.ones((B,), bool), jnp.zeros((B,), bool),
                jnp.zeros((B,), bool))
        (_, _, _, goal, col), (obs_seq, act_seq, goal_flags) = \
            jax.lax.scan(body, init, None, length=args.horizon)
        # first index where goal latched, per instance
        t_dock = jnp.argmax(goal_flags, axis=0)
        t_dock = jnp.where(goal, t_dock, args.horizon - 1)
        return obs_seq, act_seq, goal, t_dock

    all_obs, all_act, all_len = [], [], []
    n_total = n_docked = 0
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    n_chunks = max(1, args.pexpert_iters // args.pexpert_chunk)
    for b in range(args.expert_rounds):
        key, k = jax.random.split(key)
        states0, obs0 = reset_batch(k)
        B = args.expert_batch
        # per-instance FIRST successful trajectory across fine-tune
        # checkpoints: the fine-tune can collapse mid-run (A/B diag:
        # docks-all at iter ~150, then a BPTT spike freezes it), so
        # harvest after every chunk and keep the earliest dock
        done_i = np.zeros((B,), bool)
        kept = {}
        params, opt_state = guide, opt.init(guide)
        per_chunk = []
        for c in range(n_chunks):
            params, opt_state = finetune_chunk(
                params, opt_state, states0, obs0)
            obs_seq, act_seq, goals, t_docks = harvest(
                params, states0, obs0)
            goals = np.asarray(goals)
            per_chunk.append(int(goals.sum()))
            new = goals & ~done_i
            if new.any():
                obs_seq = np.asarray(obs_seq)
                act_seq = np.asarray(act_seq)
                t_docks = np.asarray(t_docks)
                for i in np.nonzero(new)[0]:
                    L = int(t_docks[i]) + 1
                    kept[i] = (obs_seq[:L, i], act_seq[:L, i], L)
                done_i |= goals
        for i, (o, a, L) in kept.items():
            all_obs.append(o)
            all_act.append(a)
            all_len.append(L)
        n_total += B
        n_docked += int(done_i.sum())
        print(f"[pexpert] round {b}: docked {int(done_i.sum())}/{B} "
              f"(per-chunk {per_chunk}) "
              f"(cum {n_docked}/{n_total} = {n_docked/max(n_total,1):.2f})"
              f" ({time.time()-t0:.0f}s)", flush=True)

    obs = np.concatenate(all_obs) if all_obs else np.zeros((0, 36))
    act = np.concatenate(all_act) if all_act else np.zeros((0, 3))
    np.savez_compressed(
        f"{OUT}/expert_{args.tag}.npz", obs=obs, act=act,
        lens=np.asarray(all_len), n_total=n_total, n_docked=n_docked)
    print(f"[pexpert] saved {obs.shape[0]} pairs from {n_docked} docking "
          f"trajectories -> {OUT}/expert_{args.tag}.npz", flush=True)


def stage_bc(args):
    core = make_env(ENV_ID)
    low = jnp.asarray(core.action_low).at[0:2].set(-0.52)
    high = jnp.asarray(core.action_high).at[0:2].set(0.52)
    data = np.load(f"{OUT}/expert_{args.tag}.npz")
    obs, act = jnp.asarray(data["obs"]), jnp.asarray(data["act"])
    print(f"[bc] {obs.shape[0]} pairs "
          f"({int(data['n_docked'])}/{int(data['n_total'])} experts docked)",
          flush=True)

    key = jax.random.PRNGKey(args.seed + 1)
    key, k_init = jax.random.split(key)
    params = mlp_init(k_init, (36, 256, 256, 3))

    # fit in NORMALIZED action space [-1, 1]: MSE between tanh(head) and
    # the expert's normalized action (both bounded; no atanh blowups)
    def norm_act(a):
        return (a - low) / (high - low) * 2.0 - 1.0

    target = norm_act(act)

    def loss_fn(params, o, t):
        pred = jnp.tanh(mlp_apply(params, o))
        return jnp.mean((pred - t) ** 2)

    opt = optax.adam(args.bc_lr)
    opt_state = opt.init(params)

    @jax.jit
    def bc_step(params, opt_state, key):
        idx = jax.random.randint(key, (args.bc_batch,), 0, obs.shape[0])
        l, g = jax.value_and_grad(loss_fn)(params, obs[idx], target[idx])
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    # det eval with episode semantics (same as remus_apg eval)
    def policy(params, o):
        raw = jnp.tanh(mlp_apply(params, o))
        return low + (raw + 1.0) * 0.5 * (high - low)

    @jax.jit
    def jit_eval(params, key, n=256):
        keys = jax.random.split(key, n)
        states, ob = jax.vmap(core.reset)(keys, jnp.zeros((n,), jnp.int32))

        def body(carry, _):
            st, ob, alive, goal, col = carry
            a = jax.vmap(lambda o: policy(params, o))(ob)
            st, res = jax.vmap(core.step)(st, a)
            goal = goal | (res.info.goal_reached & alive)
            col = col | (res.info.collision & alive)
            alive = alive & ~res.done
            return (st, res.obs, alive, goal, col), None
        init = (states, ob, jnp.ones((n,), bool), jnp.zeros((n,), bool),
                jnp.zeros((n,), bool))
        (_, _, _, goal, col), _ = jax.lax.scan(
            body, init, None, length=core.config.max_timesteps + 1)
        return jnp.mean(goal), jnp.mean(col)

    best = (-1.0, None)
    t0 = time.time()
    for i in range(args.bc_iters):
        key, k = jax.random.split(key)
        params, opt_state, l = bc_step(params, opt_state, k)
        if i % 2000 == 0 or i == args.bc_iters - 1:
            suc, col = jit_eval(params, jax.random.PRNGKey(7777))
            suc, col = float(suc), float(col)
            if suc > best[0]:
                best = (suc, jax.tree_util.tree_map(np.asarray, params))
                with open(f"{OUT}/distill_{args.tag}.pkl", "wb") as f:
                    pickle.dump(best[1], f)
            print(f"[bc] iter {i}: mse={float(l):.4f} det_success={suc:.3f} "
                  f"det_collision={col:.3f} ({time.time()-t0:.0f}s)",
                  flush=True)
    print(f"[bc] best det_success={best[0]:.3f} -> "
          f"{OUT}/distill_{args.tag}.pkl", flush=True)
    with open(f"{OUT}/distill_{args.tag}.json", "w") as f:
        json.dump({"best_success": best[0],
                   "pairs": int(obs.shape[0])}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=("expert", "pexpert", "bc", "all",
                                      "pall"))
    ap.add_argument("--tag", default="d0")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--horizon", type=int, default=500)
    ap.add_argument("--mean-d", type=float, default=0.05)
    ap.add_argument("--restarts", type=int, default=4)
    ap.add_argument("--expert-iters", type=int, default=300)
    ap.add_argument("--expert-lr", type=float, default=0.05)
    ap.add_argument("--guide-policy", default=None,
                    help="policy pkl whose closed-loop rollout seeds half "
                    "the shooting restarts (policy-guided refinement)")
    ap.add_argument("--guide-only", action="store_true",
                    help="seed ALL restarts from the guide rollout "
                    "(mode-consistent experts for behavior cloning)")
    ap.add_argument("--pexpert-iters", type=int, default=300,
                    help="APG fine-tune iterations per fixed instance set")
    ap.add_argument("--pexpert-chunk", type=int, default=50,
                    help="harvest every this many fine-tune iterations")
    ap.add_argument("--pexpert-lr", type=float, default=1e-3)
    ap.add_argument("--expert-batch", type=int, default=64)
    ap.add_argument("--expert-rounds", type=int, default=8)
    ap.add_argument("--bc-iters", type=int, default=40000)
    ap.add_argument("--bc-batch", type=int, default=1024)
    ap.add_argument("--bc-lr", type=float, default=3e-4)
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    if args.stage in ("expert", "all"):
        stage_expert(args)
    if args.stage in ("pexpert", "pall"):
        stage_pexpert(args)
    if args.stage in ("bc", "all", "pall"):
        stage_bc(args)


if __name__ == "__main__":
    main()
