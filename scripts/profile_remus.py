"""Attribute the REMUS-vs-BlueROV2 bench gap (VERDICT r3 item 9).

BENCH_r03 measures 15.9M env-steps/s on the BlueROV2 path
(ObstaclesDocking3d) vs 12.1M on the REMUS path (ObstaclesCurrentRemus,
bench_remus.json) — a 24% gap with no profile on record.  This script
times the pipeline COMPONENTS in isolation on the real chip, bench-style
(vmapped batch, lax.scan chunk, steps/s):

  full-<env>    the complete bench rollout (actor + env step)
  dyn-remus     5x Euler substep remus_vehicle_step alone
  dyn-bluerov   RK45 fossen_vehicle_step alone
  world-only    radar rays + collision + obs + reward via a step with a
                frozen trivial dynamics (isolates the non-dynamics share)

Writes the numbers to stdout; fold the attribution into
docs/performance.md.

Usage: python scripts/profile_remus.py [--n-envs 8192] [--chunk 128]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", REPO + "/.jax_cache")

from gym_dockauv_tpu.dynamics import remus as remus_dyn
from gym_dockauv_tpu.dynamics.statespace import fossen_vehicle_step
from gym_dockauv_tpu.dynamics.vehicles import make_vehicle
from gym_dockauv_tpu.envs.core import make_env
from gym_dockauv_tpu.rl.distributions import squashed_sample_and_log_prob
from gym_dockauv_tpu.rl.networks import SACActor


def timeit(fn, *args, warmup=2, iters=8):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def bench_env(env_id, n_envs, chunk):
    core = make_env(env_id)
    actor = SACActor(core.n_actions)
    key = jax.random.PRNGKey(0)
    params = actor.init(key, jnp.zeros((1, core.n_observations)))
    states, obs = jax.jit(jax.vmap(core.reset))(
        jax.random.split(key, n_envs), jnp.zeros((n_envs,), jnp.int32))
    low = jnp.asarray(core.action_low, jnp.float32)
    high = jnp.asarray(core.action_high, jnp.float32)
    step_env = jax.vmap(core.step_autoreset)

    @jax.jit
    def chunk_fn(params, states, obs, key):
        def body(carry, _):
            states, obs, key = carry
            key, k = jax.random.split(key)
            mean, log_std = actor.apply(params, obs)
            a, _ = squashed_sample_and_log_prob(k, mean, log_std)
            action = low + 0.5 * (a + 1.0) * (high - low)
            states, res = step_env(states, action)
            return (states, res.obs, key), res.reward
        (states, obs, key), rew = jax.lax.scan(
            body, (states, obs, key), None, length=chunk)
        return rew.sum()

    dt = timeit(chunk_fn, params, states, obs, key)
    return n_envs * chunk / dt


def bench_dyn_remus(n_envs, chunk):
    p = remus_dyn.build_remus_params()
    key = jax.random.PRNGKey(1)
    state = jax.random.uniform(key, (n_envs, 12), jnp.float32, -0.3, 0.3)
    ua = jnp.zeros((n_envs, 3))
    uc = jnp.tile(jnp.asarray([0.2, -0.1, 900.0]), (n_envs, 1))
    nu_c = jnp.zeros((n_envs, 6))
    step = jax.vmap(lambda s, a: remus_dyn.remus_vehicle_step(p, s, a, uc[0], nu_c[0]))

    @jax.jit
    def chunk_fn(state, ua):
        def body(carry, _):
            state, ua = carry
            state, ua, _ = step(state, ua)
            return (state, ua), ()
        (state, ua), _ = jax.lax.scan(body, (state, ua), None, length=chunk)
        return state
    dt = timeit(chunk_fn, state, ua)
    return n_envs * chunk / dt


def bench_dyn_bluerov(n_envs, chunk):
    params = make_vehicle("BlueROV2")
    key = jax.random.PRNGKey(2)
    state = jax.random.uniform(key, (n_envs, 12), jnp.float32, -0.3, 0.3)
    u = jnp.zeros((n_envs, 6))
    a = jnp.tile(jnp.asarray([0.3, -0.2, 0.1, 0.0, 0.2, -0.1]), (n_envs, 1))
    nu_c = jnp.zeros(6)
    step = jax.vmap(lambda s, up, ac: fossen_vehicle_step(
        params, s, up, ac, nu_c, 0.1))

    @jax.jit
    def chunk_fn(state, u):
        def body(carry, _):
            state, u = carry
            state, u, _ = step(state, u, a)
            return (state, u), ()
        (state, u), _ = jax.lax.scan(body, (state, u), None, length=chunk)
        return state
    dt = timeit(chunk_fn, state, u)
    return n_envs * chunk / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-envs", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()
    E, C = args.n_envs, args.chunk

    rows = []
    for name, fn in (
        ("full-bluerov(Obstacles)", lambda: bench_env(
            "ObstaclesDocking3d-v0", E, C)),
        ("full-remus(ObstCur)", lambda: bench_env(
            "ObstaclesCurrentDocking3d_remus-v0", E, C)),
        ("dyn-bluerov(RK45)", lambda: bench_dyn_bluerov(E, C)),
        ("dyn-remus(5xEuler)", lambda: bench_dyn_remus(E, C)),
    ):
        sps = fn()
        rows.append((name, sps))
        print(f"{name:26s} {sps / 1e6:8.2f} M steps/s  "
              f"({1e9 * E / sps / E:6.3f} ns/env-step... "
              f"{1e9 / (sps / E):0.1f} ns/step/env)", flush=True)

    d = dict(rows)
    fb, fr = d["full-bluerov(Obstacles)"], d["full-remus(ObstCur)"]
    db, dr = d["dyn-bluerov(RK45)"], d["dyn-remus(5xEuler)"]
    # per-env-step time attribution (seconds per aggregate env-step)
    tb, tr = 1 / fb, 1 / fr
    tdb, tdr = 1 / db, 1 / dr
    print(f"\nfull-path gap: remus is {fb / fr:.2f}x slower "
          f"({(tr - tb) * 1e12:.1f} ps/env-step extra)")
    print(f"dynamics-only gap: {db / dr:.2f}x "
          f"({(tdr - tdb) * 1e12:.1f} ps/env-step extra)")
    share = (tdr - tdb) / (tr - tb) if tr > tb else float("nan")
    print(f"dynamics accounts for {share * 100:.0f}% of the full-path gap")


if __name__ == "__main__":
    main()
