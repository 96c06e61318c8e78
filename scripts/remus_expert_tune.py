"""Vmapped grid search over ExpertGains for the scripted REMUS pilot.

Evaluates G gain combinations x E episodes in ONE jitted program (vmap over
gains outer, episodes inner) on the TRUE ObstaclesCurrentDocking3d_remus
config, and prints the leaderboard.  Hand-tuning one combo at a time costs
minutes per try; this costs one compile + one sweep.

Usage: python scripts/remus_expert_tune.py [episodes_per_combo]
"""
from __future__ import annotations

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gym_dockauv_tpu.envs.core import make_env
from scripts.remus_expert import ExpertGains, expert_action


def make_grid():
    """A curated sweep (full cross product would be thousands).

    Inner-loop PD gains are FIXED at the stabilized values (see ExpertGains
    docstring); the sweep covers the outer guidance parameters, which all
    interact with the 0.5-1 m/s grid current and the 2.6 m turn radius."""
    combos = []
    for rpm_c, wp_r, margin, crawl_rmin, (r_orb, lead) in itertools.product(
            [900.0, 1300.0],                 # cruise rpm
            [4.5, 6.0],                      # crossing waypoint radius
            [2.4, 2.9],                      # avoid margin
            [0.0, 6.5, 99.0],                # crawl: always / outside / never
            [(3.9, 0.55), (3.9, 0.9), (4.5, 0.7)]):  # orbit radius x lead
        combos.append(ExpertGains(
            rpm_cruise=rpm_c, wp_cross_r=wp_r, r_orbit=r_orb,
            avoid_margin=margin, crawl_rmin=crawl_rmin, orbit_lead=lead))
    return combos


def stack_gains(combos):
    return ExpertGains(*[jnp.asarray([getattr(c, f) for c in combos])
                         for f in ExpertGains._fields])


def sweep(core, gains_stack, n_combos, n_episodes=64, seed=11):
    max_t = core.config.max_timesteps + 1

    def run_one(g, key):
        keys = jax.random.split(key, n_episodes)
        states, obs = jax.vmap(core.reset)(
            keys, jnp.zeros((n_episodes,), jnp.int32))
        step_env = jax.vmap(core.step)
        act = jax.vmap(lambda s: expert_action(s, g))

        def body(carry, _):
            s, alive, goal, col = carry
            s2, res = step_env(s, act(s))
            goal = goal | (res.info.goal_reached & alive)
            col = col | (res.info.collision & alive)
            return (s2, alive & ~res.done, goal, col), None

        init = (states, jnp.ones((n_episodes,), bool),
                jnp.zeros((n_episodes,), bool),
                jnp.zeros((n_episodes,), bool))
        (_, _, goal, col), _ = jax.lax.scan(body, init, None, length=max_t)
        return jnp.mean(goal), jnp.mean(col)

    keys = jax.random.split(jax.random.PRNGKey(seed), n_combos)
    return jax.jit(jax.vmap(run_one))(gains_stack, keys)


def main():
    n_eps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    combos = make_grid()
    print(f"{len(combos)} combos x {n_eps} episodes", flush=True)
    core = make_env("ObstaclesCurrentDocking3d_remus-v0")
    suc, col = sweep(core, stack_gains(combos), len(combos), n_eps)
    suc, col = np.asarray(suc), np.asarray(col)
    order = np.argsort(-suc)
    for i in order[:12]:
        c = combos[i]
        print(f"success={suc[i]:.3f} collision={col[i]:.3f}  "
              f"kp={c.kp_psi} kd={c.kd_psi} rpm={c.rpm_cruise:.0f} "
              f"wp_r={c.wp_cross_r} margin={c.avoid_margin} "
              f"crawl_rmin={c.crawl_rmin} lead={c.orbit_lead}", flush=True)
    print(f"best {suc.max():.3f}, median {np.median(suc):.3f}")


if __name__ == "__main__":
    main()
