"""Scripted full-state expert pilot for ObstaclesCurrentDocking3d_remus-v0.

A geometry-aware guidance law (not learned): cross the obstacle ring at the
gap nearest the vehicle, orbit inside the ring at a safe radius until
aligned with the goal azimuth, then make a straight radial terminal
approach onto the goal point (which sits 2 m off the docking-capsule axis,
exactly on the vehicle's collision boundary — so the flyby crosses the
0.5 m success shell one step before the collision shell).

Heading is steered by a PD rudder law on line-of-sight bearing, depth by a
PD stern-plane law on a depth-proportional pitch command, rpm fixed.  All
pure JAX on EnvState, vmap/jit-friendly: used to (a) measure how far
scripted guidance alone gets on the TRUE env config, and (b) generate
(obs, action) pairs for behavior-cloning warm starts (scripts/remus_bc.py).

Usage:
  python scripts/remus_expert.py probe   # open-loop fin sign/derivative probe
  python scripts/remus_expert.py eval [n_episodes] [--stochastic]
"""
from __future__ import annotations

import json
import os
import sys
from typing import NamedTuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gym_dockauv_tpu.ops.geom import ssa


class ExpertGains(NamedTuple):
    # PD gains live INSIDE the actuator's linear range: commands are clipped
    # to +/-0.5 rad (the reference saturates fins at 30 deg = 0.52 rad,
    # remus100.py:129-134) — the original gains (kp_theta=6, kd_theta=3,
    # unclipped) commanded +/-4 rad, i.e. bang-bang through the 1 s actuator
    # lag, and the pitch loop limit-cycled at +/-12 deg (55 deg pk-pk).
    # CPU sweep: kp=0.8/kd=1.6 settles a 2 m depth step in 4.3 s with 0.5 deg
    # residual oscillation; heading kp=2/kd=2 settles a 46 deg step in 3 s.
    kp_psi: float = 2.0      # rudder P on heading error (rad->rad)
    kd_psi: float = 2.0      # rudder D on yaw rate
    k_z: float = 0.35        # depth error (m) -> pitch command (rad)
    theta_max: float = 0.5   # pitch command clamp (rad)
    kp_theta: float = 0.8    # stern P on pitch error
    kd_theta: float = 1.6    # stern D on pitch rate
    fin_clip: float = 0.5    # fin command clamp (rad)
    rpm_cruise: float = 1300.0
    rpm_approach: float = 1100.0
    rpm_turn: float = 550.0   # crawl while the heading error is large
    slow_err: float = 0.6     # heading error (rad) that triggers the crawl
    r_cross: float = 5.2     # outside this planar radius: fly through the gap
    r_orbit: float = 3.9     # orbit radius while unaligned inside the ring
    align_tol: float = 0.35  # azimuth alignment (rad) to begin final approach
    orbit_lead: float = 0.8  # orbit waypoint lead angle (rad)
    wp_cross_r: float = 4.5  # radius the gap-crossing waypoint sits at
    avoid_margin: float = 2.9  # ring-capsule skim circle radius (m)
    avoid_trigger: float = 9.0  # capsule distance that enables avoidance
    crawl_rmin: float = 6.5  # crawl only outside this planar radius


def expert_action(state, g: ExpertGains = ExpertGains()):
    """Map one EnvState to a raw env action [delta_r, delta_s, n_rpm]."""
    veh = state.vehicle
    pos, att = veh[0:3], veh[3:6]
    theta, psi = att[1], att[2]
    q, r = veh[10], veh[11]
    goal = state.goal

    r_v = jnp.sqrt(pos[0] ** 2 + pos[1] ** 2) + 1e-8
    az_v = jnp.arctan2(pos[1], pos[0])
    az_g = jnp.arctan2(goal[1], goal[0])

    # ring gap bisectors from the 4 ring-capsule azimuths (slots 1..4)
    ring_az = jnp.arctan2(state.cap_a[1:5, 1], state.cap_a[1:5, 0])
    gaps = ring_az + jnp.pi / 4.0
    gap_az = gaps[jnp.argmin(jnp.abs(ssa(gaps - az_v)))]

    wp_cross = jnp.array([g.wp_cross_r * jnp.cos(gap_az),
                          g.wp_cross_r * jnp.sin(gap_az), goal[2]])
    to_goal = ssa(az_g - az_v)
    orbit_az = az_v + jnp.sign(to_goal) * g.orbit_lead
    wp_orbit = jnp.array([g.r_orbit * jnp.cos(orbit_az),
                          g.r_orbit * jnp.sin(orbit_az), goal[2]])

    # Terminal runway: the tangent lines to the 2 m safety circle through
    # the goal keep axis distance >= 2 m the whole way (the radial approach
    # from the 3.9 m orbit leaves only 1.9 m of runway — too short for the
    # torpedo's turn radius; the tangent gives sqrt(3.9^2-2^2)=3.35 m).
    run_len = jnp.sqrt(g.r_orbit ** 2 - 4.0) - 0.05
    gamma = jnp.arctan2(run_len, 2.0)
    goal_xy = goal[0:2]

    def tangent_entry(sgn):
        az_t = az_g - sgn * gamma
        return jnp.array([g.r_orbit * jnp.cos(az_t),
                          g.r_orbit * jnp.sin(az_t)])

    def seg_dist(a_xy):
        d = goal_xy - a_xy
        t = jnp.clip(jnp.dot(pos[0:2] - a_xy, d) / (jnp.dot(d, d) + 1e-8),
                     0.0, 1.0)
        return jnp.linalg.norm(pos[0:2] - (a_xy + t * d))

    t1, t2 = tangent_entry(1.0), tangent_entry(-1.0)
    on_runway = jnp.minimum(seg_dist(t1), seg_dist(t2)) < 0.7
    bearing = jnp.arctan2(goal[1] - pos[1], goal[0] - pos[0])
    toward = jnp.cos(bearing - psi) > 0.2
    # entry gate: orbit brings the vehicle past its upstream tangent point
    t_mine = jnp.where(to_goal >= 0, t1, t2)
    near_entry = jnp.linalg.norm(pos[0:2] - t_mine) < 0.9

    outside = r_v > g.r_cross
    approach = (~outside) & (r_v < g.r_orbit + 0.45) & toward & (
        on_runway | near_entry)
    wp = jnp.where(outside, wp_cross,
                   jnp.where(approach, goal, wp_orbit))

    # --- heading (rudder) -------------------------------------------------
    psi_d = jnp.arctan2(wp[1] - pos[1], wp[0] - pos[0])

    # Ring-capsule avoidance: if the LOS cone to the waypoint intersects the
    # nearest ring capsule's 2.7 m margin circle, steer along the cone edge
    # (skim the capsule) instead of through it.  Skipped on the terminal
    # runway, which is safe by construction.
    rel = state.cap_a[1:5, 0:2] - pos[0:2]
    dists = jnp.linalg.norm(rel, axis=1)
    j = jnp.argmin(dists)
    d_c, bear_c = dists[j], jnp.arctan2(rel[j, 1], rel[j, 0])
    alpha = jnp.arcsin(jnp.clip(
        g.avoid_margin / jnp.maximum(d_c, g.avoid_margin), 0.0, 0.999))
    off = ssa(psi_d - bear_c)
    blocked = (d_c < g.avoid_trigger) & (jnp.abs(off) < alpha) & ~approach
    side = jnp.where(off >= 0, 1.0, -1.0)
    psi_d = jnp.where(blocked, bear_c + side * alpha, psi_d)

    e_psi = ssa(psi_d - psi)
    # probe note: the 10 s open-loop probe shows psi wrapping (+0.61 rad/s
    # x 10 s = +6.1 rad -> ssa -1.44); positive delta_r yields POSITIVE yaw
    delta_r = jnp.clip(g.kp_psi * e_psi - g.kd_psi * r,
                       -g.fin_clip, g.fin_clip)

    # --- depth (stern plane) ---------------------------------------------
    e_z = wp[2] - pos[2]  # NED: positive = need to go deeper
    theta_d = jnp.clip(-g.k_z * e_z, -g.theta_max, g.theta_max)
    e_theta = ssa(theta_d - theta)
    delta_s = jnp.clip(g.kp_theta * e_theta - g.kd_theta * q,
                       -g.fin_clip, g.fin_clip)

    # turn-first-then-go: full thrust with a large heading error sweeps the
    # turning circle through the ring band (measured: 77% of collisions at
    # the ring within ~5 s of spawn); crawl until roughly aligned
    n_rpm = jnp.where(approach, g.rpm_approach, g.rpm_cruise)
    n_rpm = jnp.where((jnp.abs(e_psi) > g.slow_err) & (r_v > g.crawl_rmin),
                      g.rpm_turn, n_rpm)
    return jnp.stack([delta_r, delta_s, n_rpm])


# --------------------------------------------------------------- harness
def rollout_expert(core, n_episodes=256, seed=7, gains=ExpertGains(),
                   noise_std=None, collect=False):
    """Vmapped done-latched rollouts driving the env with the expert.

    noise_std: optional (3,) action noise (exploration for BC data).
    collect=True additionally returns per-step (obs, action, alive) tensors.
    """
    max_t = core.config.max_timesteps + 1

    def run(key):
        keys = jax.random.split(key, n_episodes)
        states, obs = jax.vmap(core.reset)(
            keys, jnp.zeros((n_episodes,), jnp.int32))
        step_env = jax.vmap(core.step)
        act_fn = jax.vmap(lambda s: expert_action(s, gains))

        def body(carry, _):
            states, obs, alive, goal, col, mind, key = carry
            action = act_fn(states)
            if noise_std is not None:
                key, k = jax.random.split(key)
                action = action + jax.random.normal(
                    k, action.shape) * jnp.asarray(noise_std)
            nstates, res = step_env(states, action)
            goal = goal | (res.info.goal_reached & alive)
            col = col | (res.info.collision & alive)
            mind = jnp.minimum(mind, jnp.where(alive, res.info.delta_d,
                                               jnp.inf))
            nalive = alive & ~res.done
            out = (obs, action, alive) if collect else None
            return (nstates, res.obs, nalive, goal, col, mind, key), out

        init = (states, obs, jnp.ones((n_episodes,), bool),
                jnp.zeros((n_episodes,), bool),
                jnp.zeros((n_episodes,), bool),
                jnp.full((n_episodes,), jnp.inf), key)
        (_, _, _, goal, col, mind, _), traj = jax.lax.scan(
            body, init, None, length=max_t)
        return goal, col, mind, traj

    goal, col, mind, traj = jax.jit(run)(jax.random.PRNGKey(seed))
    stats = {"n": n_episodes,
             "success": float(jnp.mean(goal)),
             "collision": float(jnp.mean(col)),
             "min_dist_median": float(jnp.median(mind)),
             "min_dist_p25": float(jnp.percentile(mind, 25))}
    return (stats, traj) if collect else stats


def probe():
    """Open-loop probes: constant fin deflections from straight flight —
    prints the sign of the induced yaw/pitch rates so the PD law signs in
    expert_action can be trusted."""
    from gym_dockauv_tpu.envs.core import make_env

    core = make_env("SimpleDocking3d_remus-v0")
    key = jax.random.PRNGKey(0)
    state, _ = core.reset(key, 0)
    # straighten: zero attitude, cruise
    veh = state.vehicle.at[3:6].set(0.0).at[6].set(1.5)
    state = state.replace(vehicle=veh)

    def run(state, action, n=100):
        def body(carry, _):
            s = carry
            s, res = core.step(s, action)
            return s, (s.vehicle[3:6], s.vehicle[9:12], s.vehicle[0:3])
        _, (att, rates, pos) = jax.lax.scan(body, state, None, length=n)
        return att, rates, pos

    for name, a in (("delta_r=+5", jnp.array([5.0, 0.0, 1300.0])),
                    ("delta_s=+5", jnp.array([0.0, 5.0, 1300.0]))):
        att, rates, pos = jax.jit(run)(state, a)
        print(f"{name}: after 10s  att(rpy)={np.asarray(att[-1]).round(3)} "
              f"rates(pqr)={np.asarray(rates[-1]).round(3)} "
              f"pos={np.asarray(pos[-1]).round(2)}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "probe":
        probe()
    else:
        from gym_dockauv_tpu.envs.core import make_env

        n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        core = make_env("ObstaclesCurrentDocking3d_remus-v0")
        stats = rollout_expert(core, n_episodes=n)
        print(json.dumps(stats, indent=1), flush=True)
