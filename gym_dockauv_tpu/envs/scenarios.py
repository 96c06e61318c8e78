"""Scenario generators: pure sampling functions keyed by (family, kind).

Re-expresses the reference's `generate_environment` inheritance chains
(docking3d.py:807-1001, docking3d_remus.py:892-1087) as data: each of the 14
registered envs is (family in {bluerov, remus}) x (kind in {Simple,
SimpleCurrent, Capsule, CapsuleCurrent, Obstacles, ObstaclesCurrent,
ObstaclesNoCap}).  The kind is static per compiled program, so the sampler
uses plain Python control flow; all randomness flows through an explicit
PRNG key (replacing the reference's global np.random consumption,
docking3d.py:301-303).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config.env_config import _KINDS, EnvConfig
from ..ops import geom, rays
from ..ops.rays import vec_line_point

# Scenario constants (docking3d.py:820-956)
_DISTANCE_FROM_GOAL = 15.0
_CAPSULE_RADIUS = 1.0
_CAPSULE_HEIGHT = 4.0
_RING_RADIUS = 1.0
_RING_DISTANCE = 6.0
_RING_COUNT = 4

# canonical scenario-kind tuple lives next to the registration dict
KINDS = _KINDS


class Scenario(NamedTuple):
    goal: jnp.ndarray  # (3,)
    heading_goal: jnp.ndarray  # ()
    spawn_pos: jnp.ndarray  # (3,)
    spawn_att: jnp.ndarray  # (3,)
    v_c_init: jnp.ndarray  # () initial GM speed state
    cur_v_min: jnp.ndarray  # ()
    cur_v_max: jnp.ndarray  # ()
    cur_alpha: jnp.ndarray  # ()
    cur_beta: jnp.ndarray  # ()
    cap_a: jnp.ndarray  # (K, 3) vec_bot
    cap_b: jnp.ndarray  # (K, 3) vec_top
    cap_r: jnp.ndarray  # (K,)
    cap_valid: jnp.ndarray  # (K,) bool
    sph_c: jnp.ndarray  # (S, 3)
    sph_r: jnp.ndarray  # (S,)
    sph_valid: jnp.ndarray  # (S,) bool


def _random_pos(key, goal, d, dtype):
    """Spawn point d meters from goal with compressed z
    (docking3d.py:699-708)."""
    r = jax.random.uniform(key, (3,), dtype=dtype) - 0.5
    z = jnp.abs(r[0] + r[1]) / 3.0 * jnp.sign(r[2])
    r = r.at[2].set(z)
    return goal + r * (d / jnp.linalg.norm(r))


def _random_att(key, max_attitude, dtype, factor=0.7):
    """Random attitude at `factor` of max roll/pitch, full-circle yaw
    (docking3d.py:710-715)."""
    r = (jax.random.uniform(key, (3,), dtype=dtype) - 0.5) * 2.0
    scale = jnp.array(
        [max_attitude * factor, max_attitude * factor, jnp.pi], dtype=dtype
    )
    return r * scale


def _random_current_angles(key, dtype):
    """(alpha, beta) ~ U(-pi/2, pi/2) x U(-pi, pi) (docking3d.py:856)."""
    r = (jax.random.uniform(key, (2,), dtype=dtype) - 0.5) * 2.0
    return r[0] * (jnp.pi / 2), r[1] * jnp.pi


def sample_scenario(
    cfg: EnvConfig, family: str, kind: str, key: jax.Array, dtype=jnp.float32
) -> Scenario:
    if kind not in KINDS:
        raise KeyError(f"Unknown scenario kind {kind!r}; one of {KINDS}")
    k_head, k_pos, k_att, k_goal1, k_goal2, k_ring, k_cur1, k_cur2 = jax.random.split(
        key, 8
    )
    z = jnp.zeros((), dtype=dtype)

    # --- base (Simple): goal/spawn -------------------------------------
    if family == "bluerov":
        goal = jnp.zeros(3, dtype=dtype)
        spawn_pos = _random_pos(k_pos, goal, _DISTANCE_FROM_GOAL, dtype)
    else:  # remus: fixed goal/spawn (docking3d_remus.py:908-914)
        goal = jnp.array([10.0, 0.0, 0.0], dtype=dtype)
        spawn_pos = jnp.array([-8.0, 0.0, 0.0], dtype=dtype)
    heading_goal = (jax.random.uniform(k_head, (), dtype=dtype) - 0.5) * jnp.pi
    spawn_att = _random_att(k_att, cfg.max_attitude, dtype)

    # --- obstacles ------------------------------------------------------
    K, S = cfg.max_capsules, cfg.max_spheres
    cap_a = jnp.zeros((K, 3), dtype=dtype)
    cap_b = jnp.zeros((K, 3), dtype=dtype)
    cap_r = jnp.ones((K,), dtype=dtype)
    cap_valid = jnp.zeros((K,), dtype=bool)

    has_center = kind in ("Capsule", "CapsuleCurrent", "Obstacles", "ObstaclesCurrent", "ObstaclesNoCap")
    has_ring = kind in ("Obstacles", "ObstaclesCurrent", "ObstaclesNoCap")
    drop_center = kind == "ObstaclesNoCap"

    if has_center:
        # Goal on the docking-capsule shaft (docking3d.py:876-898).
        theta_g = jax.random.uniform(k_goal1, (), dtype=dtype) * 2 * jnp.pi
        radius_g = _CAPSULE_RADIUS + cfg.safety_radius + cfg.goal_radius_margin
        goal = jnp.stack(
            [
                jnp.cos(theta_g) * radius_g,
                jnp.sin(theta_g) * radius_g,
                (jax.random.uniform(k_goal2, (), dtype=dtype) - 0.5) * _CAPSULE_HEIGHT,
            ]
        )
        vec_top = jnp.array([0.0, 0.0, -_CAPSULE_HEIGHT / 2.0], dtype=dtype)
        vec_bot = -vec_top  # position - (vec_top - position), position = 0
        vec = vec_line_point(goal, vec_top, vec_bot)
        heading_goal = geom.ssa(jnp.arctan2(vec[1], vec[0]))
        if not drop_center:
            cap_a = cap_a.at[0].set(vec_bot)
            cap_b = cap_b.at[0].set(vec_top)
            cap_r = cap_r.at[0].set(_CAPSULE_RADIUS * cfg.center_radius_scale)
            cap_valid = cap_valid.at[0].set(True)

    if has_ring:
        # Ring of 4 tall capsules at random phase (docking3d.py:931-958).
        theta0 = jax.random.uniform(k_ring, (), dtype=dtype) * 2 * jnp.pi
        angles = theta0 + (2 * jnp.pi / _RING_COUNT) * jnp.arange(_RING_COUNT, dtype=dtype)
        xs = jnp.cos(angles) * _RING_DISTANCE
        ys = jnp.sin(angles) * _RING_DISTANCE
        height = 2.0 * cfg.max_dist_from_goal
        start = 0 if drop_center else 1
        for i in range(_RING_COUNT):
            top = jnp.stack([xs[i], ys[i], -height / 2.0])
            bot = jnp.stack([xs[i], ys[i], height / 2.0])
            cap_a = cap_a.at[start + i].set(bot)
            cap_b = cap_b.at[start + i].set(top)
            cap_r = cap_r.at[start + i].set(_RING_RADIUS * cfg.ring_radius_scale)
            cap_valid = cap_valid.at[start + i].set(True)

    # --- reverse spawn curriculum (training-only; default 1.0 is a no-op
    # that leaves the reference spawn untouched) --------------------------
    if cfg.spawn_lerp_min < 1.0 or cfg.spawn_lerp_max < 1.0:
        k_lerp = jax.random.fold_in(k_pos, 0x5CA1)
        lam = jax.random.uniform(
            k_lerp, (), dtype=dtype, minval=cfg.spawn_lerp_min,
            maxval=cfg.spawn_lerp_max,
        )
        # A lerped point can sit inside an obstacle's collision shell (the
        # goal itself sits ON the docking capsule's boundary, so chords
        # that pass through the capsule bury the whole near window).  Walk
        # lam outward along the chord and take the first collision-free
        # candidate (same predicate as the env's body collision, core.py
        # _collision; spheres are never populated by these scenarios).
        # cand[-1] = 1.0 is the always-valid reference spawn.
        cand = lam + (1.0 - lam) * jnp.linspace(0.0, 1.0, 9, dtype=dtype)
        pts = goal[None, :] + cand[:, None] * (spawn_pos - goal)[None, :]
        hit = rays.collide_capsules_sphere(
            cap_a[None], cap_b[None], cap_r[None], cap_valid[None], pts,
            jnp.asarray(cfg.safety_radius + cfg.spawn_clearance, dtype),
        )  # (9,)
        first_ok = jnp.argmax(~hit)
        spawn_pos = jnp.where(jnp.all(hit), spawn_pos, pts[first_ok])

    if cfg.spawn_aim:
        # face the goal: yaw = bearing, pitch cancels the elevation error
        # (attitude[1] + ssa(arctan2(dz, dxy)) = 0, core.py _nav_errors)
        diff = goal - spawn_pos
        yaw = jnp.arctan2(diff[1], diff[0])
        pitch = jnp.clip(
            -jnp.arctan2(diff[2], jnp.linalg.norm(diff[:2])), -0.5, 0.5
        )
        spawn_att = jnp.stack([z, pitch, yaw])

    # --- current --------------------------------------------------------
    if kind == "SimpleCurrent":
        # random direction + uniform fixed speed (docking3d.py:849-861)
        alpha_c, beta_c = _random_current_angles(k_cur1, dtype)
        speed = jax.random.uniform(k_cur2, (), dtype=dtype) * 1.0
        v_min = v_max = speed
        v_init = jnp.asarray(0.5, dtype=dtype)
    elif kind in ("CapsuleCurrent", "ObstaclesCurrent"):
        # fixed 0.5 m/s, random direction (docking3d.py:909-920, :989-1000)
        alpha_c, beta_c = _random_current_angles(k_cur1, dtype)
        v_min = v_max = jnp.asarray(0.5, dtype=dtype)
        v_init = jnp.asarray(0.5, dtype=dtype)
    else:
        alpha_c = beta_c = z
        v_min = v_max = v_init = z

    return Scenario(
        goal=goal,
        heading_goal=heading_goal,
        spawn_pos=spawn_pos,
        spawn_att=spawn_att,
        v_c_init=v_init,
        cur_v_min=v_min,
        cur_v_max=v_max,
        cur_alpha=alpha_c,
        cur_beta=beta_c,
        cap_a=cap_a,
        cap_b=cap_b,
        cap_r=cap_r,
        cap_valid=cap_valid,
        sph_c=jnp.zeros((S, 3), dtype=dtype),
        sph_r=jnp.ones((S,), dtype=dtype),
        sph_valid=jnp.zeros((S,), dtype=bool),
    )
