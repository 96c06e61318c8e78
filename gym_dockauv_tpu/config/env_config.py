"""Typed environment configuration.

The reference configures envs through nested Python dicts deep-copied from
BASE_CONFIG (gym_dockauv/config/env_config.py:28-164).  Here the same knob
set is a frozen dataclass tree: hashable (usable as a static jit argument),
validated at construction, and with `replace`-style overrides instead of
dict mutation.  Factory functions mirror the reference's named config dicts.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class RadarConfig:
    """Radar knobs (env_config.py:91-98)."""

    freq: float = 1.0
    alpha: float = 60 * np.pi / 180
    beta: float = 80 * np.pi / 180
    ray_per_deg: float = 10 * np.pi / 180
    max_dist: float = 10.0
    blocksize_reduce: int = 2


@dataclasses.dataclass(frozen=True)
class RewardFactors:
    """Reward weights (env_config.py:65-86; remus overrides :124-147)."""

    w_d: float = 1.1
    w_delta_psi: float = 0.5
    w_delta_theta: float = 0.3
    w_phi: float = 0.3
    w_theta: float = 0.3
    w_thetadot: float = 0.2
    w_t: float = 0.05  # present in the reference config but unused in reward
    w_oa: float = 0.20
    w_goal: float = 400.0
    w_deltad_max: float = -200.0
    w_theta_max: float = -200.0
    w_t_max: float = -100.0
    w_col: float = -300.0
    w_velocity: float = 0.0  # REMUS planar-velocity bonus (remus cfg: 1.0)

    def replace(self, **kwargs) -> "RewardFactors":
        return dataclasses.replace(self, **kwargs)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Full environment configuration (BASE_CONFIG, env_config.py:28-99)."""

    config_name: str = "DEFAULT_BASE_CONFIG"
    title: str = "DEFAULT"
    log_level: int = 30
    verbose: int = 1

    max_timesteps: int = 1000
    t_step_size: float = 0.10
    interval_datastorage: int = 100
    interval_episode_log: int = 50
    save_path_folder: str = "logs"

    max_dist_from_goal: float = 20.0
    max_attitude: float = 60 / 180 * np.pi
    dist_goal_reached_tol: float = 0.5
    velocity_goal_reached_tol: float = 0.3
    ang_rate_goal_reached_tol: float = 20 * np.pi / 180
    attitude_goal_reached_tol: float = 20 * np.pi / 180

    vehicle: str = "BlueROV2"
    u_max: float = 2.0
    v_max: float = 1.5
    w_max: float = 1.5
    p_max: float = 90 * np.pi / 180
    q_max: float = 90 * np.pi / 180
    r_max: float = 120 * np.pi / 180
    radius: float = 0.5  # config knob; NOTE the reference never applies it —
    # collision uses AUVSim.safety_radius == 1 (auvsim.py:43), replicated here
    safety_radius: float = 1.0
    reward_set: int = 1
    reward_factors: RewardFactors = dataclasses.field(default_factory=RewardFactors)
    action_reward_factors: float = 6.0
    radar: RadarConfig = dataclasses.field(default_factory=RadarConfig)

    # Obstacle schema capacity (padded/masked; one compiled program for all
    # scenarios).  5 covers the densest reference scenario (center capsule +
    # ring of 4, docking3d.py:923-958).
    max_capsules: int = 5
    max_spheres: int = 1

    index: int | None = None  # per-worker index (docking3d_remus.py:52-56)

    # --- curriculum-shaping knobs (TRAINING TOOLS, no reference counterpart;
    # the defaults reproduce the reference scenarios exactly) ---------------
    # Scales the radius of the 4 ring obstacle capsules (Obstacles* kinds).
    # Annealing 0.2 -> 1.0 teaches ring navigation with fat safety margins
    # before the true 2 m collision shells (capsule r=1 + safety_radius).
    ring_radius_scale: float = 1.0
    # Scales the radius of the CENTER docking capsule (Capsule*/Obstacles*
    # kinds).  The goal's radial placement is NOT scaled (it stays at the
    # true capsule_r + safety_radius), so a scale < 1 opens a clearance
    # band between the goal and the collision shell — annealing it back
    # to 1 closes the band until the goal sits exactly on the shell again.
    center_radius_scale: float = 1.0
    # Extra radial offset (m) of the docking goal from the capsule shaft.
    # The reference places the goal EXACTLY on the vehicle's collision
    # boundary (goal radius = capsule radius + safety radius,
    # docking3d.py:884-888); a positive margin makes the terminal approach
    # forgiving early in a curriculum, annealed back to the true 0.
    goal_radius_margin: float = 0.0
    # Scales the REMUS fin action bounds (+/-10 rad in the reference,
    # remus100.py u_bound).  The actuator saturates at 30 deg = 0.52 rad
    # (remus100.py:129-134), so only ~5% of the +/-10 rad command range is
    # in the actuator's linear band — a scaled policy's fin channels are
    # effectively bang-bang.  fin_bound_scale=0.1 trains over +/-1 rad
    # (a strict SUBSET of the true action space: the dynamics are identical
    # for any command the policy emits, so a policy trained at 0.1
    # evaluates on the true env exactly).
    fin_bound_scale: float = 1.0
    # Reverse spawn curriculum: per episode, the spawn point is lerped
    # toward the goal, spawn' = goal + lam * (spawn - goal) with
    # lam ~ U(spawn_lerp_min, 1).  At the default 1.0 the spawn is exactly
    # the reference's (fixed [-8,0,0] for the remus family,
    # docking3d_remus.py:908-914).  Annealing spawn_lerp_min 0.1 -> 1.0
    # keeps the FULL env fixed across curriculum stages (ring present,
    # radar-visible, collisions terminal) while the start state sweeps
    # from trivially-near-goal out to the true spawn — unlike geometry
    # ladders, every stage's replay data comes from the true MDP.  A
    # lerped spawn that lands inside an obstacle's collision shell falls
    # back to the true spawn for that episode.
    spawn_lerp_min: float = 1.0
    # Upper edge of the spawn window: lam ~ U(spawn_lerp_min,
    # spawn_lerp_max).  A window below 1 concentrates episodes near the
    # goal (with lam ~ U(min, 1) half of all episodes start beyond the
    # obstacle ring, so ring-crossing collisions dominate replay in every
    # stage); sliding the window outward decouples the precision stages
    # from the navigation stages.  Default 1.0 = reference spawn.
    spawn_lerp_max: float = 1.0
    # Extra clearance (m) added to the collision shell in the lerped-spawn
    # chord walk.  The REMUS spawns at rest with a 1 s actuator lag; a
    # spawn adjacent to a shell gets drifted into collision by the
    # 0.5-1 m/s grid current before the prop spins up — a structural
    # collision floor for near-goal spawns.  Only affects lerped spawns.
    spawn_clearance: float = 0.0
    # Initial surge velocity (m/s) at spawn (and, for the remus family, a
    # matching pre-spun propeller rpm).  The reference spawns at rest; a
    # cruise-speed start makes near-goal curriculum episodes match the
    # real task's arrive-at-speed terminal approach instead of teaching
    # docking-from-rest.  Default 0.0 = reference-exact rest start.
    spawn_speed: float = 0.0
    # Aim the spawn attitude at the goal (yaw = bearing, pitch = clipped
    # elevation, roll = 0) instead of the reference's random attitude.
    spawn_aim: bool = False

    def replace(self, **kwargs) -> "EnvConfig":
        return dataclasses.replace(self, **kwargs)


def BASE_CONFIG() -> EnvConfig:
    return EnvConfig()


def TRAIN_CONFIG() -> EnvConfig:
    return EnvConfig(
        title="Training Run", save_path_folder=os.path.join(os.getcwd(), "logs")
    )


def TRAIN_CONFIG_REMUS() -> EnvConfig:
    """TRAIN_CONFIG_remus (env_config.py:107-147): zeroed heading/pitch/rate
    terms, attitude-out penalty disabled, +w_velocity bonus."""
    return EnvConfig(
        title="Training Run",
        save_path_folder=os.path.join(os.getcwd(), "logs"),
        vehicle="remus100",
        reward_factors=RewardFactors(
            w_d=1.1,
            w_delta_psi=0.0,
            w_delta_theta=0.0,
            w_phi=0.3,
            w_theta=0.0,
            w_thetadot=0.0,
            w_oa=0.20,
            w_goal=400.0,
            w_deltad_max=-200.0,
            w_theta_max=-0.0,
            w_t_max=-100.0,
            w_col=-300.0,
            w_velocity=1.0,
        ),
    )


def PREDICT_CONFIG() -> EnvConfig:
    return EnvConfig(
        title="Prediction Run",
        save_path_folder=os.path.join(os.getcwd(), "predict_logs"),
        interval_datastorage=1,
        interval_episode_log=1,
    )


def MANUAL_CONFIG() -> EnvConfig:
    return EnvConfig(
        title="Manual Run",
        save_path_folder=os.path.join(os.getcwd(), "manual_logs"),
        interval_datastorage=1,
        interval_episode_log=1,
    )


# Scenario registry: env id -> (family, scenario kind), mirroring
# REGISTRATION_DICT (env_config.py:9-25).
_KINDS = (
    "Simple",
    "SimpleCurrent",
    "Capsule",
    "CapsuleCurrent",
    "Obstacles",
    "ObstaclesCurrent",
    "ObstaclesNoCap",
)
REGISTRATION_DICT: dict = {}
for _k in _KINDS:
    REGISTRATION_DICT[f"{_k}Docking3d-v0"] = ("bluerov", _k)
    REGISTRATION_DICT[f"{_k}Docking3d_remus-v0"] = ("remus", _k)
