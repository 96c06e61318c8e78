"""gym_dockauv_tpu: TPU-native AUV docking RL framework.

A from-scratch JAX/XLA re-design with the capabilities of the reference
`gym_dockauv` suite (Fossen 6-DOF marine-craft dynamics for BlueROV2 /
LAUV / REMUS 100, ray-casting radar, ocean currents, shaped docking reward,
14 registered scenarios, PPO/SAC training): environments are pure batched
functions over state pytrees — thousands of envs per chip via vmap, scaled
across a device mesh via sharding, with the learner fused into the same
compiled program.
"""
from .config.env_config import REGISTRATION_DICT
from .envs import (
    DockingEnv,
    EnvState,
    GymDockingEnv,
    VecDockingEnv,
    make_env,
)

__version__ = "0.1.0"

# Mirror the reference's import-time gym registration
# (gym_dockauv/__init__.py:4-8) into gymnasium when it is importable, so
# `gymnasium.make("SimpleDocking3d-v0")` is a literal drop-in.  No-op
# (returns False) without gymnasium.
from .envs.gymnasium_shim import register_gymnasium_envs

register_gymnasium_envs()


def make(env_id: str, env_config=None, **kwargs) -> GymDockingEnv:
    """gym.make-style entry point over the registration dict
    (reference gym_dockauv/__init__.py:4-8 + train.py:269-282)."""
    return GymDockingEnv(env_id, env_config=env_config, **kwargs)


def make_vec(env_id: str, num_envs: int, env_config=None, **kwargs) -> VecDockingEnv:
    """Vectorized on-device env batch (replaces SubprocVecEnv usage)."""
    return VecDockingEnv(env_id, num_envs, env_config=env_config, **kwargs)


__all__ = [
    "REGISTRATION_DICT",
    "DockingEnv",
    "EnvState",
    "GymDockingEnv",
    "VecDockingEnv",
    "make",
    "make_vec",
    "make_env",
]
