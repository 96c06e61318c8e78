"""Gymnasium registration shim.

The reference registers its 14 env ids into the gym registry at package
import (gym_dockauv/__init__.py:4-8) so `gym.make("SimpleDocking3d-v0")`
works anywhere.  This repo's own surface is gym-free by design
(adapter.py), but when `gymnasium` is importable we mirror that
registration so the adapter is a literal drop-in:

    import gymnasium, gym_dockauv_tpu
    env = gymnasium.make("SimpleDocking3d-v0")           # modern 5-tuple API
    obs, info = env.reset(seed=0)
    obs, r, terminated, truncated, info = env.step(env.action_space.sample())

`GymnasiumDockingEnv` converts the old-gym semantics of `GymDockingEnv`
to the gymnasium API: reset returns (obs, info), step splits `done` into
terminated/truncated (truncated = the `t >= max_timesteps` condition with
no other terminal condition — condition index 3 of meta_data_done,
docking3d.py:609-643).  Registration deliberately omits
`max_episode_steps`: the reference registers without it too
(env_config.py:9-25), the episode cap lives inside `is_done`.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..config.env_config import REGISTRATION_DICT
from .adapter import GymDockingEnv

try:  # pragma: no cover - exercised only when gymnasium is installed
    import gymnasium
    from gymnasium import spaces as _gspaces
except ImportError:  # gymnasium is optional; the shim is inert without it
    gymnasium = None


if gymnasium is not None:

    class GymnasiumDockingEnv(gymnasium.Env):
        metadata = {"render_modes": ["human"]}

        def __init__(self, env_id: str, env_config=None,
                     render_mode: Optional[str] = None, **kwargs):
            self._env = GymDockingEnv(env_id, env_config=env_config,
                                      **kwargs)
            self.render_mode = render_mode
            self.action_space = _gspaces.Box(
                low=self._env.action_space.low,
                high=self._env.action_space.high,
                dtype=self._env.action_space.dtype)
            self.observation_space = _gspaces.Box(
                low=self._env.observation_space.low,
                high=self._env.observation_space.high,
                dtype=self._env.observation_space.dtype)

        @property
        def unwrapped_core(self):
            return self._env.core

        def reset(self, *, seed: Optional[int] = None,
                  options: Optional[dict] = None):
            super().reset(seed=seed)
            obs, info = self._env.reset(seed=seed, return_info=True,
                                        options=options)
            return np.asarray(obs), info

        def step(self, action):
            obs, reward, done, info = self._env.step(action)
            timeout = 3 in info.get("conditions_true", [])
            other_terminal = any(c != 3 for c in
                                 info.get("conditions_true", []))
            terminated = bool(done and (other_terminal or not timeout))
            truncated = bool(done and timeout and not other_terminal)
            return (np.asarray(obs), float(reward), terminated, truncated,
                    info)

        def render(self):
            if self.render_mode == "human":
                return self._env.render()
            return None

        def close(self):
            self._env.close()


def register_gymnasium_envs() -> bool:
    """Register all 14 scenario ids into the gymnasium registry (idempotent).
    Returns True if gymnasium is present and the ids are registered."""
    if gymnasium is None:
        return False
    for env_id in REGISTRATION_DICT:
        if env_id in gymnasium.registry:
            continue
        gymnasium.register(
            id=env_id,
            entry_point="gym_dockauv_tpu.envs.gymnasium_shim:GymnasiumDockingEnv",
            kwargs={"env_id": env_id},
        )
    return True
