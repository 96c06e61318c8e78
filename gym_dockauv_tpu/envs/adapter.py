"""NumPy-facing adapters over the functional core.

`GymDockingEnv` exposes the reference's gym-0.21-style single-env API
(reset(seed)->obs, step->(obs, reward, done, info); docking3d.py:222-410) for
drop-in use, and `VecDockingEnv` replaces the reference's SubprocVecEnv
process farm (stable_baselines3/common/vec_env/subproc_vec_env.py:63-123):
N envs are one vmapped, jitted, auto-resetting XLA program on device — the
lock-step pipe scatter/gather becomes a single device call.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.env_config import EnvConfig
from .core import DockingEnv, make_env
from .types import EnvState


class Box:
    """Minimal Box space (shape/bounds/sample), gym-free."""

    def __init__(self, low: np.ndarray, high: np.ndarray, dtype=np.float32):
        self.low = np.asarray(low, dtype=dtype)
        self.high = np.asarray(high, dtype=dtype)
        self.shape = self.low.shape
        self.dtype = dtype
        self._rng = np.random.default_rng()

    def seed(self, seed=None):
        self._rng = np.random.default_rng(seed)

    def sample(self) -> np.ndarray:
        return self._rng.uniform(self.low, self.high).astype(self.dtype)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(x.shape == self.shape and np.all(x >= self.low - 1e-6) and np.all(x <= self.high + 1e-6))

    def __repr__(self):
        return f"Box({self.shape}, [{self.low.min()}, {self.high.max()}])"


def _info_to_dict(env: DockingEnv, info, done: bool) -> Dict[str, Any]:
    cond = np.asarray(info.conditions)
    cond_idx = [i for i in range(5) if cond[i]]
    d = {
        "episode_number": int(info.episode_number),
        "t_step": int(info.t_step),
        "cumulative_reward": float(info.cumulative_reward),
        "done": bool(done),
        "conditions_true": cond_idx,
        "conditions_true_info": [env.meta_data_done[i] for i in cond_idx],
        "collision": bool(info.collision),
        "goal_reached": bool(info.goal_reached),
        "delta_d": float(info.delta_d),
        "reward_arr": np.asarray(info.reward_arr),
    }
    if done:
        d["terminal_observation"] = np.asarray(info.terminal_observation)
    return d


class GymDockingEnv:
    """Single-environment compatibility adapter (old-gym API)."""

    metadata = {"render.modes": ["human"]}

    def __init__(self, env_id: str = "SimpleDocking3d-v0",
                 env_config: Optional[EnvConfig] = None, dtype=jnp.float32):
        self.core = make_env(env_id, env_config, dtype=dtype)
        self.env_id = env_id
        self._reset_fn = jax.jit(self.core.reset)
        self._step_fn = jax.jit(self.core.step)
        self._state: Optional[EnvState] = None
        self._episode = 0
        self._key = jax.random.PRNGKey(0)
        self.action_space = Box(self.core.action_low, self.core.action_high)
        obs_low, obs_high = self.core.observation_bounds()
        self.observation_space = Box(obs_low, obs_high)
        self.last_info: Dict[str, Any] = {}
        # trajectory capture for rendering/storage (set externally)
        self.episode_data_storage = None
        self.episode_animation = None

    @property
    def config(self) -> EnvConfig:
        return self.core.config

    @property
    def state(self) -> Optional[EnvState]:
        return self._state

    def reset(self, seed: Optional[int] = None, return_info: bool = False,
              options: Optional[dict] = None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, sub = jax.random.split(self._key)
        # close any live animation: the new episode has fresh goal/obstacles
        # (reference docking3d.py:242-246)
        if self.episode_animation is not None:
            self.episode_animation.close()
            self.episode_animation = None
        if hasattr(self, "_render_traj"):
            del self._render_traj
        self._state, obs = self._reset_fn(sub, self._episode)
        self._episode = int(self._state.episode)
        info, self.last_info = self.last_info, {}
        self.last_obs = np.asarray(obs)
        if self.episode_data_storage is not None:
            self.episode_data_storage.on_reset(self)
        if return_info:
            return np.asarray(obs), info
        return np.asarray(obs)

    def step(self, action: np.ndarray) -> Tuple[np.ndarray, float, bool, Dict[str, Any]]:
        assert self._state is not None, "call reset() first"
        self._state, res = self._step_fn(self._state, jnp.asarray(action))
        done = bool(res.done)
        info = _info_to_dict(self.core, res.info, done)
        self.last_info = info
        self.last_obs = np.asarray(res.obs)
        if self.episode_data_storage is not None:
            self.episode_data_storage.on_step(self)
        return np.asarray(res.obs), float(res.reward), done, info

    def render(self, mode: str = "human", rotate_cam: bool = False, real_time: bool = False):
        from ..utils.plotutils import render_env  # lazy: matplotlib
        return render_env(self, rotate_cam=rotate_cam, real_time=real_time)

    def close(self):
        pass


class VecDockingEnv:
    """Vectorized, auto-resetting env batch on one device.

    API mirrors SB3's VecEnv surface used by the reference training loop:
    reset() -> (n, obs); step(actions) -> (obs, rewards, dones, infos) where
    infos[i]["terminal_observation"] carries the pre-reset observation.
    """

    def __init__(self, env_id: str, num_envs: int,
                 env_config: Optional[EnvConfig] = None, seed: int = 0,
                 dtype=jnp.float32):
        self.core = make_env(env_id, env_config, dtype=dtype)
        self.num_envs = num_envs
        self.env_id = env_id
        self._reset_fn = jax.jit(jax.vmap(self.core.reset, in_axes=(0, 0)))
        self._step_fn = jax.jit(jax.vmap(self.core.step_autoreset))
        self._state: Optional[EnvState] = None
        self._key = jax.random.PRNGKey(seed)
        self.action_space = Box(self.core.action_low, self.core.action_high)
        obs_low, obs_high = self.core.observation_bounds()
        self.observation_space = Box(obs_low, obs_high)

    @property
    def states(self) -> Optional[EnvState]:
        return self._state

    def reset(self) -> np.ndarray:
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self.num_envs)
        episodes = jnp.zeros((self.num_envs,), jnp.int32)
        self._state, obs = self._reset_fn(keys, episodes)
        return np.asarray(obs)

    def step(self, actions: np.ndarray):
        assert self._state is not None, "call reset() first"
        self._state, res = self._step_fn(self._state, jnp.asarray(actions))
        dones = np.asarray(res.done)
        # one host transfer per field, then cheap numpy indexing in the loop
        info = res.info
        ep_no = np.asarray(info.episode_number)
        delta_d = np.asarray(info.delta_d)
        collision = np.asarray(info.collision)
        goal = np.asarray(info.goal_reached)
        cum_r = np.asarray(info.cumulative_reward)
        t_step = np.asarray(info.t_step)
        term_obs = np.asarray(info.terminal_observation) if dones.any() else None
        infos: List[Dict[str, Any]] = []
        for i in range(self.num_envs):
            d: Dict[str, Any] = {
                "episode_number": int(ep_no[i]),
                "delta_d": float(delta_d[i]),
                "collision": bool(collision[i]),
                "goal_reached": bool(goal[i]),
            }
            if dones[i]:
                d["terminal_observation"] = term_obs[i]
                d["episode"] = {  # SB3 Monitor-style episode record
                    "r": float(cum_r[i]),
                    "l": int(t_step[i]),
                }
            infos.append(d)
        return np.asarray(res.obs), np.asarray(res.reward), dones, infos

    def close(self):
        pass
