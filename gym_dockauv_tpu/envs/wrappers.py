"""Env wrappers.

Role of stable_baselines3/common/vec_env wrappers and monitor.py:17:
`Monitor` (per-episode reward/length/time + monitor.csv), `VecNormalize`
(running obs/reward normalization, vec_normalize.py:296), `VecMonitor`,
`VecFrameStack` (StackedObservations role) and `VecCheckNan`.  These wrap
the NumPy-facing adapters (GymDockingEnv / VecDockingEnv); the jitted
training path doesn't need them — episode stats flow from the in-graph
iteration and NaN guards are jax.debug/checkify territory — but they keep
the reference's composition surface for users driving envs by hand.
"""
from __future__ import annotations

import csv
import json
import time
from collections import deque
from typing import Optional

import numpy as np

from ..rl.common import RunningMeanStd


class Monitor:
    """Single-env episode stats + monitor.csv (monitor.py:17-239)."""

    EXT = "monitor.csv"

    def __init__(self, env, filename: Optional[str] = None):
        self.env = env
        self.t_start = time.time()
        self.episode_returns = []
        self.episode_lengths = []
        self.episode_times = []
        self._current_reward = 0.0
        self._current_length = 0
        self._file = None
        self._writer = None
        if filename:
            if not filename.endswith(self.EXT):
                filename = filename + "." + self.EXT
            self._file = open(filename, "w", newline="")
            self._file.write("#" + json.dumps({"t_start": self.t_start}) + "\n")
            self._writer = csv.DictWriter(self._file, fieldnames=("r", "l", "t"))
            self._writer.writeheader()

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        self._current_reward = 0.0
        self._current_length = 0
        return self.env.reset(**kwargs)

    def step(self, action):
        obs, reward, done, info = self.env.step(action)
        self._current_reward += reward
        self._current_length += 1
        if done:
            ep = {"r": round(self._current_reward, 6),
                  "l": self._current_length,
                  "t": round(time.time() - self.t_start, 6)}
            self.episode_returns.append(ep["r"])
            self.episode_lengths.append(ep["l"])
            self.episode_times.append(ep["t"])
            info = dict(info)
            info["episode"] = ep
            if self._writer:
                self._writer.writerow(ep)
                self._file.flush()
        return obs, reward, done, info

    def close(self):
        if self._file:
            self._file.close()
        self.env.close()


class VecEnvWrapper:
    def __init__(self, venv):
        self.venv = venv
        self.num_envs = venv.num_envs
        self.observation_space = venv.observation_space
        self.action_space = venv.action_space

    def __getattr__(self, name):
        return getattr(self.venv, name)

    def reset(self):
        return self.venv.reset()

    def step(self, actions):
        return self.venv.step(actions)

    def close(self):
        self.venv.close()


class VecMonitor(VecEnvWrapper):
    """Vectorized episode stats (vec_monitor.py role)."""

    def __init__(self, venv, info_buffer_size: int = 100):
        super().__init__(venv)
        self.episode_returns = np.zeros(self.num_envs)
        self.episode_lengths = np.zeros(self.num_envs, int)
        self.ep_info_buffer = deque(maxlen=info_buffer_size)

    def reset(self):
        self.episode_returns[:] = 0
        self.episode_lengths[:] = 0
        return self.venv.reset()

    def step(self, actions):
        obs, rewards, dones, infos = self.venv.step(actions)
        self.episode_returns += rewards
        self.episode_lengths += 1
        for i, done in enumerate(dones):
            if done:
                ep = {"r": float(self.episode_returns[i]),
                      "l": int(self.episode_lengths[i])}
                infos[i] = dict(infos[i])
                infos[i].setdefault("episode", ep)
                self.ep_info_buffer.append(ep)
                self.episode_returns[i] = 0.0
                self.episode_lengths[i] = 0
        return obs, rewards, dones, infos


class VecNormalize(VecEnvWrapper):
    """Running observation/reward normalization (vec_normalize.py:296 role):
    obs -> clip((obs-mean)/sqrt(var+eps), +-clip_obs); rewards normalized by
    the std of the discounted return accumulator."""

    def __init__(self, venv, training: bool = True, norm_obs: bool = True,
                 norm_reward: bool = True, clip_obs: float = 10.0,
                 clip_reward: float = 10.0, gamma: float = 0.99,
                 epsilon: float = 1e-8):
        super().__init__(venv)
        self.training = training
        self.norm_obs = norm_obs
        self.norm_reward = norm_reward
        self.clip_obs = clip_obs
        self.clip_reward = clip_reward
        self.gamma = gamma
        self.epsilon = epsilon
        self.obs_rms = RunningMeanStd(shape=self.observation_space.shape)
        self.ret_rms = RunningMeanStd(shape=())
        self.returns = np.zeros(self.num_envs)

    def normalize_obs(self, obs):
        if not self.norm_obs:
            return obs
        return np.clip((obs - self.obs_rms.mean)
                       / np.sqrt(self.obs_rms.var + self.epsilon),
                       -self.clip_obs, self.clip_obs).astype(np.float32)

    def normalize_reward(self, reward):
        if not self.norm_reward:
            return reward
        return np.clip(reward / np.sqrt(self.ret_rms.var + self.epsilon),
                       -self.clip_reward, self.clip_reward)

    def reset(self):
        obs = self.venv.reset()
        self.returns[:] = 0
        if self.training:
            self.obs_rms.update(obs)
        return self.normalize_obs(obs)

    def step(self, actions):
        obs, rewards, dones, infos = self.venv.step(actions)
        if self.training:
            self.obs_rms.update(obs)
            self.returns = self.returns * self.gamma + rewards
            self.ret_rms.update(self.returns)
            self.returns[dones] = 0.0
        return (self.normalize_obs(obs), self.normalize_reward(rewards),
                dones, infos)


def is_image_space(space) -> bool:
    """3-D Box = image (preprocessing.py is_image_space role, shape-only:
    we skip the dtype/bound checks because our adapters only build float
    Boxes and the wrapper semantics depend on rank alone)."""
    return len(getattr(space, "shape", ())) == 3


def is_image_space_channels_first(space) -> bool:
    """Smallest-axis-first heuristic (preprocessing.py:is_image_space_
    channels_first): (C,H,W) if the first axis is the smallest."""
    return int(np.argmin(space.shape)) == 0


class VecTransposeImage(VecEnvWrapper):
    """Re-order image observations HxWxC -> CxHxW (vec_transpose.py:11-108).

    In the reference this feeds torch Conv2d's channels-first layout.  No
    docking env emits images (the radar fan is a flat ray block), so —
    exactly like the reference, which ships it but never constructs it on
    these tasks — this exists for API completeness and for user envs that
    do produce images; dict observation spaces transpose their image
    leaves only (vec_transpose.py:32-44).
    """

    def __init__(self, venv, skip: bool = False):
        super().__init__(venv)
        self.skip = skip
        if skip:
            return
        sp = venv.observation_space
        if isinstance(sp, dict):
            self.image_space_keys = [k for k, s in sp.items()
                                     if is_image_space(s)]
            self.observation_space = {
                k: (self._transpose_space(s) if k in self.image_space_keys
                    else s)
                for k, s in sp.items()}
        else:
            if not is_image_space(sp):
                raise ValueError(
                    "VecTransposeImage needs an image (3-D Box) or dict "
                    f"observation space, got shape {sp.shape}")
            self.image_space_keys = None
            self.observation_space = self._transpose_space(sp)

    @staticmethod
    def _transpose_space(space):
        from .adapter import Box

        return Box(np.transpose(space.low, (2, 0, 1)),
                   np.transpose(space.high, (2, 0, 1)))

    @staticmethod
    def transpose_image(image: np.ndarray) -> np.ndarray:
        """(H,W,C)->(C,H,W) or batched (N,H,W,C)->(N,C,H,W)
        (vec_transpose.py:60-70)."""
        if image.ndim == 3:
            return np.transpose(image, (2, 0, 1))
        return np.transpose(image, (0, 3, 1, 2))

    def _transpose_obs(self, obs):
        if self.skip:
            return obs
        if self.image_space_keys is not None:
            return {k: (self.transpose_image(v)
                        if k in self.image_space_keys else v)
                    for k, v in obs.items()}
        return self.transpose_image(obs)

    def reset(self):
        return self._transpose_obs(self.venv.reset())

    def step(self, actions):
        obs, rewards, dones, infos = self.venv.step(actions)
        for i, info in enumerate(infos):
            if "terminal_observation" in info:
                infos[i] = dict(info)
                infos[i]["terminal_observation"] = self._transpose_obs(
                    info["terminal_observation"])
        return self._transpose_obs(obs), rewards, dones, infos


class VecFrameStack(VecEnvWrapper):
    """Stack the last n observations (StackedObservations role,
    stacked_observations.py:16-130): flat Boxes stack along the feature
    axis; image Boxes stack along the CHANNEL axis, first or last
    depending on the layout (channels_order auto-detection via the
    smallest-axis heuristic, :59-80)."""

    def __init__(self, venv, n_stack: int = 4, channels_order: str = None):
        super().__init__(venv)
        self.n_stack = n_stack
        sp = venv.observation_space
        if channels_order is None:
            channels_first = (is_image_space(sp)
                              and is_image_space_channels_first(sp))
        else:
            channels_first = channels_order == "first"
        # batched arrays carry a leading env axis -> +1 on the stack axis
        self.stack_axis = 1 if channels_first else -1
        repeat_axis = 0 if channels_first else -1
        low = np.repeat(sp.low, n_stack, axis=repeat_axis)
        high = np.repeat(sp.high, n_stack, axis=repeat_axis)
        self.stacked = np.zeros((self.num_envs,) + low.shape, np.float32)
        self._unit = sp.shape[0 if channels_first else -1]
        from .adapter import Box

        self.observation_space = Box(low, high)

    def _push(self, obs):
        n = self._unit
        self.stacked = np.roll(self.stacked, -n, axis=self.stack_axis)
        if self.stack_axis == 1:
            self.stacked[:, -n:] = obs
        else:
            self.stacked[..., -n:] = obs
        return self.stacked.copy()

    def reset(self):
        obs = self.venv.reset()
        self.stacked[:] = 0
        return self._push(obs)

    def step(self, actions):
        obs, rewards, dones, infos = self.venv.step(actions)
        for i, d in enumerate(dones):
            if d:
                self.stacked[i] = 0
        return self._push(obs), rewards, dones, infos


class VideoRecorder:
    """Record episodes to video files (VecVideoRecorder role,
    vec_video_recorder.py): wraps a GymDockingEnv, captures each episode via
    EpisodeDataStorage and exports the 3-D trajectory animation on episode
    end (mp4 with ffmpeg, else .gif via pillow)."""

    def __init__(self, env, video_folder: str, record_video_trigger=None,
                 name_prefix: str = "docking", fps: int = 10):
        import os

        self.env = env
        self.video_folder = video_folder
        self.trigger = record_video_trigger or (lambda ep: True)
        self.name_prefix = name_prefix
        self.fps = fps
        self.episode_id = 0
        self.recorded_videos = []
        os.makedirs(video_folder, exist_ok=True)

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        from ..utils.datastorage import EpisodeDataStorage

        self._flush()
        self.episode_id += 1
        if self.trigger(self.episode_id):
            self.env.episode_data_storage = EpisodeDataStorage()
        obs = self.env.reset(**kwargs)
        return obs

    def step(self, action):
        out = self.env.step(action)
        if out[2]:  # done
            self._flush()
        return out

    def _flush(self):
        import os

        if self.env.episode_data_storage is None:
            return
        if not self.env.episode_data_storage._arrays:
            self.env.episode_data_storage = None
            return
        from ..utils.plotutils import EpisodeVisualization

        storage = self.env.episode_data_storage
        self.env.episode_data_storage = None
        storage.finalize()
        path = os.path.join(self.video_folder,
                            f"{self.name_prefix}-episode-{self.episode_id}")
        out = EpisodeVisualization(storage).plot_episode_animation(
            save_path=path, fps=self.fps)
        self.recorded_videos.append(out)

    def close(self):
        self._flush()
        self.env.close()


class VecCheckNan(VecEnvWrapper):
    """Raise on NaN/inf in actions or observations (vec_check_nan.py role)."""

    def __init__(self, venv, raise_exception: bool = True):
        super().__init__(venv)
        self.raise_exception = raise_exception

    def step(self, actions):
        self._check(actions, "actions")
        obs, rewards, dones, infos = self.venv.step(actions)
        self._check(obs, "observations")
        self._check(rewards, "rewards")
        return obs, rewards, dones, infos

    def _check(self, arr, what):
        arr = np.asarray(arr)
        if not np.all(np.isfinite(arr)):
            msg = f"non-finite values found in {what}"
            if self.raise_exception:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg)
