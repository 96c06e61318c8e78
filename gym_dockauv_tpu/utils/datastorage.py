"""Episode / run data persistence.

Role of gym_dockauv/utils/datastorage.py:21-472: `EpisodeDataStorage`
records a full per-step trajectory (states, derivatives, inputs, current,
radar end points, rewards, observations) for every Nth episode and pickles
it; `FullDataStorage` records one cumulative-reward row + final info per
episode across a whole run.  `ArrayList` is the amortized growable array
both use (datastorage.py:121-162).

TPU-native differences: step data arrives as host snapshots from the
`GymDockingEnv` adapter hooks (`on_reset`/`on_step`) or as whole stacked
trajectories from a jitted rollout (`from_trajectory`) — the hot vmapped
training path never materializes per-step host data.
"""
from __future__ import annotations

import datetime
import os
import pickle
from typing import Any, Dict, List, Optional

import numpy as np

from ..envs.core import N_REWARDS


class ArrayList:
    """Growable 2-D array with amortized over-allocation
    (datastorage.py:121-162 semantics, same x4 growth factor)."""

    def __init__(self, row_shape):
        self.row_shape = tuple(np.atleast_1d(row_shape))
        self.capacity = 100
        self.data = np.zeros((self.capacity, *self.row_shape))
        self.size = 0

    def add_row(self, row) -> None:
        if self.size == self.capacity:
            self.capacity *= 4
            newdata = np.zeros((self.capacity, *self.row_shape))
            newdata[: self.size] = self.data[: self.size]
            self.data = newdata
        self.data[self.size] = np.asarray(row)
        self.size += 1

    def get_data(self) -> np.ndarray:
        return self.data[: self.size]


def _utc_stamp() -> str:
    return datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y_%m_%dT%H_%M_%S")


def _shapes_from_state(state) -> List[Dict[str, Any]]:
    """Masked obstacle SoA -> serializable shape list (for replay plots)."""
    out: List[Dict[str, Any]] = []
    cap_valid = np.asarray(state.cap_valid)
    cap_a, cap_b, cap_r = (np.asarray(state.cap_a), np.asarray(state.cap_b),
                           np.asarray(state.cap_r))
    for i in range(cap_valid.shape[0]):
        if cap_valid[i]:
            out.append({"type": "capsule", "vec_bot": cap_a[i],
                        "vec_top": cap_b[i], "radius": float(cap_r[i])})
    sph_valid = np.asarray(state.sph_valid)
    sph_c, sph_r = np.asarray(state.sph_c), np.asarray(state.sph_r)
    for i in range(sph_valid.shape[0]):
        if sph_valid[i]:
            out.append({"type": "sphere", "position": sph_c[i],
                        "radius": float(sph_r[i])})
    return out


class EpisodeDataStorage:
    """Per-episode trajectory recorder + pickle store
    (datastorage.py:165-472)."""

    def __init__(self):
        self.storage: Optional[Dict[str, Any]] = None
        self.file_save_name: Optional[str] = None
        self._arrays: Dict[str, ArrayList] = {}

    # -- adapter-hook capture (single-env predict/manual path) -------------
    def on_reset(self, env) -> None:
        import jax

        core = env.core
        state = env.state
        # the compiled snapshot is cached on the env so per-episode storage
        # instances (e.g. VideoRecorder) never retrigger XLA compilation
        if getattr(env, "_radar_fn", None) is None:
            env._radar_fn = jax.jit(core.radar_snapshot)
        self._radar_fn = env._radar_fn
        n_rays = core.fan.n_rays
        self._arrays = {
            "states": ArrayList(12),
            "states_dot": ArrayList(12),
            "u": ArrayList(core.n_actions),
            "nu_c": ArrayList(6),
            "radar_pos": ArrayList(3),
            "radar_end_pos": ArrayList((n_rays, 3)),
            "cum_rewards": ArrayList(N_REWARDS),
            "rewards": ArrayList(N_REWARDS),
            "observation": ArrayList(core.n_observations),
        }
        self.storage = {
            "vehicle": {
                "name": core.config.vehicle,
                "safety_radius": float(core.config.safety_radius),
                "u_bound": np.asarray(core.u_bound),
            },
            "shapes": _shapes_from_state(state),
            "goal_location": np.asarray(state.goal),
            "heading_goal": float(state.heading_goal),
            "episode": int(state.episode),
            "step_size": float(core.config.t_step_size),
            "title": core.config.title,
            "env_id": getattr(env, "env_id", None),
            "meta_data_reward": core.meta_data_reward,
            "meta_data_observation": core.meta_data_observation,
            "radar": {"max_dist": float(core.fan.max_dist), "n_rays": n_rays},
            "utc_start": _utc_stamp(),
        }
        self._capture(env)  # initial row (reference stores the reset state)

    def on_step(self, env) -> None:
        self._capture(env)

    def _capture(self, env) -> None:
        state = env.state
        a = self._arrays
        a["states"].add_row(np.asarray(state.vehicle))
        a["states_dot"].add_row(np.asarray(state.state_dot))
        a["u"].add_row(np.asarray(state.u))
        a["nu_c"].add_row(np.asarray(state.nu_c))
        pos, end = self._radar_fn(state)
        a["radar_pos"].add_row(np.asarray(pos))
        a["radar_end_pos"].add_row(np.asarray(end))
        a["cum_rewards"].add_row(np.asarray(state.cum_reward_arr))
        a["rewards"].add_row(np.asarray(env.last_info.get("reward_arr",
                                                          np.zeros(N_REWARDS))))
        a["observation"].add_row(np.asarray(getattr(env, "last_obs",
                                                    np.zeros(env.core.n_observations))))

    # -- stacked-trajectory capture (jitted rollout path) -------------------
    @classmethod
    def from_trajectory(cls, core, state0, traj: Dict[str, np.ndarray],
                        episode: int = 0, title: str = "rollout"):
        """Build a storage from a stacked (T, ...) trajectory pytree as
        produced by a lax.scan rollout — the TPU-idiomatic capture path."""
        self = cls()
        self.storage = {
            "vehicle": {"name": core.config.vehicle,
                        "safety_radius": float(core.config.safety_radius),
                        "u_bound": np.asarray(core.u_bound)},
            "shapes": _shapes_from_state(state0),
            "goal_location": np.asarray(state0.goal),
            "heading_goal": float(state0.heading_goal),
            "episode": int(episode),
            "step_size": float(core.config.t_step_size),
            "title": title,
            "env_id": None,
            "meta_data_reward": core.meta_data_reward,
            "meta_data_observation": core.meta_data_observation,
            "radar": {"max_dist": float(core.fan.max_dist),
                      "n_rays": core.fan.n_rays},
            "utc_start": _utc_stamp(),
        }
        for k, v in traj.items():
            self.storage[k] = np.asarray(v)
        return self

    # -- persistence ----------------------------------------------------------
    def file_name(self, path_folder: str, index: Optional[int] = None) -> str:
        """<utc>__<title>__EPISODE_<n>[__process_<i>]__.pkl
        (datastorage.py:243-247 incl. the remus per-process suffix)."""
        s = self.storage
        proc = f"__process_{index}" if index is not None else ""
        title = str(s["title"]).replace(" ", "_")
        return os.path.join(
            path_folder,
            f"{s['utc_start']}__{title}__EPISODE_{s['episode']}{proc}__.pkl")

    def finalize(self) -> None:
        """Materialize the live capture arrays into the storage dict (also
        used by VideoRecorder before rendering an unsaved episode)."""
        assert self.storage is not None, "nothing recorded"
        for k, arr in self._arrays.items():
            self.storage[k] = arr.get_data()

    def save(self, file_name: Optional[str] = None,
             path_folder: Optional[str] = None,
             index: Optional[int] = None) -> str:
        self.finalize()
        if file_name is None:
            path_folder = path_folder or os.getcwd()
            os.makedirs(path_folder, exist_ok=True)
            file_name = self.file_name(path_folder, index)
        with open(file_name, "wb") as f:
            pickle.dump(self.storage, f)
        self.file_save_name = file_name
        return file_name

    @classmethod
    def load(cls, file_name: str) -> "EpisodeDataStorage":
        self = cls()
        with open(file_name, "rb") as f:
            self.storage = pickle.load(f)
        self.file_save_name = file_name
        return self

    # -- accessors (datastorage.py:347-472) ------------------------------------
    def _get(self, key):
        if self.storage is not None and key in self.storage:
            return self.storage[key]
        return self._arrays[key].get_data()

    @property
    def states(self) -> np.ndarray:
        return self._get("states")

    @property
    def positions(self) -> np.ndarray:
        return self.states[:, 0:3]

    @property
    def attitudes(self) -> np.ndarray:
        return self.states[:, 3:6]

    @property
    def u(self) -> np.ndarray:
        return self._get("u")

    @property
    def observations(self) -> np.ndarray:
        return self._get("observation")

    @property
    def rewards(self) -> np.ndarray:
        return self._get("rewards")

    @property
    def cum_rewards(self) -> np.ndarray:
        return self._get("cum_rewards")

    @property
    def nu_c(self) -> np.ndarray:
        return self._get("nu_c")

    @property
    def step_size(self) -> float:
        return float(self.storage["step_size"])

    # -- plot wrappers ------------------------------------------------------
    def plot_episode_states(self, **kw):
        from .plotutils import EpisodeVisualization

        return EpisodeVisualization(self).plot_episode_states(**kw)

    def plot_rewards(self, **kw):
        from .plotutils import EpisodeVisualization

        return EpisodeVisualization(self).plot_rewards(**kw)

    def plot_episode_animation(self, **kw):
        from .plotutils import EpisodeVisualization

        return EpisodeVisualization(self).plot_episode_animation(**kw)


class FullDataStorage:
    """Whole-run storage: cumulative reward vector + final info per episode
    (datastorage.py:21-118)."""

    def __init__(self):
        self.cum_rewards = ArrayList(N_REWARDS)
        self.infos: List[Dict[str, Any]] = []
        self.storage: Optional[Dict[str, Any]] = None
        self.path_folder = os.getcwd()
        self.title = "run"
        self.env_id = None

    def set_up_full_storage(self, path_folder: str = None, title: str = "run",
                            env_id: Optional[str] = None) -> None:
        self.path_folder = path_folder or os.getcwd()
        self.title = title
        self.env_id = env_id

    def update(self, cum_reward_arr, info: Dict[str, Any]) -> None:
        self.cum_rewards.add_row(np.asarray(cum_reward_arr))
        self.infos.append(dict(info))

    def update_from_env(self, env) -> None:
        self.update(np.asarray(env.state.cum_reward_arr), env.last_info)

    def file_name(self) -> str:
        title = str(self.title).replace(" ", "_")
        return os.path.join(self.path_folder,
                            f"{_utc_stamp()}__{title}__FULL_DATA_STORAGE__.pkl")

    def save(self, file_name: Optional[str] = None) -> str:
        os.makedirs(self.path_folder, exist_ok=True)
        file_name = file_name or self.file_name()
        self.storage = {"cum_rewards": self.cum_rewards.get_data(),
                        "infos": self.infos, "title": self.title,
                        "env_id": self.env_id}
        with open(file_name, "wb") as f:
            pickle.dump(self.storage, f)
        return file_name

    @classmethod
    def load(cls, file_name: str) -> "FullDataStorage":
        self = cls()
        with open(file_name, "rb") as f:
            self.storage = pickle.load(f)
        for row in self.storage["cum_rewards"]:
            self.cum_rewards.add_row(row)
        self.infos = list(self.storage.get("infos", []))
        self.title = self.storage.get("title", "run")
        return self

    def plot_rewards(self, **kw):
        from .plotutils import plot_full_rewards

        return plot_full_rewards(self, **kw)
