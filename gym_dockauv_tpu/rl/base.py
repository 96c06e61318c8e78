"""Algorithm base class.

Covers the role of stable_baselines3/common/base_class.py:56-818 (env
wiring, seeding, the learn loop skeleton, logging cadence, save/load,
predict) — but where SB3 alternates host-side env stepping with device-side
gradient steps, every subclass here exposes one jitted `_iteration` that
advances the vmapped env batch AND the optimizer in a single XLA program;
the host loop only orchestrates logging/checkpoint cadence.
"""
from __future__ import annotations

import pickle
import time
from collections import deque
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.adapter import GymDockingEnv, VecDockingEnv
from ..envs.core import DockingEnv, make_env
from .common import EpisodeStats
from .logger import Logger, configure_logger, unique_tb_dir


def np_local(x) -> np.ndarray:
    """Materialize a jax.Array as numpy using only locally-addressable
    shards.  In a multi-process (multi-host) run the episode-stats outputs
    are global arrays sharded over all processes; each process absorbs the
    env lanes it owns (per-host logging), so we concatenate the local
    shards along the sharded axis instead of requiring full addressability."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable or \
            x.is_fully_replicated:
        return np.asarray(x)
    shards = {s.index: np.asarray(s.data) for s in x.addressable_shards}
    idxs = list(shards)
    axis = next((i for i in range(len(idxs[0]))
                 if any(ix[i] != idxs[0][i] for ix in idxs)), None)
    if axis is None:  # replicated over the local devices
        return next(iter(shards.values()))
    order, seen = [], set()
    for ix in sorted(idxs, key=lambda ix: ix[axis].start or 0):
        start = ix[axis].start
        if start not in seen:  # dedup replicas (e.g. model-axis copies)
            seen.add(start)
            order.append(shards[ix])
    return np.concatenate(order, axis=axis)


def resolve_env(env, n_envs: Optional[int] = None):
    """Accept env id string / DockingEnv / adapter instances; return
    (core, n_envs, env_id)."""
    if isinstance(env, str):
        return make_env(env), n_envs or 1, env
    if isinstance(env, DockingEnv):
        return env, n_envs or 1, None
    if isinstance(env, VecDockingEnv):
        return env.core, env.num_envs, env.env_id
    if isinstance(env, GymDockingEnv):
        return env.core, n_envs or 1, env.env_id
    raise TypeError(f"Unsupported env type: {type(env)!r}")


class BaseAlgorithm:
    """Shared scaffolding; subclasses set `config_cls`, implement
    `_setup_model`, `_iteration(state, progress_remaining) -> (state,
    metrics, EpisodeStats)` and `_predict_fn`."""

    config_cls = None  # subclass hyper-parameter dataclass

    def __init__(self, policy: str = "MlpPolicy", env=None, config=None,
                 n_envs: Optional[int] = None, seed: Optional[int] = None,
                 verbose: int = 0, tensorboard_log: Optional[str] = None,
                 device: str = "auto", **hyper):
        assert policy in ("MlpPolicy",), "only MlpPolicy exists for these envs"
        cfg = config or self.config_cls()
        # SB3 ctor sugar: train_freq=(1, "episode") tuples map onto the
        # (train_freq, train_freq_unit) config fields (td3/td3.py:73)
        if isinstance(hyper.get("train_freq"), (tuple, list)):
            freq, unit = hyper["train_freq"]
            hyper = {**hyper, "train_freq": int(freq),
                     "train_freq_unit": str(unit)}
        if hyper:
            cfg = cfg.replace(**hyper)
        if (getattr(cfg, "gradient_steps", 0) < 0
                and getattr(cfg, "train_freq_unit", "step") != "episode"):
            raise ValueError("gradient_steps=-1 (one update per collected "
                             "step) requires train_freq_unit='episode'")
        if getattr(cfg, "tensorboard_log", None) and tensorboard_log is None:
            tensorboard_log = cfg.tensorboard_log
        self.cfg = cfg
        if seed is None:
            seed = getattr(cfg, "seed", None)
        self.policy = policy
        self.core, self.n_envs, self.env_id = resolve_env(env, n_envs)
        self.verbose = verbose
        self.tensorboard_log = tensorboard_log
        self.device = device  # accepted for API parity; JAX picks the backend
        self.seed = seed
        self.key = jax.random.PRNGKey(0 if seed is None else seed)
        if seed is not None:
            np.random.seed(seed)
        self.num_timesteps = 0
        self.episode_count = 0  # finished episodes across the whole run
        self.ep_info_buffer: deque = deque(maxlen=100)
        self._logger: Optional[Logger] = None
        self._state = None  # subclass train-state pytree
        self._iteration_jit = None
        self._predict_jit = None
        self._eval_cache: Dict[Any, Any] = {}
        # Set by parallel.sharded.shard_algorithm: mesh axis for data-parallel
        # gradient pmean inside the jitted iteration.
        self.axis_name: Optional[str] = None
        self._setup_model()

    # -- subclass hooks ----------------------------------------------------
    def _setup_model(self) -> None:
        raise NotImplementedError

    def _iteration(self, state, progress_remaining):
        raise NotImplementedError

    def _run_iteration(self, progress_remaining: float):
        """One learn-loop turn: returns (metrics, ep_stats, steps_advanced).
        Default = the fused jitted `_iteration` (fixed step count);
        OffPolicyAlgorithm overrides for episode-unit train_freq, where the
        step count is data-dependent."""
        self._state, metrics, ep_stats = self._iteration_jit(
            self._state, jnp.asarray(progress_remaining, jnp.float32))
        return metrics, ep_stats, self._steps_per_iteration

    @property
    def _steps_per_iteration(self) -> int:
        raise NotImplementedError

    # -- logger ------------------------------------------------------------
    @property
    def logger(self) -> Logger:
        if self._logger is None:
            self._logger = configure_logger(None, ("stdout",) if self.verbose else ())
        return self._logger

    def set_logger(self, logger: Logger) -> None:
        self._logger = logger

    def _configure_learn_logger(self, tb_log_name: str, reset_num_timesteps: bool):
        if self.tensorboard_log is not None and self._logger is None:
            folder = unique_tb_dir(self.tensorboard_log, tb_log_name)
            fmts = ("stdout", "csv", "tensorboard") if self.verbose else ("csv", "tensorboard")
            self._logger = configure_logger(folder, fmts, tb_log_name)

    # -- learn loop ----------------------------------------------------------
    def learn(self, total_timesteps: int, callback=None, log_interval: int = 1,
              tb_log_name: Optional[str] = None, reset_num_timesteps: bool = True,
              progress_bar: bool = False):
        if reset_num_timesteps:
            restarting = getattr(self, "_ever_learned", False)
            self.num_timesteps = 0
            self.ep_info_buffer.clear()
            if restarting and self._state is not None:
                # SB3 _setup_learn semantics: fresh episodes + (for
                # off-policy) a re-run of the learning_starts warmup — the
                # device-side num_ts counter gates should_train, so it must
                # follow the host reset.
                self._refresh_env_states()
                if hasattr(self._state, "num_ts"):
                    self._state = self._state.replace(
                        num_ts=jnp.zeros((), jnp.int32))
        self._ever_learned = True
        self._configure_learn_logger(tb_log_name or type(self).__name__,
                                     reset_num_timesteps)
        target = self.num_timesteps + total_timesteps if not reset_num_timesteps \
            else total_timesteps
        if self._iteration_jit is None:
            self._iteration_jit = jax.jit(self._iteration)
        start_t = time.perf_counter()
        start_steps = self.num_timesteps
        it = 0
        if callback is not None and hasattr(callback, "init_callback"):
            callback.init_callback(self)
        while self.num_timesteps < target:
            progress_remaining = 1.0 - self.num_timesteps / max(target, 1)
            metrics, ep_stats, advanced = self._run_iteration(
                progress_remaining)
            self.num_timesteps += advanced
            it += 1
            self._absorb_episode_stats(ep_stats)
            if callback is not None:
                cont = callback.on_step(self) if hasattr(callback, "on_step") else callback(self)
                if cont is False:
                    break
            if log_interval and it % log_interval == 0:
                self._dump_logs(metrics, start_t, start_steps)
        return self

    def _absorb_episode_stats(self, ep_stats: EpisodeStats) -> None:
        dones = np_local(ep_stats.dones)
        if not dones.any():
            return
        self.episode_count += int(dones.sum())
        rs = np_local(ep_stats.returns)[dones]
        ls = np_local(ep_stats.lengths)[dones]
        gs = np_local(ep_stats.goal_reached)[dones]
        cs = np_local(ep_stats.collision)[dones]
        cum = np_local(ep_stats.cum_reward_arr)[dones]
        fds = getattr(self, "full_data_storage", None)
        for r, l, g, c, cr in zip(rs, ls, gs, cs, cum):
            info = {"r": float(r), "l": int(l), "goal": bool(g),
                    "collision": bool(c)}
            self.ep_info_buffer.append(info)
            if fds is not None:  # FullDataStorage role (datastorage.py:55-75)
                fds.update(cr, info)

    def _dump_logs(self, metrics: Dict[str, Any], start_t: float, start_steps: int):
        log = self.logger
        if self.ep_info_buffer:
            log.record("rollout/ep_rew_mean",
                       float(np.mean([e["r"] for e in self.ep_info_buffer])))
            log.record("rollout/ep_len_mean",
                       float(np.mean([e["l"] for e in self.ep_info_buffer])))
            log.record("rollout/success_rate",
                       float(np.mean([e["goal"] for e in self.ep_info_buffer])))
        elapsed = max(time.perf_counter() - start_t, 1e-8)
        log.record("time/fps", int((self.num_timesteps - start_steps) / elapsed))
        log.record("time/total_timesteps", self.num_timesteps)
        for k, v in metrics.items():
            log.record(f"train/{k}", float(np.asarray(v)))
        log.dump(self.num_timesteps)

    # -- inference -----------------------------------------------------------
    def _predict_fn(self, params, obs, deterministic, key):
        raise NotImplementedError

    def _inference_params(self):
        raise NotImplementedError

    def predict(self, observation, state=None, episode_start=None,
                deterministic: bool = False):
        """SB3 predict surface (base_class.py:601-648): accepts a single obs
        or a batch; returns (actions, state)."""
        obs = np.asarray(observation, np.float32)
        single = obs.ndim == 1
        if single:
            obs = obs[None]
        self.key, sub = jax.random.split(self.key)
        if self._predict_jit is None:
            self._predict_jit = jax.jit(self._predict_fn, static_argnums=(2,))
        act = self._predict_jit(self._inference_params(), jnp.asarray(obs),
                                bool(deterministic), sub)
        act = np.asarray(act)
        return (act[0], state) if single else (act, state)

    # -- persistence -----------------------------------------------------------
    def _config_from_dict(self, d: Dict[str, Any]):
        """Rebuild the config dataclass from a pickled dict (tuple-field
        lists come back as lists)."""
        return self.config_cls(**{
            k: tuple(v) if isinstance(v, list) else v for k, v in d.items()})

    def _save_payload(self) -> Dict[str, Any]:
        raise NotImplementedError

    def _load_payload(self, payload: Dict[str, Any]) -> None:
        raise NotImplementedError

    def save(self, path: str) -> None:
        """Model snapshot (policy/optimizer params + config), SB3 save role
        (base_class.py:680-759).  Full training state incl. replay buffer and
        env states goes through utils.checkpoint instead.  cloudpickle is
        used so schedule closures in the config survive (SB3 does the
        same, save_util.py)."""
        import cloudpickle

        if not path.endswith(".zip") and not path.endswith(".pkl"):
            path = path + ".zip"  # SB3 appends .zip; we keep the convention
        payload = {
            "algo": type(self).__name__,
            "env_id": self.env_id,
            "n_envs": self.n_envs,
            "num_timesteps": self.num_timesteps,
            "seed": self.seed,
        }
        payload.update(jax.device_get(self._save_payload()))
        with open(path, "wb") as f:
            cloudpickle.dump(payload, f)

    @classmethod
    def load(cls, path: str, env=None, n_envs: Optional[int] = None, **kwargs):
        """Rebuild from a save() snapshot.  Hyper-parameter kwargs OVERRIDE
        the pickled config (SB3 load semantics — custom kwargs win): the
        model is constructed with the merged config, then the saved params
        are applied on top."""
        import dataclasses as _dc

        for candidate in (path, path + ".zip", path + ".pkl"):
            try:
                with open(candidate, "rb") as f:
                    payload = pickle.load(f)
                break
            except FileNotFoundError:
                continue
        else:
            raise FileNotFoundError(path)
        if env is None:
            env = payload["env_id"]
            if env is None:
                raise ValueError(
                    "checkpoint has no env_id (trained on a bare DockingEnv)"
                    " — pass env= explicitly")
        cfg_fields = {f.name for f in _dc.fields(cls.config_cls)}
        hyper = {k: kwargs.pop(k) for k in list(kwargs) if k in cfg_fields}
        model = cls.__new__(cls)
        saved_cfg = model._config_from_dict(payload["config"]) \
            if "config" in payload else cls.config_cls()
        if hyper:
            saved_cfg = saved_cfg.replace(**hyper)
        model._pre_load(payload)
        kwargs = model._consume_ctor_kwargs(kwargs)  # after _pre_load: wins
        BaseAlgorithm.__init__(model, env=env, config=saved_cfg,
                               n_envs=n_envs or payload.get("n_envs"),
                               seed=payload.get("seed"), **kwargs)
        model.num_timesteps = payload.get("num_timesteps", 0)
        model._load_payload(payload)
        # sync the device-side step counter (warmup/target-refresh gating)
        # with the restored host counter (SB3 gates on num_timesteps)
        if hasattr(model._state, "num_ts"):
            model._state = model._state.replace(
                num_ts=jnp.asarray(model.num_timesteps, jnp.int32))
        return model

    def _pre_load(self, payload: Dict[str, Any]) -> None:
        """Hook for state a subclass needs BEFORE __init__/_setup_model
        (e.g. DQN's action table, HER's sampling knobs)."""

    def _consume_ctor_kwargs(self, kwargs: Dict[str, Any]) -> Dict[str, Any]:
        """Hook: pop subclass-specific constructor kwargs from a load() call
        (non-config knobs like HER's n_sampled_goal) and apply them; return
        the remaining kwargs."""
        return kwargs

    # -- data-parallel helpers (used when axis_name is set) -----------------
    def _pmean(self, tree):
        """Cross-device mean (gradients/metrics) when running sharded."""
        if self.axis_name is None:
            return tree
        return jax.lax.pmean(tree, self.axis_name)

    def _work_keys(self, state):
        """Split the replicated iteration key into a per-device working key
        (folded with the mesh position) and the next replicated key."""
        work_key, next_key = jax.random.split(state.key)
        if self.axis_name is not None:
            work_key = jax.random.fold_in(
                work_key, jax.lax.axis_index(self.axis_name))
        return work_key, next_key

    def _local_batch(self, n_local_envs: int, batch_size: int) -> int:
        """Per-shard share of a global minibatch size."""
        scale = max(self.n_envs // max(n_local_envs, 1), 1)
        assert batch_size % scale == 0, (
            f"global batch {batch_size} not divisible by {scale} shards")
        return batch_size // scale

    def get_env(self):
        return self.core

    def _refresh_env_states(self) -> None:
        """Fresh episodes of the current core inside the training state."""
        self.key, k_env = jax.random.split(self.key)
        env_states, obs = jax.jit(jax.vmap(self.core.reset))(
            jax.random.split(k_env, self.n_envs),
            jnp.zeros((self.n_envs,), jnp.int32))
        self._state = self._state.replace(env_states=env_states, last_obs=obs)

    def set_env(self, env, n_envs: Optional[int] = None) -> None:
        """Swap the training env (base_class.py set_env): spaces must match,
        env states are re-sampled from the new env, action bounds and every
        compiled function are refreshed."""
        core, n, env_id = resolve_env(env, n_envs or self.n_envs)
        assert core.n_observations == self.core.n_observations and \
            core.n_actions == self.core.n_actions, (
                "set_env requires matching observation/action spaces")
        if self._state is not None and hasattr(self._state, "replay"):
            assert n == self.n_envs, (
                "off-policy set_env cannot change n_envs (replay layout)")
        self.core, self.n_envs, self.env_id = core, n, env_id
        self._action_low = jnp.asarray(core.action_low, jnp.float32)
        self._action_high = jnp.asarray(core.action_high, jnp.float32)
        if self._state is not None:
            self._refresh_env_states()
        self._iteration_jit = None
        self._predict_jit = None
        self._eval_cache.clear()
        if self.axis_name is not None:
            # a sharded learner must stay sharded: rebuild the shard_map'd
            # iteration and re-place the (freshly reset) state on the mesh —
            # otherwise the next learn() would re-jit _iteration without
            # shard_map and the lax.pmean calls would hit an unbound axis
            mesh = getattr(self, "_mesh", None)
            assert mesh is not None, (
                "learner has axis_name set but no stored mesh; re-apply "
                "parallel.sharded.shard_algorithm after set_env")
            from ..parallel.sharded import shard_algorithm

            shard_algorithm(self, mesh=mesh, axis_name=self.axis_name)
