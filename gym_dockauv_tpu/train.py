"""Training / prediction / analysis orchestration.

Role of gym_dockauv/train.py:25-282 and the top-level mains: `train()` runs
the chunked learn/save loop, `predict()` rolls out a trained model with
optional live rendering and per-episode pickling, `post_analysis_directory`
re-plots stored pickles, `manual_control` is keyboard teleop.

Where the reference forks `vector_env` worker processes
(train.py:58-71 -> SubprocVecEnv), `train()` here passes `n_envs` straight
to the learner: the env batch is vmapped inside the jitted iteration, and
`shard=True` splits it over every visible device via the mesh
(parallel.sharded).
"""
from __future__ import annotations

import logging
import os
import time
from timeit import default_timer as timer
from typing import Optional, Type

import numpy as np

from .config.env_config import EnvConfig, PREDICT_CONFIG, REGISTRATION_DICT, \
    MANUAL_CONFIG
from .envs.adapter import GymDockingEnv
from .rl.base import BaseAlgorithm
from .rl.sac import SAC
from .utils.datastorage import EpisodeDataStorage, FullDataStorage

logger = logging.getLogger(__name__)


def make_gym(gym_env: str, env_config: Optional[EnvConfig] = None) -> GymDockingEnv:
    """Validated env construction (train.py:269-282)."""
    if gym_env not in REGISTRATION_DICT:
        raise KeyError(
            f"{gym_env!r} is not a valid env; options: {list(REGISTRATION_DICT)}")
    return GymDockingEnv(gym_env, env_config=env_config)


class IntervalEpisodeCapture:
    """In-training trajectory capture on the `interval_datastorage` cadence
    (gym_dockauv/envs/docking3d.py:319-322: the reference pickles every Nth
    TRAINING episode's full trajectory).

    The jitted training iteration never leaves the device, so instead of
    recording lanes mid-flight this rolls out ONE fresh episode with the
    current (stochastic) policy in a single jitted scan whenever the global
    finished-episode counter crosses the next interval boundary, and pickles
    it through `EpisodeDataStorage.from_trajectory` on the reference's
    filename schema.  At most one capture per learn iteration (with many
    parallel envs several boundaries can pass in one iteration — the extras
    are skipped, not queued)."""

    def __init__(self, model: BaseAlgorithm, interval: int,
                 path_folder: str, title: str, env_id: Optional[str]):
        self.model = model
        self.interval = max(int(interval), 1)
        self.path_folder = path_folder
        self.title = title
        self.env_id = env_id
        self.captured = 0
        self.saved_files = []
        self._rollout_jit = None
        self._core = None

    def init_callback(self, model):
        self.model = model

    def _build(self, model):
        import jax
        import jax.numpy as jnp

        core = model.core
        max_t = core.config.max_timesteps + 1
        snapshot = core.radar_snapshot

        def rollout(params, key, episode):
            k_env, k_act = jax.random.split(key)
            state0, obs0 = core.reset(k_env, episode)

            def row(state, res_obs, reward_arr):
                pos, end = snapshot(state)
                return {"states": state.vehicle,
                        "states_dot": state.state_dot,
                        "u": state.u, "nu_c": state.nu_c,
                        "radar_pos": pos, "radar_end_pos": end,
                        "cum_rewards": state.cum_reward_arr,
                        "rewards": reward_arr,
                        "observation": res_obs}

            def body(carry, _):
                state, obs, key = carry
                key, k = jax.random.split(key)
                action = model._predict_fn(params, obs[None], False, k)[0]
                state, res = core.step(state, action)
                return (state, res.obs, key), (
                    row(state, res.obs, res.info.reward_arr), res.done)

            _, (rows, dones) = jax.lax.scan(
                body, (state0, obs0, k_act), None, length=max_t)
            first = row(state0, obs0,
                        jnp.zeros_like(state0.cum_reward_arr))
            return state0, first, rows, dones

        self._rollout_jit = jax.jit(rollout)
        self._core = core

    def _capture(self, model):
        import jax
        import jax.numpy as jnp

        if self._rollout_jit is None or self._core is not model.core:
            self._build(model)
        model.key, k = jax.random.split(model.key)
        state0, first, rows, dones = self._rollout_jit(
            model._inference_params(), k,
            jnp.asarray(model.episode_count, jnp.int32))
        dones = np.asarray(dones)
        t_end = int(np.argmax(dones)) + 1 if dones.any() else len(dones)
        traj = {}
        for name in rows:
            stacked = np.concatenate(
                [np.asarray(first[name])[None], np.asarray(rows[name])[:t_end]])
            traj[name] = stacked
        eds = EpisodeDataStorage.from_trajectory(
            model.core, jax.device_get(state0), traj,
            episode=model.episode_count, title=self.title)
        eds.storage["env_id"] = self.env_id
        os.makedirs(self.path_folder, exist_ok=True)
        self.saved_files.append(eds.save(path_folder=self.path_folder))
        logger.debug("captured training episode %d -> %s",
                     model.episode_count, self.saved_files[-1])

    def on_step(self, model):
        due = model.episode_count // self.interval
        if due > self.captured:
            self.captured = due
            self._capture(model)
        return True


def train(gym_env: str,
          total_timesteps: int,
          MODEL: Type[BaseAlgorithm] = SAC,
          model_save_path: str = "logs/model",
          agent_hyper_parameter: Optional[dict] = None,
          env_config: Optional[EnvConfig] = None,
          tb_log_name: Optional[str] = None,
          timesteps_per_save: Optional[int] = None,
          model_load_path: Optional[str] = None,
          vector_env: int = 8,
          seed: Optional[int] = None,
          shard: bool = False,
          verbose: int = 1) -> BaseAlgorithm:
    """Chunked learn/save loop (train.py:25-103).

    `vector_env` plays the role of the reference's SubprocVecEnv worker
    count; `timesteps_per_save` checkpoints `<model_save_path>_<steps>` like
    train.py:90-100.  The full-run episode store is saved at the end
    (train.py:102 — which the reference could only do un-vectorized; here it
    always works because episode stats flow from the jitted iteration).
    """
    hyper = dict(agent_hyper_parameter or {})
    hyper.pop("device", None)  # torch knob; JAX picks the backend
    os.makedirs(os.path.dirname(model_save_path) or ".", exist_ok=True)

    # build the (possibly custom-configured) env up front so env_id is
    # preserved through save()/load()
    env_obj = make_gym(gym_env, env_config) if env_config is not None else gym_env
    if model_load_path is not None:
        model = MODEL.load(model_load_path, env=env_obj, n_envs=vector_env,
                           verbose=verbose, **hyper)
    else:
        model = MODEL(env=env_obj, n_envs=vector_env, seed=seed,
                      verbose=verbose, **hyper)

    if shard:
        from .parallel import shard_algorithm
        shard_algorithm(model)

    fds = FullDataStorage()
    fds.set_up_full_storage(
        path_folder=os.path.dirname(model_save_path) or os.getcwd(),
        title="Training Run", env_id=gym_env)
    model.full_data_storage = fds

    # every-Nth-episode trajectory pickles during training
    # (docking3d.py:319-322 interval_datastorage)
    cfg_env = model.core.config
    interval = int(getattr(cfg_env, "interval_datastorage", 0) or 0)
    capture = None
    if 0 < interval < 10 ** 8:
        capture = IntervalEpisodeCapture(
            model, interval,
            path_folder=cfg_env.save_path_folder or
            (os.path.dirname(model_save_path) or os.getcwd()),
            title=cfg_env.title, env_id=gym_env)

    chunk = timesteps_per_save or total_timesteps
    elapsed = model.num_timesteps  # resumed checkpoints count toward total
    start = timer()
    while elapsed < total_timesteps:
        n = min(chunk, total_timesteps - elapsed)
        model.learn(total_timesteps=n, tb_log_name=tb_log_name,
                    reset_num_timesteps=False, callback=capture)
        elapsed = model.num_timesteps
        model.save(f"{model_save_path}_{model.num_timesteps}")
    logger.info("Training finished: %d steps in %.1fs",
                model.num_timesteps, timer() - start)
    fds.save()
    return model


def predict(gym_env: str,
            model_path: str,
            MODEL: Type[BaseAlgorithm] = SAC,
            n_episodes: int = 5,
            render: bool = False,
            rotate_cam: bool = False,
            env_config: Optional[EnvConfig] = None,
            store_episodes: bool = True,
            seed: Optional[int] = None):
    """Deterministic rollout of n episodes (train.py:107-139) with optional
    live rendering and per-episode pickling (PREDICT_CONFIG cadence = 1)."""
    cfg = env_config or PREDICT_CONFIG()
    env = make_gym(gym_env, cfg)
    model = MODEL.load(model_path, env=gym_env)
    results = []
    for ep in range(n_episodes):
        if store_episodes:
            env.episode_data_storage = EpisodeDataStorage()
        obs = env.reset(seed=seed + ep if seed is not None else None)
        done, ep_reward, steps = False, 0.0, 0
        t0 = timer()
        while not done:
            action, _ = model.predict(obs, deterministic=True)
            obs, reward, done, info = env.step(action)
            ep_reward += reward
            steps += 1
            if render:
                env.render(rotate_cam=rotate_cam)
        if store_episodes:
            os.makedirs(cfg.save_path_folder, exist_ok=True)
            env.episode_data_storage.save(path_folder=cfg.save_path_folder)
            env.episode_data_storage = None
        results.append({"episode": ep, "reward": ep_reward, "steps": steps,
                        "goal_reached": info.get("goal_reached", False),
                        "wall_s": timer() - t0})
        logger.info("episode %d: reward %.1f, %d steps, goal=%s",
                    ep, ep_reward, steps, info.get("goal_reached"))
    return results


def post_analysis_directory(directory: str, show_full: bool = True,
                            show_episode: bool = True) -> list:
    """Re-plot every stored pickle in a directory (train.py:142-162)."""
    from .utils.plotutils import EpisodeVisualization

    produced = []
    for fname in sorted(os.listdir(directory)):
        path = os.path.join(directory, fname)
        if not fname.endswith(".pkl"):
            continue
        if "FULL_DATA_STORAGE" in fname and show_full:
            fds = FullDataStorage.load(path)
            produced.append(fds.plot_rewards(
                save_path=path.replace(".pkl", "__rewards.png")))
        elif "EPISODE" in fname and show_episode:
            viz = EpisodeVisualization(path)
            base = path.replace(".pkl", "")
            produced.append(viz.plot_episode_states(
                save_path=base + "__states.png"))
            produced.append(viz.plot_rewards(save_path=base + "__rewards.png"))
            produced.append(viz.plot_episode_observations(
                save_path=base + "__obs.png"))
            produced.append(viz.plot_u(save_path=base + "__u.png"))
    return produced


#: Default docking curriculum: shrink the goal tolerance toward the real
#: 0.5 m (env_config.py:44).  The Capsule/Obstacles scenarios put the goal
#: on the docking capsule's collision boundary, which vanilla training
#: essentially never reaches (single-digit success); annealing the
#: tolerance lifts CapsuleDocking3d to ~0.64 success at the true tolerance
#: in ~26M steps (~7 min on one chip) — see docs/performance.md.
DEFAULT_DOCKING_CURRICULUM = [
    ({"dist_goal_reached_tol": 3.0}, 6_000_000),
    ({"dist_goal_reached_tol": 1.5}, 6_000_000),
    ({"dist_goal_reached_tol": 0.8}, 6_000_000),
    ({}, 8_000_000),  # the scenario's real tolerance
]


def train_curriculum(gym_env: str,
                     stages=None,
                     MODEL: Type[BaseAlgorithm] = None,
                     model_save_path: str = "logs/model_curriculum",
                     agent_hyper_parameter: Optional[dict] = None,
                     env_config: Optional[EnvConfig] = None,
                     vector_env: int = 1024,
                     seed: Optional[int] = None,
                     verbose: int = 1) -> BaseAlgorithm:
    """Staged training over progressively harder env configs.

    Each stage is (EnvConfig override dict, steps); the learner carries its
    parameters across stages via `set_env` (spaces must match).  This is an
    addition over the reference (which trains each scenario flat); it exists
    because the precision docking scenarios need tolerance annealing.
    """
    import numpy as _np

    from .rl.ppo import PPO as _PPO

    MODEL = MODEL or _PPO
    stages = stages or DEFAULT_DOCKING_CURRICULUM
    hyper = dict(agent_hyper_parameter or {})
    hyper.pop("device", None)
    base_cfg = env_config
    model = None
    for i, (overrides, steps) in enumerate(stages):
        cfg = (base_cfg.replace(**overrides) if base_cfg is not None
               else None)
        if cfg is None and overrides:
            from .config.env_config import TRAIN_CONFIG, TRAIN_CONFIG_REMUS

            base = TRAIN_CONFIG_REMUS() if "_remus" in gym_env else TRAIN_CONFIG()
            cfg = base.replace(**overrides)
        env = make_gym(gym_env, cfg)
        if model is None:
            model = MODEL(env=env, n_envs=vector_env, seed=seed,
                          verbose=verbose, **hyper)
        else:
            model.set_env(env)
        model.learn(total_timesteps=steps, reset_num_timesteps=False)
        if model.ep_info_buffer:
            suc = float(_np.mean([e["goal"] for e in model.ep_info_buffer]))
            logger.info("curriculum stage %d (%s): %d total steps, "
                        "success %.2f", i, overrides, model.num_timesteps, suc)
        model.save(f"{model_save_path}_stage{i}")
    return model


# WASD-style 6-axis key map (train.py:240-245) for the BlueROV2 family
KEY_ACTION_MAP = {
    "w": (0, +1.0), "s": (0, -1.0),   # surge
    "a": (1, -1.0), "d": (1, +1.0),   # sway
    "q": (2, -1.0), "e": (2, +1.0),   # heave
    "j": (5, -1.0), "l": (5, +1.0),   # yaw
    "i": (4, -1.0), "k": (4, +1.0),   # pitch
    "u": (3, -1.0), "o": (3, +1.0),   # roll
}
# REMUS layout: 3 actions = (tail rudder, stern plane, propeller rpm)
KEY_ACTION_MAP_REMUS = {
    "a": (0, -1.0), "d": (0, +1.0),   # rudder
    "w": (1, -1.0), "s": (1, +1.0),   # stern plane
    "e": (2, +1.0), "q": (2, -1.0),   # throttle
}


def manual_control(gym_env: str, env_config: Optional[EnvConfig] = None,
                   n_episodes: int = 1, action_source=None, render: bool = True,
                   max_steps: Optional[int] = None):
    """Keyboard teleop (train.py:165-266).  Uses pygame when available; an
    `action_source(step) -> action` callable substitutes for headless use
    and tests."""
    cfg = env_config or MANUAL_CONFIG()
    env = make_gym(gym_env, cfg)
    n_act = env.core.n_actions
    key_map = KEY_ACTION_MAP_REMUS if n_act == 3 else KEY_ACTION_MAP

    if action_source is None:
        try:
            import pygame
        except ImportError as e:  # headless image: no pygame
            raise RuntimeError(
                "pygame is unavailable; pass action_source=callable for "
                "scripted/headless manual control") from e
        pygame.init()
        screen = pygame.display.set_mode((300, 120))
        pygame.display.set_caption("gym_dockauv_tpu manual control")

        def action_source(step):
            pygame.event.pump()
            pressed = pygame.key.get_pressed()
            act = np.zeros(n_act, np.float32)
            for k, (idx, val) in key_map.items():
                if idx < n_act and pressed[pygame.key.key_code(k)]:
                    act[idx] = val
            return act

    results = []
    for ep in range(n_episodes):
        obs = env.reset()
        done, total, step = False, 0.0, 0
        while not done:
            action = np.asarray(action_source(step), np.float32)
            lo, hi = env.action_space.low, env.action_space.high
            # neutral (no key) maps to null actuation: 0 where the bound
            # straddles zero, else the lower bound (e.g. rpm in [0, 1500])
            neutral = np.where((lo <= 0) & (hi >= 0), 0.0, lo)
            a = np.clip(action, -1, 1)
            action = np.where(a >= 0, neutral + a * (hi - neutral),
                              neutral + a * (neutral - lo)).astype(np.float32)
            obs, r, done, info = env.step(action)
            total += r
            step += 1
            if render:
                env.render(real_time=True)
            if max_steps is not None and step >= max_steps:
                break
        results.append({"episode": ep, "reward": total, "steps": step})
    return results
