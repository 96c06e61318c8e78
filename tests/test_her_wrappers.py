"""HER relabeling + env-wrapper tests."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gym_dockauv_tpu as gdt
from gym_dockauv_tpu.config.env_config import EnvConfig
from gym_dockauv_tpu.envs.wrappers import (
    Monitor,
    VecCheckNan,
    VecFrameStack,
    VecMonitor,
    VecNormalize,
)
from gym_dockauv_tpu.rl.her import HerSAC, her_replay_init

ENV = "SimpleDocking3d-v0"


# -- HER ---------------------------------------------------------------------
def test_her_buffer_stores_goal_fields():
    m = HerSAC(env=ENV, n_envs=2, learning_starts=1000, buffer_size=256,
               batch_size=16, seed=0)
    m.learn(total_timesteps=64)  # warmup only: random actions, still stores
    rb = m._state.replay
    size = int(rb.size)
    assert size == 32
    goals = np.asarray(rb.goal)[:size]
    eps = np.asarray(rb.episode_id)[:size]
    # SimpleDocking3d goal is the origin; episode ids start at 1
    np.testing.assert_allclose(goals, 0.0, atol=1e-6)
    assert np.all(eps >= 1)
    pos = np.asarray(rb.veh_pos_next)[:size]
    assert np.all(np.isfinite(pos)) and np.any(np.abs(pos) > 1.0)


def test_her_relabel_changes_reward_toward_achieved_goal():
    """A transition relabeled with its own future position as goal must see
    a higher (closer-to-goal) distance reward."""
    m = HerSAC(env=ENV, n_envs=1, learning_starts=10_000, buffer_size=512,
               batch_size=64, seed=3, her_horizon=30, n_sampled_goal=100)
    m.learn(total_timesteps=128)  # fill with random-walk episode data
    rb = m._state.replay
    key = jax.random.PRNGKey(0)
    obs, act, nobs, rew, dones = jax.jit(
        lambda rb, k: m._sample_replay(rb, k, 256))(rb, key)
    # raw rewards from the env at these states
    raw = np.asarray(rb.rewards)[: int(rb.size), 0]
    assert np.all(np.isfinite(np.asarray(rew)))
    # with relabel prob 100/101 nearly every valid sample is relabeled;
    # mean relabeled reward should exceed raw mean (goal nearer on average)
    assert float(np.asarray(rew).mean()) > float(raw.mean()) - 1e-6


def test_her_obs_relabel_consistency():
    """Relabeled obs[0] (log-scaled goal distance) must match recomputation
    from the stored pose and the new goal."""
    m = HerSAC(env=ENV, n_envs=1, learning_starts=10_000, buffer_size=128,
               batch_size=8, seed=1)
    m.learn(total_timesteps=64)
    rb = m._state.replay
    pos = jnp.asarray([[5.0, 0.0, 0.0]])
    att = jnp.zeros((1, 3))
    goal = jnp.asarray([[0.0, 0.0, 0.0]])
    obs = jnp.zeros((1, 36))
    out = m._relabel_obs(obs, pos, att, goal)
    cfg = m.core.config
    expect = 1.0 - np.log(5.0 / cfg.max_dist_from_goal) / np.log(
        cfg.dist_goal_reached_tol / cfg.max_dist_from_goal)
    np.testing.assert_allclose(float(out[0, 0]), expect, rtol=1e-5)
    # delta_psi = pi (goal behind? no: goal at -x from +x pos => psi err pi)
    np.testing.assert_allclose(abs(float(out[0, 2])), 1.0, rtol=1e-5)


def test_her_learns_smoke():
    m = HerSAC(env=ENV, n_envs=2, learning_starts=16, buffer_size=512,
               batch_size=32, seed=0)
    m.learn(total_timesteps=96)
    assert int(m._state.n_updates) > 0
    a, _ = m.predict(np.zeros(36, np.float32), deterministic=True)
    assert np.all(np.isfinite(a))


# -- wrappers --------------------------------------------------------------
def _venv(n=2, max_t=20):
    return gdt.make_vec(ENV, n, env_config=EnvConfig(max_timesteps=max_t))


def test_monitor_writes_csv(tmp_path):
    env = Monitor(gdt.make(ENV, env_config=EnvConfig(max_timesteps=5)),
                  filename=str(tmp_path / "run"))
    env.reset(seed=0)
    done = False
    while not done:
        _, _, done, info = env.step(np.zeros(6, np.float32))
    assert "episode" in info
    assert env.episode_lengths == [6]
    env.close()
    files = os.listdir(tmp_path)
    assert any(f.endswith("monitor.csv") for f in files)
    lines = open(tmp_path / files[0]).read().strip().splitlines()
    assert lines[1] == "r,l,t" and len(lines) == 3


def test_vec_monitor():
    env = VecMonitor(_venv(2, max_t=5))
    env.reset()
    for _ in range(8):
        _, _, dones, infos = env.step(np.zeros((2, 6), np.float32))
    assert len(env.ep_info_buffer) >= 2
    for ep in env.ep_info_buffer:
        assert ep["l"] == 6


def test_vec_normalize_stats_and_clip():
    env = VecNormalize(_venv(2), clip_obs=5.0)
    obs = env.reset()
    for _ in range(20):
        obs, rew, dones, _ = env.step(np.zeros((2, 6), np.float32))
    assert np.all(np.abs(obs) <= 5.0)
    assert env.obs_rms.count > 20
    assert env.ret_rms.var > 0
    # eval mode: stats frozen
    env.training = False
    c = env.obs_rms.count
    env.step(np.zeros((2, 6), np.float32))
    assert env.obs_rms.count == c


def test_vec_frame_stack():
    env = VecFrameStack(_venv(2), n_stack=3)
    obs = env.reset()
    assert obs.shape == (2, 3 * 36)
    np.testing.assert_allclose(obs[:, : 2 * 36], 0.0)  # history zero-padded
    obs2, _, _, _ = env.step(np.zeros((2, 6), np.float32))
    np.testing.assert_allclose(obs2[:, 36:72], obs[:, 72:108])  # shifted


def test_video_recorder(tmp_path):
    from gym_dockauv_tpu.envs.wrappers import VideoRecorder

    env = VideoRecorder(
        gdt.make(ENV, env_config=EnvConfig(max_timesteps=4)),
        str(tmp_path), record_video_trigger=lambda ep: ep == 2)
    for ep in range(2):
        done = False
        env.reset(seed=ep)
        while not done:
            _, _, done, _ = env.step(np.zeros(6, np.float32))
    env.close()
    assert len(env.recorded_videos) == 1  # only episode 2 triggered
    assert os.path.exists(env.recorded_videos[0])


def test_vec_check_nan():
    env = VecCheckNan(_venv(1))
    env.reset()
    with pytest.raises(ValueError, match="actions"):
        env.step(np.full((1, 6), np.nan, np.float32))
    out = env.step(np.zeros((1, 6), np.float32))
    assert np.all(np.isfinite(out[0]))


def test_her_knobs_survive_save_load(tmp_path):
    m = HerSAC(env=ENV, n_envs=2, learning_starts=8, buffer_size=256,
               batch_size=16, seed=0, n_sampled_goal=8, her_horizon=77)
    m.learn(total_timesteps=32)
    path = str(tmp_path / "her")
    m.save(path)
    m2 = HerSAC.load(path)
    assert m2.n_sampled_goal == 8 and m2.her_horizon == 77
    m3 = HerSAC.load(path, her_horizon=33)  # explicit kwarg wins
    assert m3.her_horizon == 33 and m3.n_sampled_goal == 8


def test_her_rejects_reward_set2():
    from gym_dockauv_tpu.envs.core import make_env

    core = make_env(ENV, EnvConfig(reward_set=2))
    with pytest.raises(AssertionError, match="reward_set"):
        HerSAC(env=core, n_envs=1, learning_starts=4, buffer_size=64,
               batch_size=8, seed=0)


def test_off_policy_load_syncs_device_counter(tmp_path):
    from gym_dockauv_tpu.rl import SAC

    m = SAC(env=ENV, n_envs=2, learning_starts=8, buffer_size=256,
            batch_size=16, seed=0)
    m.learn(total_timesteps=32)
    m.save(str(tmp_path / "s"))
    m2 = SAC.load(str(tmp_path / "s"))
    assert int(m2._state.num_ts) == 32  # no re-warmup on continue-training
    m2.learn(total_timesteps=8, reset_num_timesteps=False)
    assert int(m2._state.n_updates) > 0  # trained immediately, no warmup gate


# -- image periphery (vec_transpose.py + image-aware stacking) ---------------
class _ImageVecEnv:
    """Synthetic (H,W,C) image VecEnv — the reference ships VecTranspose /
    image stacking but never constructs them on the docking tasks either
    (no env emits images); a stub exercises the wrapper exactly as SB3's
    own tests do."""

    def __init__(self, n_envs=2, shape=(8, 6, 3)):
        from gym_dockauv_tpu.envs.adapter import Box

        self.num_envs = n_envs
        self.shape = shape
        self.observation_space = Box(np.zeros(shape, np.float32),
                                     np.ones(shape, np.float32))
        self.action_space = Box(-np.ones(2, np.float32),
                                np.ones(2, np.float32))
        self.t = 0

    def _obs(self):
        base = np.arange(np.prod(self.shape), dtype=np.float32).reshape(
            self.shape) + self.t
        return np.stack([base + i for i in range(self.num_envs)])

    def reset(self):
        self.t = 0
        return self._obs()

    def step(self, actions):
        self.t += 1
        infos = [{} for _ in range(self.num_envs)]
        if self.t == 3:  # exercise terminal_observation pass-through
            infos[0]["terminal_observation"] = self._obs()[0]
        return (self._obs(), np.zeros(self.num_envs, np.float32),
                np.zeros(self.num_envs, bool), infos)

    def close(self):
        pass


def test_vec_transpose_image():
    from gym_dockauv_tpu.envs.wrappers import VecTransposeImage

    env = VecTransposeImage(_ImageVecEnv())
    assert env.observation_space.shape == (3, 8, 6)
    obs = env.reset()
    assert obs.shape == (2, 3, 8, 6)
    raw = env.venv._obs()
    np.testing.assert_array_equal(obs, np.transpose(raw, (0, 3, 1, 2)))
    for _ in range(3):
        obs, _, _, infos = env.step(np.zeros((2, 2), np.float32))
    # terminal_observation transposed too (vec_transpose.py:84-95)
    assert infos[0]["terminal_observation"].shape == (3, 8, 6)


def test_vec_transpose_dict_and_skip():
    from gym_dockauv_tpu.envs.adapter import Box
    from gym_dockauv_tpu.envs.wrappers import VecTransposeImage

    base = _ImageVecEnv()
    base.observation_space = {
        "img": base.observation_space,
        "vec": Box(-np.ones(4, np.float32), np.ones(4, np.float32))}
    base_obs = base._obs()
    base.reset = lambda: {"img": base_obs, "vec": np.zeros((2, 4))}
    env = VecTransposeImage(base)
    obs = env.reset()
    assert obs["img"].shape == (2, 3, 8, 6)
    assert obs["vec"].shape == (2, 4)  # non-image leaves untouched
    assert env.observation_space["img"].shape == (3, 8, 6)
    skipped = VecTransposeImage(_ImageVecEnv(), skip=True)
    assert skipped.reset().shape == (2, 8, 6, 3)  # GH#671 skip semantics


def test_vec_frame_stack_image_channels():
    """Image obs stack along the channel axis, not the flat feature axis
    (stacked_observations.py:59-80)."""
    from gym_dockauv_tpu.envs.wrappers import (VecFrameStack,
                                               VecTransposeImage)

    # channels-last (H,W,C): stack on the last axis
    env = VecFrameStack(_ImageVecEnv(), n_stack=2)
    obs = env.reset()
    assert obs.shape == (2, 8, 6, 6)
    assert env.observation_space.shape == (8, 6, 6)
    np.testing.assert_allclose(obs[..., :3], 0.0)  # zero history
    # channels-first after transpose: stack on the channel axis
    env_cf = VecFrameStack(VecTransposeImage(_ImageVecEnv()), n_stack=2)
    obs = env_cf.reset()
    assert obs.shape == (2, 6, 8, 6)
    assert env_cf.observation_space.shape == (6, 8, 6)
    obs2, _, _, _ = env_cf.step(np.zeros((2, 2), np.float32))
    np.testing.assert_array_equal(obs2[:, :3], obs[:, 3:])  # rolled
