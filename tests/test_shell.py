"""Shell-layer tests: datastorage, plotting, train/predict orchestration,
checkpointing, evaluation, callbacks (reference L5/L7 roles)."""
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gym_dockauv_tpu as gdt
from gym_dockauv_tpu.config.env_config import EnvConfig, PREDICT_CONFIG
from gym_dockauv_tpu.rl import PPO, SAC
from gym_dockauv_tpu.rl.callbacks import (
    CallbackList,
    CheckpointCallback,
    EvalCallback,
)
from gym_dockauv_tpu.rl.evaluation import evaluate_policy
from gym_dockauv_tpu.train import (
    make_gym,
    manual_control,
    post_analysis_directory,
    predict,
    train,
)
from gym_dockauv_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from gym_dockauv_tpu.utils.datastorage import (
    ArrayList,
    EpisodeDataStorage,
    FullDataStorage,
)

ENV = "SimpleDocking3d-v0"


def _short_episode_env(seed=0, max_timesteps=20):
    cfg = EnvConfig(max_timesteps=max_timesteps)
    env = gdt.make(ENV, env_config=cfg)
    env.reset(seed=seed)
    return env


# -- ArrayList / storage -----------------------------------------------------
def test_arraylist_growth():
    al = ArrayList(3)
    for i in range(450):  # force two growth reallocations (100 -> 400 -> 1600)
        al.add_row([i, i + 1, i + 2])
    data = al.get_data()
    assert data.shape == (450, 3)
    np.testing.assert_allclose(data[449], [449, 450, 451])


def test_episode_storage_capture_and_roundtrip(tmp_path):
    env = _short_episode_env()
    env.episode_data_storage = EpisodeDataStorage()
    env.reset(seed=1)
    T = 15
    for _ in range(T):
        _, _, done, _ = env.step(np.zeros(6, np.float32))
        if done:
            break
    path = env.episode_data_storage.save(path_folder=str(tmp_path))
    assert os.path.exists(path) and "EPISODE" in path

    st = EpisodeDataStorage.load(path)
    assert st.states.shape[0] >= T  # initial row + T steps
    assert st.states.shape[1] == 12
    assert st.u.shape[1] == 6
    assert st.rewards.shape[1] == 13
    assert st.observations.shape[1] == 36
    assert st.storage["radar"]["n_rays"] == 63
    assert st.storage["step_size"] == pytest.approx(0.1)
    # radar end points within max_dist of origin rows
    end = st.storage["radar_end_pos"]
    pos = st.storage["radar_pos"]
    d = np.linalg.norm(end - pos[:, None, :], axis=-1)
    assert np.all(d <= 10.0 + 1e-4)


def test_episode_storage_process_index_filename(tmp_path):
    env = _short_episode_env()
    env.episode_data_storage = EpisodeDataStorage()
    env.reset(seed=2)
    env.step(np.zeros(6, np.float32))
    path = env.episode_data_storage.save(path_folder=str(tmp_path), index=3)
    assert "__process_3" in path  # remus-family naming (datastorage.py:247)


def test_full_data_storage_roundtrip(tmp_path):
    fds = FullDataStorage()
    fds.set_up_full_storage(str(tmp_path), title="t run")
    for i in range(7):
        fds.update(np.full(13, float(i)), {"r": float(i), "goal": i % 2 == 0})
    path = fds.save()
    assert "FULL_DATA_STORAGE" in path
    fds2 = FullDataStorage.load(path)
    assert fds2.cum_rewards.get_data().shape == (7, 13)
    assert len(fds2.infos) == 7


# -- plots -----------------------------------------------------------------
def test_visualization_plots(tmp_path):
    env = _short_episode_env()
    env.episode_data_storage = EpisodeDataStorage()
    env.reset(seed=3)
    for _ in range(10):
        env.step(np.asarray(env.action_space.sample()))
    path = env.episode_data_storage.save(path_folder=str(tmp_path))
    from gym_dockauv_tpu.utils.plotutils import EpisodeVisualization

    viz = EpisodeVisualization(path)
    for name, fn in [("states", viz.plot_episode_states),
                     ("rewards", viz.plot_rewards),
                     ("obs", viz.plot_episode_observations),
                     ("u", viz.plot_u)]:
        out = fn(save_path=str(tmp_path / f"{name}.png"))
        assert os.path.exists(out)


def test_render_env_smoke():
    env = _short_episode_env()
    env.reset(seed=4)
    for _ in range(3):
        env.step(np.zeros(6, np.float32))
        anim = env.render()
    assert anim is not None
    anim.close()


def test_animation_export(tmp_path):
    env = _short_episode_env()
    env.episode_data_storage = EpisodeDataStorage()
    env.reset(seed=5)
    for _ in range(5):
        env.step(np.zeros(6, np.float32))
    path = env.episode_data_storage.save(path_folder=str(tmp_path))
    from gym_dockauv_tpu.utils.plotutils import EpisodeVisualization

    out = EpisodeVisualization(path).plot_episode_animation(
        save_path=str(tmp_path / "anim"), fps=5)
    assert os.path.exists(out) and out.endswith((".gif", ".mp4"))


# -- orchestration -------------------------------------------------------------
def test_train_chunked_saves_and_full_storage(tmp_path):
    model = train(ENV, total_timesteps=128, MODEL=PPO,
                  model_save_path=str(tmp_path / "model"),
                  agent_hyper_parameter=dict(n_steps=16, batch_size=32),
                  timesteps_per_save=64, vector_env=2, seed=0, verbose=0)
    assert model.num_timesteps == 128
    files = os.listdir(tmp_path)
    assert any(f.startswith("model_64") for f in files)
    assert any(f.startswith("model_128") for f in files)
    assert any("FULL_DATA_STORAGE" in f for f in files)


def test_predict_and_post_analysis(tmp_path):
    # train briefly, save, then predict with episode storage + analysis
    m = PPO(env=ENV, n_envs=2, n_steps=16, batch_size=16, seed=0)
    m.learn(total_timesteps=32)
    mp = str(tmp_path / "m")
    m.save(mp)
    cfg = PREDICT_CONFIG().replace(max_timesteps=15,
                                   save_path_folder=str(tmp_path / "pred"))
    results = predict(ENV, mp, MODEL=PPO, n_episodes=2, env_config=cfg,
                      seed=0)
    assert len(results) == 2 and all(r["steps"] > 0 for r in results)
    pkls = [f for f in os.listdir(tmp_path / "pred") if f.endswith(".pkl")]
    assert len(pkls) == 2
    produced = post_analysis_directory(str(tmp_path / "pred"))
    assert len(produced) >= 8  # 4 plots per episode
    for p in produced:
        assert os.path.exists(p)


def test_manual_control_scripted():
    cfg = EnvConfig(max_timesteps=50)
    results = manual_control(ENV, env_config=cfg, n_episodes=1,
                             action_source=lambda step: np.zeros(6),
                             render=False, max_steps=10)
    assert results[0]["steps"] == 10


def test_make_gym_validates():
    with pytest.raises(KeyError):
        make_gym("NotAnEnv-v0")


# -- checkpoint ---------------------------------------------------------------
def test_checkpoint_exact_resume(tmp_path):
    kw = dict(env=ENV, n_envs=2, learning_starts=8, buffer_size=256,
              batch_size=16, seed=0)
    m = SAC(**kw)
    m.learn(total_timesteps=32)
    ck = save_checkpoint(m, str(tmp_path))
    assert latest_checkpoint(str(tmp_path)) == ck
    m.learn(total_timesteps=16, reset_num_timesteps=False)
    after_a = jax.device_get(m._state.actor_params)

    m2 = SAC(**kw)
    load_checkpoint(m2, str(tmp_path))
    assert m2.num_timesteps == 32
    # replay buffer contents restored exactly
    np.testing.assert_allclose(np.asarray(m2._state.replay.obs),
                               np.asarray(jax.device_get(m2._state.replay.obs)))
    m2.learn(total_timesteps=16, reset_num_timesteps=False)
    after_b = jax.device_get(m2._state.actor_params)
    for a, b in zip(jax.tree_util.tree_leaves(after_a),
                    jax.tree_util.tree_leaves(after_b)):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_checkpoint_rolling_keep(tmp_path):
    m = PPO(env=ENV, n_envs=2, n_steps=8, batch_size=8, seed=0)
    for i in range(5):
        m.num_timesteps = i  # distinct file names
        save_checkpoint(m, str(tmp_path), keep=2)
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".pkl")]) == 2


# -- evaluation + callbacks ------------------------------------------------------
def test_evaluate_policy():
    cfg = EnvConfig(max_timesteps=15)
    from gym_dockauv_tpu.envs.core import make_env as mk

    m = PPO(env=mk(ENV, cfg), n_envs=2, n_steps=8, batch_size=8, seed=0)
    mean_r, std_r = evaluate_policy(m, n_eval_episodes=4, seed=1)
    assert np.isfinite(mean_r) and std_r >= 0
    rs, ls = evaluate_policy(m, n_eval_episodes=4, seed=1,
                             return_episode_rewards=True)
    assert len(rs) == 4 and all(1 <= l <= 16 for l in ls)


def test_callbacks(tmp_path):
    m = PPO(env=ENV, n_envs=2, n_steps=8, batch_size=8, seed=0)
    cb = CallbackList([
        CheckpointCallback(save_freq=16, save_path=str(tmp_path / "ck")),
        EvalCallback(eval_freq=10_000_000),  # never fires in this run
    ])
    m.learn(total_timesteps=48, callback=cb)
    saved = os.listdir(tmp_path / "ck")
    assert len(saved) >= 2


# -- debug utilities --------------------------------------------------------------
def test_debug_stats_and_landscape(tmp_path):
    from gym_dockauv_tpu import debug

    fds = FullDataStorage()
    fds.set_up_full_storage(str(tmp_path), title="run")
    for i in range(20):
        fds.update(np.full(13, float(i) / 13), {"goal": i > 10,
                                                "collision": False})
    fds.save()
    stats = debug.training_statistics(str(tmp_path))
    assert len(stats) == 1 and stats[0]["episodes"] == 20
    assert stats[0]["success_rate"] == pytest.approx(9 / 20)
    outs = debug.plot_reward_landscape(save_dir=str(tmp_path))
    for o in outs:
        assert os.path.exists(o)


def test_train_curriculum_stages(tmp_path):
    from gym_dockauv_tpu.train import train_curriculum

    m = train_curriculum(
        ENV,
        stages=[({"dist_goal_reached_tol": 3.0}, 32), ({}, 32)],
        MODEL=PPO,
        model_save_path=str(tmp_path / "cur"),
        agent_hyper_parameter=dict(n_steps=16, batch_size=32),
        vector_env=2, seed=0, verbose=0)
    assert m.num_timesteps == 64
    # the final stage runs at the scenario's true tolerance
    assert m.core.config.dist_goal_reached_tol == pytest.approx(0.5)
    files = os.listdir(tmp_path)
    assert any("cur_stage0" in f for f in files)
    assert any("cur_stage1" in f for f in files)


def test_train_interval_datastorage_capture(tmp_path):
    """train() must leave every-Nth-episode EPISODE pickles in the config's
    save folder (docking3d.py:319-322 interval_datastorage) and
    post_analysis_directory must render them."""
    from gym_dockauv_tpu.config.env_config import TRAIN_CONFIG

    cfg = TRAIN_CONFIG().replace(max_timesteps=20, interval_datastorage=2,
                                 save_path_folder=str(tmp_path / "ep"))
    model = train(ENV, total_timesteps=256, MODEL=PPO,
                  model_save_path=str(tmp_path / "model"),
                  agent_hyper_parameter=dict(n_steps=16, batch_size=32),
                  env_config=cfg, vector_env=2, seed=0, verbose=0)
    # 20-step episodes, 2 envs, 256 steps -> ~25 episodes; captures gated
    # to one per iteration (8 iterations)
    pkls = [f for f in os.listdir(tmp_path / "ep") if "EPISODE" in f]
    assert 1 <= len(pkls) <= 8, pkls
    eds = EpisodeDataStorage.load(str(tmp_path / "ep" / pkls[0]))
    T = eds.states.shape[0]
    assert T >= 2 and eds.u.shape[0] == T and eds.observations.shape[0] == T
    assert np.all(np.isfinite(eds.states))
    produced = post_analysis_directory(str(tmp_path / "ep"))
    assert len(produced) >= 4 and all(os.path.exists(p) for p in produced)


def test_api_docs_generator(tmp_path):
    """docs/api autogen (Sphinx docsrc/ counterpart) stays runnable."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import gen_api_docs

    written = gen_api_docs.generate(out=str(tmp_path))
    assert len(written) > 40
    idx = (tmp_path / "index.md").read_text()
    assert "gym_dockauv_tpu.ops.rays" in idx
    page = (tmp_path / "gym_dockauv_tpu_ops_rays.md").read_text()
    assert "Masked, batched ray-casting" in page
