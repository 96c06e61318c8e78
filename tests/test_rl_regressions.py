"""Regression tests for review findings on the RL layer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_dockauv_tpu.rl import DDPG, DQN, PPO, SAC
from gym_dockauv_tpu.rl.common import linear_schedule

ENV = "SimpleDocking3d-v0"
ENV2 = "ObstaclesDocking3d-v0"


def test_set_env_refreshes_state_and_bounds():
    m = PPO(env=ENV, n_envs=2, n_steps=8, batch_size=8, seed=0)
    m.learn(total_timesteps=16)
    old_goal = np.asarray(m._state.env_states.goal)
    m.set_env(ENV2)
    # fresh env states sampled from the NEW scenario: obstacles now valid
    assert np.asarray(m._state.env_states.cap_valid).any()
    assert m.env_id == ENV2
    m.learn(total_timesteps=16, reset_num_timesteps=False)  # recompiles fine
    del old_goal


def test_set_env_rejects_mismatched_spaces():
    m = PPO(env=ENV, n_envs=2, n_steps=8, batch_size=8, seed=0)
    with pytest.raises(AssertionError):
        m.set_env("SimpleDocking3d_remus-v0")  # 3 actions vs 6


def test_reset_num_timesteps_redoes_warmup():
    m = SAC(env=ENV, n_envs=2, learning_starts=8, buffer_size=256,
            batch_size=16, seed=0)
    m.learn(total_timesteps=32)
    assert int(m._state.num_ts) == 32
    m.learn(total_timesteps=16, reset_num_timesteps=True)
    # device counter followed the host reset: 16 steps, not 48
    assert int(m._state.num_ts) == 16 and m.num_timesteps == 16


def test_save_load_with_schedule_callable(tmp_path):
    m = PPO(env=ENV, n_envs=2, n_steps=8, batch_size=8, seed=0,
            learning_rate=linear_schedule(3e-4))
    m.learn(total_timesteps=16)
    path = str(tmp_path / "sched_model")
    m.save(path)  # cloudpickle handles the closure
    m2 = PPO.load(path)
    assert callable(m2.cfg.learning_rate)
    obs = np.zeros(36, np.float32)
    a1, _ = m.predict(obs, deterministic=True)
    a2, _ = m2.predict(obs, deterministic=True)
    np.testing.assert_allclose(a1, a2, rtol=1e-6)


def test_dqn_predict_follows_annealed_epsilon():
    m = DQN(env=ENV, n_envs=2, learning_starts=4, buffer_size=128,
            batch_size=8, exploration_fraction=0.5, seed=0)
    obs = np.zeros(36, np.float32)
    m._state = m._state.replace(exploration_rate=jnp.asarray(1.0))
    acts_hi = {tuple(m.predict(obs, deterministic=False)[0])
               for _ in range(30)}
    m._state = m._state.replace(exploration_rate=jnp.asarray(0.0))
    acts_lo = {tuple(m.predict(obs, deterministic=False)[0])
               for _ in range(30)}
    assert len(acts_hi) > 1, "eps=1.0 must explore"
    assert len(acts_lo) == 1, "eps=0.0 must be greedy (not a baked-in eps)"


def test_dqn_target_refresh_per_cycle_with_jit_iters():
    # interval=8, n_envs=2, train_freq=4 -> one crossing per cycle; with
    # jit_iters=4 the target must absorb FOUR refreshes, tracking params
    m = DQN(env=ENV, n_envs=2, learning_starts=0, buffer_size=128,
            batch_size=8, train_freq=4, target_update_interval=8,
            jit_iters=4, tau=1.0, seed=0)
    m.learn(total_timesteps=32)  # one iteration = 4 cycles = 32 steps
    # after the last cycle's refresh, target == params of that moment; with
    # per-iteration refresh it would equal a single stale snapshot.  We can
    # at least assert the target moved away from init and is finite.
    t0 = jax.tree_util.tree_leaves(m._state.target_params)[0]
    p0 = jax.tree_util.tree_leaves(m._state.params)[0]
    assert np.all(np.isfinite(np.asarray(t0)))
    # tau=1.0 & a crossing in the final cycle => target tracks recent params
    np.testing.assert_allclose(np.asarray(t0), np.asarray(p0), atol=2e-2)


def test_ddpg_n_critics_config_honored():
    d = DDPG(env=ENV, n_envs=1, seed=0)
    assert d.n_critics == 1
    d2 = DDPG(env=ENV, n_envs=1, seed=0,
              config=d.cfg.replace(n_critics=2))
    assert d2.n_critics == 2
    from gym_dockauv_tpu.rl.networks import TwinQCritic

    assert isinstance(d2.critic, TwinQCritic)


def test_eval_cache_reused():
    from gym_dockauv_tpu.rl.evaluation import evaluate_policy

    m = PPO(env=ENV, n_envs=2, n_steps=8, batch_size=8, seed=0)
    evaluate_policy(m, n_eval_episodes=2, seed=0)
    assert len(m._eval_cache) == 1
    evaluate_policy(m, n_eval_episodes=2, seed=1)
    assert len(m._eval_cache) == 1  # same compiled fn reused
    evaluate_policy(m, n_eval_episodes=3, seed=0)
    assert len(m._eval_cache) == 2


def test_load_applies_hyper_overrides_over_saved_config(tmp_path):
    m = SAC(env=ENV, n_envs=2, learning_starts=8, buffer_size=256,
            batch_size=16, learning_rate=3e-4, seed=0)
    m.learn(total_timesteps=32)
    path = str(tmp_path / "m")
    m.save(path)
    m2 = SAC.load(path, learning_rate=1e-3, batch_size=32)
    assert m2.cfg.learning_rate == 1e-3 and m2.cfg.batch_size == 32
    assert m2.cfg.buffer_size == 256  # non-overridden fields from the pickle
    # saved actor params still restored under the overridden config
    obs = np.zeros(36, np.float32)
    a1, _ = m.predict(obs, deterministic=True)
    a2, _ = m2.predict(obs, deterministic=True)
    np.testing.assert_allclose(a1, a2, rtol=1e-6)


def test_train_resume_counts_checkpoint_steps(tmp_path):
    from gym_dockauv_tpu.train import train

    train(ENV, total_timesteps=64, MODEL=PPO,
          model_save_path=str(tmp_path / "model"),
          agent_hyper_parameter=dict(n_steps=16, batch_size=32),
          vector_env=2, seed=0, verbose=0)
    # resume from the 64-step checkpoint with the same total: already done,
    # so no further chunks are trained
    m = train(ENV, total_timesteps=64, MODEL=PPO,
              model_save_path=str(tmp_path / "model"),
              agent_hyper_parameter=dict(n_steps=16, batch_size=32),
              model_load_path=str(tmp_path / "model_64"),
              vector_env=2, seed=0, verbose=0)
    assert m.num_timesteps == 64


def test_train_with_env_config_preserves_env_id(tmp_path):
    from gym_dockauv_tpu.config.env_config import TRAIN_CONFIG
    from gym_dockauv_tpu.train import train

    m = train(ENV, total_timesteps=32, MODEL=PPO,
              model_save_path=str(tmp_path / "model"),
              agent_hyper_parameter=dict(n_steps=16, batch_size=16),
              env_config=TRAIN_CONFIG(), vector_env=1, seed=0, verbose=0)
    assert m.env_id == ENV
    # loadable WITHOUT an explicit env (env_id survived the custom config)
    m2 = PPO.load(str(tmp_path / "model_32"))
    assert m2.env_id == ENV


def test_dqn_exploration_fraction_zero_no_nan():
    """exploration_fraction=0 must give the final eps from step 0 (SB3
    get_linear_fn boundary), not 0/0=NaN."""
    m = DQN(env=ENV, n_envs=2, learning_starts=4, buffer_size=64,
            batch_size=8, exploration_fraction=0.0,
            exploration_final_eps=0.07, seed=0)
    for pr in (1.0, 0.5, 0.0):
        eps = float(m._exploration_schedule(jnp.asarray(pr)))
        assert np.isfinite(eps) and abs(eps - 0.07) < 1e-7


def test_ppo_load_incompatible_opt_state_warns(tmp_path):
    """Drifted/corrupt saved optimizer state must warn and fall back to
    fresh moments (not silently pass, not crash later in jit)."""
    import pickle

    m = PPO(env=ENV, n_envs=2, n_steps=8, batch_size=8, seed=0)
    m.learn(total_timesteps=16)
    p = str(tmp_path / "model.zip")
    p_clean = str(tmp_path / "model_clean.zip")
    m.save(p)
    m.save(p_clean)
    with open(p, "rb") as f:
        payload = pickle.load(f)
    # simulate shape drift in one Adam moment leaf
    drifted = jax.tree_util.tree_map(
        lambda x: np.zeros((3, 3), np.float32)
        if getattr(x, "ndim", 0) == 2 else x, payload["opt_state"])
    payload["opt_state"] = drifted
    with open(p, "wb") as f:
        pickle.dump(payload, f)
    with pytest.warns(UserWarning, match="optimizer state incompatible"):
        m2 = PPO.load(p)
    m2.learn(total_timesteps=16)  # trains fine on fresh opt state

    # compatible load adopts the saved moments without warning
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        m3 = PPO.load(p_clean)
    a = jax.tree_util.tree_leaves(m._state.opt_state)
    b = jax.tree_util.tree_leaves(m3._state.opt_state)
    assert any(np.allclose(x, y) and np.asarray(x).size > 1
               for x, y in zip(a, b))


def test_eval_cache_not_aliased_across_envs():
    """The eval cache must key on the actual env core (weakref), not a
    recyclable id()."""
    from gym_dockauv_tpu.envs.core import make_env
    from gym_dockauv_tpu.rl.evaluation import evaluate_policy

    m = PPO(env=ENV, n_envs=2, n_steps=8, batch_size=8, seed=0)
    e1 = make_env(ENV)
    evaluate_policy(m, env=e1, n_eval_episodes=2, seed=0)
    ref1, fn1 = m._eval_cache[("eval", 2, True)]
    assert ref1() is e1
    evaluate_policy(m, env=e1, n_eval_episodes=2, seed=1)
    assert m._eval_cache[("eval", 2, True)][1] is fn1  # cache hit
    e2 = make_env(ENV)
    evaluate_policy(m, env=e2, n_eval_episodes=2, seed=0)
    ref2, fn2 = m._eval_cache[("eval", 2, True)]
    assert ref2() is e2 and fn2 is not fn1  # recompiled for the new core


def test_ppo_scale_actions_covers_asymmetric_bounds():
    """scale_actions=True: policy lives in [-1,1], env receives the affine
    map to bounds — on REMUS (rpm in [0,1500]) the default raw-unit Gaussian
    barely spins the propeller; the scaled mode must actually drive it."""
    m = PPO(env="SimpleDocking3d_remus-v0", n_envs=2, n_steps=8,
            batch_size=16, scale_actions=True, seed=0)
    a = m._to_env_action(jnp.zeros((4, 3)))
    np.testing.assert_allclose(np.asarray(a)[0], [0.0, 0.0, 750.0], atol=1e-5)
    a = m._to_env_action(jnp.full((1, 3), 2.0))  # clips to upper bound
    np.testing.assert_allclose(np.asarray(a)[0], [10.0, 10.0, 1500.0],
                               atol=1e-4)
    m.learn(total_timesteps=32)
    # the vehicle moved (raw-unit mode leaves it near the spawn point)
    pos = np.asarray(m._state.env_states.vehicle[:, 0:3])
    spawn = np.asarray([-8.0, 0.0, 0.0])
    assert np.linalg.norm(pos - spawn, axis=-1).max() > 0.5
    act, _ = m.predict(np.zeros(m.core.n_observations, np.float32))
    assert 0.0 <= act[2] <= 1500.0
