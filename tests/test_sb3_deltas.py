"""Round-4 SB3-surface deltas: episode-unit train_freq, OU action noise,
gymnasium registration shim (VERDICT r3 items 2/6)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_dockauv_tpu.config.env_config import TRAIN_CONFIG
from gym_dockauv_tpu.rl import DDPG, TD3


def _small_cfg():
    # short episodes so the episode-unit iteration stays cheap on CPU
    return TRAIN_CONFIG().replace(max_timesteps=25)


def test_td3_episode_train_freq_advances_by_episode_lengths():
    from gym_dockauv_tpu.train import make_gym

    env = make_gym("SimpleDocking3d-v0", _small_cfg())
    m = TD3(env=env, n_envs=2, seed=0, train_freq=(1, "episode"),
            gradient_steps=-1, learning_starts=40, batch_size=16,
            net_arch=(32, 32))
    assert m.cfg.train_freq == 1 and m.cfg.train_freq_unit == "episode"
    m.learn(total_timesteps=120, log_interval=0)
    # advanced in whole collect chunks of n_envs steps, past the target
    assert m.num_timesteps >= 120
    assert m.num_timesteps % 2 == 0
    # updates happened once past learning_starts
    assert int(m._state.n_updates) > 0
    # episode stats were absorbed (episodes finish every <=25 steps)
    assert len(m.ep_info_buffer) > 0


def test_gradient_steps_minus_one_requires_episode_unit():
    with pytest.raises(ValueError):
        TD3(env="SimpleDocking3d-v0", n_envs=1, gradient_steps=-1)


def test_ddpg_ou_noise_state_evolves_and_resets_on_done():
    from gym_dockauv_tpu.train import make_gym

    env = make_gym("SimpleDocking3d-v0", _small_cfg())
    m = DDPG(env=env, n_envs=2, seed=0, action_noise_std=0.3,
             action_noise_type="ou", learning_starts=0,
             train_freq=4, gradient_steps=1, batch_size=8,
             net_arch=(16, 16))
    assert np.allclose(np.asarray(m._state.ou_state), 0.0)
    m.learn(total_timesteps=16, log_interval=0)
    ou = np.asarray(m._state.ou_state)
    assert ou.shape == (2, 6)
    assert np.all(np.isfinite(ou))
    # the process must have moved off zero for at least one env
    assert np.abs(ou).max() > 0.0
    # direct reset semantics: a done in the batch zeroes that env's state
    res_done = type("R", (), {})()
    st = m._state.replace(ou_state=jnp.ones((2, 6)))
    class Res:  # minimal res with a done field
        done = jnp.asarray([True, False])
    st2 = m._post_step(st, Res)
    out = np.asarray(st2.ou_state)
    assert np.allclose(out[0], 0.0) and np.allclose(out[1], 1.0)


def test_ou_noise_differs_from_gaussian_trajectory():
    """OU noise is autocorrelated: two consecutive exploration actions from
    the same obs share the process state; with Gaussian they are iid."""
    m = TD3(env="SimpleDocking3d-v0", n_envs=1, seed=0,
            action_noise_std=0.5, action_noise_type="ou",
            net_arch=(16, 16))
    st = m._state
    obs = st.last_obs
    a1, st1 = m._explore_action(st, obs, jax.random.PRNGKey(1))
    a2, st2 = m._explore_action(st1, obs, jax.random.PRNGKey(2))
    # the OU state advanced and is carried
    assert not np.allclose(np.asarray(st1.ou_state), 0.0)
    assert not np.allclose(np.asarray(st1.ou_state),
                           np.asarray(st2.ou_state))


def test_gymnasium_shim_registers_and_runs():
    gymnasium = pytest.importorskip("gymnasium")
    import gym_dockauv_tpu  # noqa: F401  (import registers the ids)

    assert "SimpleDocking3d-v0" in gymnasium.registry
    assert "ObstaclesCurrentDocking3d_remus-v0" in gymnasium.registry
    env = gymnasium.make("SimpleDocking3d-v0")
    obs, info = env.reset(seed=0)
    assert obs.shape == (36,)
    obs, r, terminated, truncated, info = env.step(env.action_space.sample())
    assert obs.shape == (36,) and isinstance(r, float)
    assert not (terminated and truncated) or True  # both bools
    env.close()


def test_gymnasium_truncation_vs_termination():
    gymnasium = pytest.importorskip("gymnasium")
    import gym_dockauv_tpu  # noqa: F401

    env = gymnasium.make("SimpleDocking3d-v0",
                         env_config=_small_cfg())
    env.reset(seed=3)
    terminated = truncated = False
    for _ in range(30):
        obs, r, terminated, truncated, info = env.step(
            np.zeros(6, np.float32))
        if terminated or truncated:
            break
    # zero action from the spawn cannot reach the goal in 25 steps: the
    # episode must end via the time cap -> truncated, not terminated
    assert truncated and not terminated
    assert 3 in info["conditions_true"]
