"""APG (analytic policy gradients through the differentiable env).

No reference counterpart — this is a framework addition enabled by the
env being a differentiable JAX program (rl/apg.py module docstring).
Tests cover the Base contract (learn/predict/save/load), gradient
hygiene (finite updates under BPTT), and actual learning progress on
the dense SimpleDocking3d_remus task at a tiny scale.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_dockauv_tpu.rl import APG
from gym_dockauv_tpu.rl.apg import APGRollout, shell_sdf
from gym_dockauv_tpu.envs.core import make_env

ENV = "SimpleDocking3d_remus-v0"


def small(**kw):
    base = dict(horizon=40, batch_size=8, learning_rate=1e-3,
                net_arch=(32, 32), seed=0)
    base.update(kw)
    return APG(env=ENV, **base)


def test_learn_reduces_loss_and_distance():
    algo = small()
    p0 = jax.tree_util.tree_map(np.asarray, algo._state.params)
    # measure the loss before/after through the algorithm's own pieces
    key = jax.random.PRNGKey(42)
    keys = jax.random.split(key, 16)
    core = algo.core
    states0, obs0 = jax.vmap(core.reset)(keys, jnp.zeros((16,), jnp.int32))

    def mean_loss(params):
        l, _ = jax.vmap(lambda s, o: algo._instance_loss(params, s, o))(
            states0, obs0)
        return float(jnp.mean(l))

    before = mean_loss(algo._state.params)
    algo.learn(total_timesteps=40 * 8 * 60)  # 60 iterations
    after = mean_loss(algo._state.params)
    assert np.isfinite(after)
    assert after < before, (before, after)
    # params actually moved
    moved = any(
        not np.allclose(a, b)
        for (a, _), (b, _) in zip(p0, algo._state.params))
    assert moved


def test_predict_shapes_and_bounds():
    algo = small()
    core = algo.core
    obs = np.zeros((core.n_observations,), np.float32)
    act, _ = algo.predict(obs, deterministic=True)
    assert act.shape == (core.action_low.shape[0],)
    assert np.all(act >= np.asarray(core.action_low) - 1e-6)
    assert np.all(act <= np.asarray(core.action_high) + 1e-6)
    batch, _ = algo.predict(np.zeros((5, core.n_observations), np.float32))
    assert batch.shape == (5, core.action_low.shape[0])


def test_action_band_override():
    low = np.array([-0.52, -0.52, 0.0], np.float32)
    high = np.array([0.52, 0.52, 1525.0], np.float32)
    algo = small(action_low=low, action_high=high)
    obs = np.zeros((algo.core.n_observations,), np.float32)
    act, _ = algo.predict(obs, deterministic=True)
    assert np.all(act[:2] >= -0.52 - 1e-6) and np.all(act[:2] <= 0.52 + 1e-6)


def test_save_load_roundtrip(tmp_path):
    algo = small()
    algo.learn(total_timesteps=40 * 8 * 3)
    obs = np.linspace(-0.5, 0.5, algo.core.n_observations).astype(np.float32)
    a_before, _ = algo.predict(obs, deterministic=True)
    path = str(tmp_path / "apg_model")
    algo.save(path)
    loaded = APG.load(path)
    a_after, _ = loaded.predict(obs, deterministic=True)
    np.testing.assert_allclose(a_before, a_after, rtol=1e-6, atol=1e-6)
    assert loaded.cfg.horizon == algo.cfg.horizon
    # resumable: one more learn call works on the restored opt state
    loaded.learn(total_timesteps=40 * 8, reset_num_timesteps=False)


def test_custom_cost_fn_used():
    calls = []

    def cost(roll: APGRollout):
        calls.append(1)
        return roll.delta_d * 2.0

    algo = small(cost_fn=cost)
    algo.learn(total_timesteps=40 * 8)
    assert calls  # traced at least once


def test_episode_stats_flow_to_buffer():
    # on Simple the spawn is 8 m out with max_dist 20: episodes end within
    # the horizon only by goal or out-of-bounds; run enough iterations
    # that random-ish early policies produce at least one ended episode
    algo = small(horizon=120, batch_size=16)
    algo.learn(total_timesteps=120 * 16 * 30)
    # ep_info_buffer only fills when an episode latched done in-horizon;
    # loss finiteness + monotone counters are the hard guarantees
    assert algo.num_timesteps == 120 * 16 * 30
    for e in algo.ep_info_buffer:
        assert set(e) == {"r", "l", "goal", "collision"}
        assert e["l"] <= 120


def test_shell_sdf_matches_collision_boundary():
    core = make_env("ObstaclesCurrentDocking3d_remus-v0")
    st, _ = core.reset(jax.random.PRNGKey(0), jnp.int32(0))
    safety = core.config.safety_radius
    # a point exactly on the center capsule axis: sdf = -(r + safety)
    probe = np.asarray(st.cap_a[0])
    s = float(shell_sdf(st, jnp.asarray(probe), safety))
    assert abs(s - (-(float(st.cap_r[0]) + safety))) < 1e-5
    # far away: positive
    s_far = float(shell_sdf(st, jnp.asarray([50.0, 50.0, 0.0]), safety))
    assert s_far > 10.0
