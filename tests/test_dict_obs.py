"""Dict-observation machinery: DictReplay/DictRollout + MultiInput policies.

Covers the role of the reference's DictReplayBuffer
(stable_baselines3/common/buffers.py:478), DictRolloutBuffer (:634) and
MultiInputPolicy/CombinedExtractor (common/torch_layers.py:241-282).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_dockauv_tpu.envs.core import make_env, N_OBS_WITHOUT_RADAR
from gym_dockauv_tpu.rl.buffers import replay_add, replay_init, replay_sample
from gym_dockauv_tpu.rl.dict_obs import (
    CombinedExtractor,
    DictPPO,
    DictSAC,
    ObsSplit,
    dict_replay_add,
    dict_replay_init,
    dict_replay_sample,
    dict_rollout_add,
    dict_rollout_init,
    docking_split,
    goal_view,
)

ENV = "SimpleDocking3d-v0"


def test_split_roundtrip():
    core = make_env(ENV)
    sp = docking_split(core)
    assert list(sp.keys()) == ["nav", "rays"]
    assert sp.sizes == {"nav": N_OBS_WITHOUT_RADAR,
                        "rays": core.n_observations - N_OBS_WITHOUT_RADAR}
    x = jnp.arange(2 * core.n_observations, dtype=jnp.float32).reshape(2, -1)
    d = sp.to_dict(x)
    assert d["nav"].shape == (2, N_OBS_WITHOUT_RADAR)
    np.testing.assert_array_equal(np.asarray(sp.to_flat(d)), np.asarray(x))


def test_extractor_matches_flat_concat():
    """CombinedExtractor = flatten+concat in sorted-key order
    (torch_layers.py:269-278)."""
    ext = CombinedExtractor()
    obs = {"b": jnp.ones((4, 3)) * 2, "a": jnp.ones((4, 5))}
    out = ext.apply({}, obs)
    assert out.shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(out[:, :5]), 1.0)  # 'a' first
    np.testing.assert_array_equal(np.asarray(out[:, 5:]), 2.0)


def test_dict_replay_matches_flat_replay():
    """Same transitions + same PRNG key -> identical samples, with the dict
    legs concatenating back to the flat legs."""
    sp = ObsSplit({"nav": (0, 4), "rays": (4, 6)})
    cap, n_envs, act = 8, 2, 3
    rb_f = replay_init(cap, n_envs, 6, act)
    rb_d = dict_replay_init(cap, n_envs, sp, act)
    rng = np.random.default_rng(0)
    for i in range(11):  # > capacity: exercises the ring wrap
        obs = jnp.asarray(rng.normal(size=(n_envs, 6)), jnp.float32)
        nxt = jnp.asarray(rng.normal(size=(n_envs, 6)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(n_envs, act)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(n_envs,)), jnp.float32)
        d = jnp.asarray(rng.integers(0, 2, size=(n_envs,)), jnp.float32)
        rb_f = replay_add(rb_f, obs, nxt, a, r, d)
        rb_d = dict_replay_add(rb_d, sp.to_dict(obs), sp.to_dict(nxt), a, r, d)
    assert int(rb_d.size) == int(rb_f.size) == cap
    key = jax.random.PRNGKey(7)
    of, af, nf, rf, df = replay_sample(rb_f, key, 16)
    od, ad, nd, rd, dd = dict_replay_sample(rb_d, key, 16)
    np.testing.assert_array_equal(np.asarray(sp.to_flat(od)), np.asarray(of))
    np.testing.assert_array_equal(np.asarray(sp.to_flat(nd)), np.asarray(nf))
    np.testing.assert_array_equal(np.asarray(ad), np.asarray(af))
    np.testing.assert_array_equal(np.asarray(rd), np.asarray(rf))
    np.testing.assert_array_equal(np.asarray(dd), np.asarray(df))


def test_dict_rollout_add():
    sp = ObsSplit({"a": (0, 2), "b": (2, 5)})
    roll = dict_rollout_init(4, 2, sp, 3)
    f32 = jnp.float32
    obs = {"a": jnp.ones((2, 2), f32), "b": jnp.full((2, 3), 2.0, f32)}
    roll = dict_rollout_add(roll, 1, obs, jnp.zeros((2, 3), f32),
                            jnp.ones((2,), f32), jnp.zeros((2,), f32),
                            jnp.ones((2,), f32), jnp.zeros((2,), f32))
    assert roll["obs"]["a"].shape == (4, 2, 2)
    np.testing.assert_array_equal(np.asarray(roll["obs"]["b"][1]), 2.0)
    np.testing.assert_array_equal(np.asarray(roll["obs"]["b"][0]), 0.0)
    np.testing.assert_array_equal(np.asarray(roll["rewards"][1]), 1.0)


def test_goal_view_shapes():
    core = make_env(ENV)
    key = jax.random.PRNGKey(0)
    st, obs = jax.vmap(core.reset)(jax.random.split(key, 3),
                                   jnp.zeros((3,), jnp.int32))
    gv = goal_view(obs, st)
    assert set(gv) == {"observation", "achieved_goal", "desired_goal"}
    assert gv["observation"].shape == (3, core.n_observations)
    assert gv["achieved_goal"].shape == (3, 3)
    assert gv["desired_goal"].shape == (3, 3)


def test_dict_sac_learns_and_predicts():
    m = DictSAC(env=ENV, n_envs=2, learning_starts=8, buffer_size=256,
                batch_size=4, train_freq=4, gradient_steps=1, seed=0)
    # the replay genuinely stores dict legs
    assert isinstance(m._state.replay.obs, dict)
    assert set(m._state.replay.obs) == {"nav", "rays"}
    m.learn(total_timesteps=32)
    obs = np.zeros((m.core.n_observations,), np.float32)
    a, _ = m.predict(obs, deterministic=True)
    assert np.all(np.isfinite(a))
    # dict obs work on the predict surface too (MultiInput contract)
    a2, _ = m.predict(m.obs_split.to_dict(jnp.asarray(obs)),
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a), rtol=1e-6)


def test_dict_ppo_learns():
    m = DictPPO(env=ENV, n_envs=2, n_steps=8, batch_size=8, seed=0)
    m.learn(total_timesteps=16)
    obs = np.zeros((m.core.n_observations,), np.float32)
    a, _ = m.predict(obs, deterministic=True)
    assert np.all(np.isfinite(a))


def test_dict_sac_save_load(tmp_path):
    m = DictSAC(env=ENV, n_envs=2, learning_starts=4, buffer_size=64,
                batch_size=4, train_freq=4, gradient_steps=1, seed=0)
    m.learn(total_timesteps=16)
    p = tmp_path / "dict_sac"
    m.save(str(p))
    m2 = DictSAC.load(str(p), env=ENV)
    obs = np.random.default_rng(1).normal(
        size=(m.core.n_observations,)).astype(np.float32)
    a1, _ = m.predict(obs, deterministic=True)
    a2, _ = m2.predict(obs, deterministic=True)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=1e-6)


def test_dict_sac_custom_split_survives_save_load(tmp_path):
    """ADVICE r4: a non-default obs_split must round-trip through the
    payload — load() skips DictSAC.__init__, so without the saved spec the
    model would silently rebuild with docking_split and slice features
    differently than the net was trained with."""
    n = 36  # SimpleDocking3d_remus obs width
    custom = ObsSplit({"a": (0, 10), "b": (10, 30), "c": (30, n)})
    m = DictSAC(env=ENV, n_envs=2, learning_starts=4, buffer_size=64,
                batch_size=4, train_freq=4, gradient_steps=1, seed=0,
                obs_split=custom)
    assert set(m._state.replay.obs) == {"a", "b", "c"}
    m.learn(total_timesteps=16)
    p = tmp_path / "dict_sac_custom"
    m.save(str(p))
    m2 = DictSAC.load(str(p), env=ENV)
    assert m2.obs_split.spec == custom.spec
    obs = np.random.default_rng(2).normal(size=(n,)).astype(np.float32)
    a1, _ = m.predict(obs, deterministic=True)
    a2, _ = m2.predict(obs, deterministic=True)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=1e-6)


def test_dict_ppo_custom_split_survives_save_load(tmp_path):
    n = 36
    custom = ObsSplit({"lo": (0, 18), "hi": (18, n)})
    m = DictPPO(env=ENV, n_envs=2, n_steps=8, batch_size=8, seed=0,
                obs_split=custom)
    m.learn(total_timesteps=16)
    p = tmp_path / "dict_ppo_custom"
    m.save(str(p))
    m2 = DictPPO.load(str(p), env=ENV)
    assert m2.obs_split.spec == custom.spec
    obs = np.random.default_rng(3).normal(size=(n,)).astype(np.float32)
    a1, _ = m.predict(obs, deterministic=True)
    a2, _ = m2.predict(obs, deterministic=True)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=1e-6)


def test_dict_ppo_log_std_init_propagates():
    """ADVICE r4: DictPPO must forward cfg.log_std_init into the
    MultiInputActorCritic (flat PPO does, ppo.py)."""
    m = DictPPO(env=ENV, n_envs=2, n_steps=4, batch_size=4, seed=0,
                log_std_init=-1.5)
    log_std = jax.tree_util.tree_leaves(
        {k: v for k, v in m._state.params["params"]["head"].items()
         if k == "log_std"})[0]
    np.testing.assert_allclose(np.asarray(log_std), -1.5, atol=1e-6)
