"""RL learner tests.

Oracle strategy mirrors SURVEY.md §4: analytic/NumPy oracles for the math
(GAE recursion exactly as SB3's compute_returns_and_advantage, distribution
log-probs vs torch.distributions), plus end-to-end smoke/determinism tests
for each algorithm over the real docking env.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_dockauv_tpu.rl import A2C, DDPG, DQN, PPO, SAC, TD3
from gym_dockauv_tpu.rl.buffers import replay_add, replay_init, replay_sample
from gym_dockauv_tpu.rl.common import linear_schedule, polyak_update
from gym_dockauv_tpu.rl.distributions import (
    gaussian_entropy,
    gaussian_log_prob,
    gaussian_sample,
    squashed_sample_and_log_prob,
)
from gym_dockauv_tpu.rl.networks import ActorCritic
from gym_dockauv_tpu.rl.ppo import compute_gae

ENV = "SimpleDocking3d-v0"


# -- distributions ----------------------------------------------------------
def test_gaussian_log_prob_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    mean = rng.normal(size=(7, 4)).astype(np.float64)
    log_std = rng.normal(scale=0.3, size=(4,)).astype(np.float64)
    x = rng.normal(size=(7, 4)).astype(np.float64)
    ours = gaussian_log_prob(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(log_std))
    dist = torch.distributions.Independent(
        torch.distributions.Normal(torch.tensor(mean),
                                   torch.tensor(np.exp(log_std))), 1)
    theirs = dist.log_prob(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-10)


def test_gaussian_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    log_std = np.array([0.1, -0.5, 0.3])
    ours = gaussian_entropy(jnp.asarray(log_std))
    dist = torch.distributions.Independent(
        torch.distributions.Normal(torch.zeros(3),
                                   torch.tensor(np.exp(log_std))), 1)
    np.testing.assert_allclose(float(ours), float(dist.entropy()), rtol=1e-10)


def test_squashed_log_prob_formula():
    """SB3 SquashedDiagGaussian: log pi(a) = log N(u) - sum log(1-a^2+eps)."""
    key = jax.random.PRNGKey(3)
    mean = jnp.asarray([[0.3, -0.2]])
    log_std = jnp.asarray([[-0.5, 0.1]])
    a, lp = squashed_sample_and_log_prob(key, mean, log_std)
    u = np.arctanh(np.asarray(a))
    lp_manual = np.array(gaussian_log_prob(jnp.asarray(u), mean, log_std))
    lp_manual = lp_manual - np.sum(np.log(1.0 - np.asarray(a) ** 2 + 1e-6), axis=-1)
    np.testing.assert_allclose(np.asarray(lp), lp_manual, rtol=1e-5)
    assert np.all(np.abs(np.asarray(a)) < 1.0)


def test_gaussian_sample_moments():
    key = jax.random.PRNGKey(0)
    mean = jnp.asarray([1.0, -2.0])
    log_std = jnp.asarray([0.0, jnp.log(2.0)])
    s = gaussian_sample(key, jnp.broadcast_to(mean, (20000, 2)), log_std)
    np.testing.assert_allclose(np.asarray(s).mean(0), [1.0, -2.0], atol=0.05)
    np.testing.assert_allclose(np.asarray(s).std(0), [1.0, 2.0], atol=0.05)


# -- GAE ----------------------------------------------------------------------
def test_gae_matches_sb3_reference_loop():
    """NumPy oracle of buffers.py compute_returns_and_advantage (SB3 1.5.0):
    episode_starts[t+1] == dones[t] indexing."""
    rng = np.random.default_rng(1)
    T, N = 12, 3
    rewards = rng.normal(size=(T, N))
    values = rng.normal(size=(T, N))
    dones = (rng.random((T, N)) < 0.2).astype(np.float64)
    last_values = rng.normal(size=(N,))
    gamma, lam = 0.98, 0.9

    adv_ref = np.zeros((T, N))
    last_gae = np.zeros(N)
    for t in reversed(range(T)):
        if t == T - 1:
            nnt = 1.0 - dones[t]
            nv = last_values
        else:
            nnt = 1.0 - dones[t]  # == 1 - episode_starts[t+1]
            nv = values[t + 1]
        delta = rewards[t] + gamma * nv * nnt - values[t]
        last_gae = delta + gamma * lam * nnt * last_gae
        adv_ref[t] = last_gae

    adv, ret = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                           jnp.asarray(dones), jnp.asarray(last_values),
                           gamma, lam)
    np.testing.assert_allclose(np.asarray(adv), adv_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ret), adv_ref + values, rtol=1e-8,
                               atol=1e-10)


# -- buffers ------------------------------------------------------------------
def test_replay_ring_wraparound_and_sampling():
    rb = replay_init(capacity=4, n_envs=2, obs_dim=3, act_dim=2)
    for i in range(6):  # overfill: positions wrap at 4
        rb = replay_add(rb, jnp.full((2, 3), i, jnp.float32),
                        jnp.full((2, 3), i + 100, jnp.float32),
                        jnp.full((2, 2), i, jnp.float32),
                        jnp.full((2,), float(i)),
                        jnp.zeros((2,)))
    assert bool(rb.full) and int(rb.pos) == 2
    # slots hold the 4 most recent step groups {2,3,4,5}
    stored = set(np.asarray(rb.rewards)[:, 0].tolist())
    assert stored == {2.0, 3.0, 4.0, 5.0}
    obs, act, nobs, rew, done = replay_sample(rb, jax.random.PRNGKey(0), 64)
    assert obs.shape == (64, 3) and act.shape == (64, 2)
    assert set(np.asarray(rew).tolist()) <= {2.0, 3.0, 4.0, 5.0}
    np.testing.assert_allclose(np.asarray(nobs)[:, 0], np.asarray(rew) + 100)


def test_replay_partial_fill_samples_only_written():
    rb = replay_init(capacity=8, n_envs=1, obs_dim=1, act_dim=1)
    rb = replay_add(rb, jnp.ones((1, 1)), jnp.ones((1, 1)),
                    jnp.ones((1, 1)), jnp.ones((1,)), jnp.zeros((1,)))
    _, _, _, rew, _ = replay_sample(rb, jax.random.PRNGKey(1), 32)
    np.testing.assert_allclose(np.asarray(rew), 1.0)


# -- common -------------------------------------------------------------------
def test_linear_schedule_and_polyak():
    sched = linear_schedule(1.0, 0.0)
    assert float(sched(jnp.asarray(1.0))) == 1.0
    assert float(sched(jnp.asarray(0.25))) == 0.25
    p = {"w": jnp.ones(3)}
    t = {"w": jnp.zeros(3)}
    out = polyak_update(p, t, 0.1)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1)


# -- networks -------------------------------------------------------------------
def test_actor_critic_init_matches_sb3_scheme():
    net = ActorCritic(n_actions=6)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 36)))["params"]
    # log_std starts at 0 => std 1 (policies.py log_std_init=0)
    np.testing.assert_allclose(np.asarray(params["log_std"]), 0.0)
    # orthogonal action head with gain 0.01 => tiny singular values
    w = np.asarray(params["action_net"]["kernel"])
    s = np.linalg.svd(w, compute_uv=False)
    np.testing.assert_allclose(s, 0.01, rtol=1e-5)
    # hidden layers orthogonal with gain sqrt(2)
    w0 = np.asarray(params["mlp_pi"]["Dense_0"]["kernel"])
    s0 = np.linalg.svd(w0, compute_uv=False)
    np.testing.assert_allclose(s0, np.sqrt(2.0), rtol=1e-5)
    # value head gain 1.0
    wv = np.asarray(params["value_net"]["kernel"])
    np.testing.assert_allclose(np.linalg.norm(wv), 1.0, rtol=1e-5)


# -- algorithms ------------------------------------------------------------------
def test_ppo_smoke_and_determinism():
    kw = dict(env=ENV, n_envs=2, n_steps=32, batch_size=32, n_epochs=2, seed=7)
    m1 = PPO(**kw)
    m1.learn(total_timesteps=128)
    m2 = PPO(**kw)
    m2.learn(total_timesteps=128)
    obs = np.linspace(0, 1, 36).astype(np.float32)
    a1, _ = m1.predict(obs, deterministic=True)
    a2, _ = m2.predict(obs, deterministic=True)
    np.testing.assert_allclose(a1, a2)  # same seed => identical training
    assert m1.num_timesteps == 128
    assert np.all(np.isfinite(a1))


def test_ppo_save_load_roundtrip(tmp_path):
    m = PPO(env=ENV, n_envs=2, n_steps=16, batch_size=16, seed=3)
    m.learn(total_timesteps=32)
    obs = np.linspace(-1, 1, 36).astype(np.float32)
    a_before, _ = m.predict(obs, deterministic=True)
    path = str(tmp_path / "model")
    m.save(path)
    m2 = PPO.load(path)
    a_after, _ = m2.predict(obs, deterministic=True)
    np.testing.assert_allclose(a_before, a_after, rtol=1e-6)


def test_ppo_target_kl_early_stop_runs():
    m = PPO(env=ENV, n_envs=2, n_steps=16, batch_size=16, n_epochs=4,
            target_kl=1e-9, seed=0)  # absurdly tight => stops immediately
    m.learn(total_timesteps=32)
    assert m.num_timesteps == 32


def test_sac_smoke_ent_coef_and_targets_move():
    m = SAC(env=ENV, n_envs=2, learning_starts=8, buffer_size=512,
            batch_size=32, seed=0)
    ent0 = float(jnp.exp(m._state.log_ent_coef))
    tgt0 = np.asarray(jax.tree_util.tree_leaves(
        m._state.critic_target_params)[0]).copy()
    m.learn(total_timesteps=64)
    ent1 = float(jnp.exp(m._state.log_ent_coef))
    tgt1 = np.asarray(jax.tree_util.tree_leaves(m._state.critic_target_params)[0])
    assert ent0 != ent1  # auto entropy coefficient is being optimized
    assert not np.allclose(tgt0, tgt1)  # polyak target updates happened
    a, _ = m.predict(np.zeros(36, np.float32), deterministic=True)
    low, high = m.core.action_low, m.core.action_high
    assert np.all(a >= low - 1e-6) and np.all(a <= high + 1e-6)


def test_sac_warmup_does_not_update_params():
    m = SAC(env=ENV, n_envs=2, learning_starts=10_000, buffer_size=512,
            batch_size=32, seed=0)
    p0 = np.asarray(jax.tree_util.tree_leaves(m._state.actor_params)[0]).copy()
    m.learn(total_timesteps=64)  # far below learning_starts
    p1 = np.asarray(jax.tree_util.tree_leaves(m._state.actor_params)[0])
    np.testing.assert_allclose(p0, p1)
    assert int(m._state.n_updates) == 0


@pytest.mark.parametrize("cls,kw", [
    (A2C, dict(n_steps=8)),
    (TD3, dict(learning_starts=8, buffer_size=256, batch_size=16)),
    (DDPG, dict(learning_starts=8, buffer_size=256, batch_size=16)),
    (DQN, dict(learning_starts=8, buffer_size=256, batch_size=16)),
])
def test_algo_smoke(cls, kw, tmp_path):
    m = cls(env=ENV, n_envs=2, seed=1, **kw)
    m.learn(total_timesteps=48)
    assert m.num_timesteps == 48
    a, _ = m.predict(np.zeros(36, np.float32), deterministic=True)
    assert a.shape == (6,) and np.all(np.isfinite(a))
    path = str(tmp_path / cls.__name__)
    m.save(path)
    m2 = cls.load(path)
    a2, _ = m2.predict(np.zeros(36, np.float32), deterministic=True)
    np.testing.assert_allclose(a, a2, rtol=1e-6)


def test_td3_policy_delay():
    """policy_delay=2: actor updates every other gradient step."""
    m = TD3(env=ENV, n_envs=1, learning_starts=4, buffer_size=256,
            batch_size=8, policy_delay=2, seed=0)
    a0 = np.asarray(jax.tree_util.tree_leaves(m._state.actor_params)[0]).copy()
    m.learn(total_timesteps=5)  # one post-warmup update, n_updates=0 -> policy updated
    assert int(m._state.n_updates) >= 1
    a1 = np.asarray(jax.tree_util.tree_leaves(m._state.actor_params)[0])
    assert not np.allclose(a0, a1)


def test_off_policy_stores_terminal_next_obs():
    """The stored next_obs at a done transition is the terminal observation,
    not the post-reset zeros (SB3 terminal_observation handling)."""
    m = SAC(env=ENV, n_envs=4, learning_starts=10_000, buffer_size=4096,
            batch_size=8, seed=2)
    m.learn(total_timesteps=4096)  # all warmup: random actions; episodes end
    rb = m._state.replay
    size = int(rb.size)
    dones = np.asarray(rb.dones)[:size]
    next_obs = np.asarray(rb.next_obs)[:size]
    done_idx = np.argwhere(dones > 0.5)
    assert len(done_idx) > 0, "no episode terminated during warmup"
    # terminal obs should not be the all-zeros reset obs
    vals = np.array([np.abs(next_obs[i, j]).sum() for i, j in done_idx])
    assert np.all(vals > 0)
