"""Golden-value tests for the learner loss computations.

Each loss is recomputed by hand in NumPy following the SB3 1.5.0 source
semantics cited in the learner docstrings, on tiny crafted batches."""
import numpy as np

import jax
import jax.numpy as jnp

from gym_dockauv_tpu.rl import PPO, SAC
from gym_dockauv_tpu.rl.distributions import (
    gaussian_entropy,
    gaussian_log_prob,
)

ENV = "SimpleDocking3d-v0"


def test_ppo_loss_matches_manual():
    m = PPO(env=ENV, n_envs=1, n_steps=8, batch_size=8, seed=0,
            normalize_advantage=False, ent_coef=0.01, vf_coef=0.5)
    params = m._state.params
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(8, 36)).astype(np.float32)
    actions = rng.normal(size=(8, 6)).astype(np.float32)
    old_logp = rng.normal(size=(8,)).astype(np.float32)
    old_values = rng.normal(size=(8,)).astype(np.float32)
    adv = rng.normal(size=(8,)).astype(np.float32)
    returns = rng.normal(size=(8,)).astype(np.float32)
    batch = tuple(jnp.asarray(x) for x in
                  (obs, actions, old_logp, old_values, adv, returns))
    loss, aux = m._loss(params, batch, jnp.asarray(0.2))

    mean, log_std, values = m.net.apply(params, jnp.asarray(obs))
    logp = np.asarray(gaussian_log_prob(jnp.asarray(actions), mean, log_std))
    ratio = np.exp(logp - old_logp)
    pl = -np.mean(np.minimum(adv * ratio,
                             adv * np.clip(ratio, 0.8, 1.2)))
    vl = np.mean((returns - np.asarray(values)) ** 2)
    ent = np.asarray(gaussian_entropy(
        jnp.broadcast_to(log_std, mean.shape))).mean()
    expected = pl + 0.01 * (-ent) + 0.5 * vl
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    np.testing.assert_allclose(float(aux["policy_gradient_loss"]), pl,
                               rtol=1e-5)
    np.testing.assert_allclose(
        float(aux["approx_kl"]),
        np.mean(ratio - 1 - (logp - old_logp)), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(aux["clip_fraction"]),
        np.mean(np.abs(ratio - 1) > 0.2), rtol=1e-6)


def test_ppo_advantage_normalization_uses_bessel_std():
    """SB3 normalizes with torch std (ddof=1) per minibatch."""
    m = PPO(env=ENV, n_envs=1, n_steps=8, batch_size=8, seed=0,
            normalize_advantage=True, vf_coef=0.0, ent_coef=0.0)
    params = m._state.params
    obs = np.zeros((8, 36), np.float32)
    actions = np.zeros((8, 6), np.float32)
    mean, log_std, _ = m.net.apply(params, jnp.asarray(obs))
    logp = np.asarray(gaussian_log_prob(jnp.asarray(actions), mean, log_std))
    adv = np.arange(8, dtype=np.float32)
    batch = tuple(jnp.asarray(x) for x in
                  (obs, actions, logp, np.zeros(8, np.float32), adv,
                   np.zeros(8, np.float32)))
    loss, aux = m._loss(params, batch, jnp.asarray(0.2))
    # ratio == 1 -> policy loss = -mean(normalized adv) with ddof=1 std
    norm_adv = (adv - adv.mean()) / (adv.std(ddof=1) + 1e-8)
    np.testing.assert_allclose(float(aux["policy_gradient_loss"]),
                               -norm_adv.mean(), atol=1e-6)


def test_sac_critic_target_matches_manual():
    m = SAC(env=ENV, n_envs=1, learning_starts=4, buffer_size=64,
            batch_size=4, seed=0)
    st = m._state
    rng = np.random.default_rng(1)
    obs = rng.normal(size=(4, 36)).astype(np.float32)
    actions = np.clip(rng.normal(size=(4, 6)), -1, 1).astype(np.float32)
    next_obs = rng.normal(size=(4, 36)).astype(np.float32)
    rewards = rng.normal(size=(4,)).astype(np.float32)
    dones = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    batch = tuple(jnp.asarray(x) for x in
                  (obs, actions, next_obs, rewards, dones))
    key = jax.random.PRNGKey(9)
    new_st, metrics = jax.jit(
        lambda s, b, k: m._grad_update(s, b, jnp.asarray(True), 0, k)
    )(st, batch, key)

    # manual critic loss vs the same sampled next actions
    from gym_dockauv_tpu.rl.distributions import squashed_sample_and_log_prob

    k_pi, k_next = jax.random.split(key)
    mean, log_std = m.actor.apply(st.actor_params, jnp.asarray(obs))
    _, log_prob = squashed_sample_and_log_prob(k_pi, mean, log_std)
    # log-alpha IS optimized this step...
    ent_grad = -np.mean(np.asarray(log_prob) + m.target_entropy)
    lr = float(m.cfg.learning_rate)
    new_log_alpha = float(st.log_ent_coef) - lr * np.sign(ent_grad)
    np.testing.assert_allclose(float(new_st.log_ent_coef), new_log_alpha,
                               rtol=1e-3)
    # ...but the critic/actor losses use the PRE-update snapshot
    # (SB3: ent_coef = exp(log_ent_coef.detach()) before the alpha step)
    ent_coef = np.exp(float(st.log_ent_coef))
    nmean, nlog_std = m.actor.apply(st.actor_params, jnp.asarray(next_obs))
    next_a, next_logp = squashed_sample_and_log_prob(k_next, nmean, nlog_std)
    q1t, q2t = m.critic.apply(st.critic_target_params, jnp.asarray(next_obs),
                              next_a)
    target_q = np.minimum(np.asarray(q1t), np.asarray(q2t)) \
        - ent_coef * np.asarray(next_logp)
    target = rewards + (1 - dones) * m.cfg.gamma * target_q
    q1, q2 = m.critic.apply(st.critic_params, jnp.asarray(obs),
                            jnp.asarray(actions))
    critic_loss = 0.5 * (np.mean((np.asarray(q1) - target) ** 2)
                         + np.mean((np.asarray(q2) - target) ** 2))
    np.testing.assert_allclose(float(metrics["critic_loss"]), critic_loss,
                               rtol=1e-4)


def test_done_masks_bootstrap():
    """(1-done) gates the SAC target: a done transition's target equals its
    reward exactly."""
    m = SAC(env=ENV, n_envs=1, learning_starts=4, buffer_size=64,
            batch_size=2, seed=0)
    obs = np.zeros((2, 36), np.float32)
    actions = np.zeros((2, 6), np.float32)
    next_obs = np.ones((2, 36), np.float32)
    rewards = np.array([5.0, 5.0], np.float32)
    dones = np.array([1.0, 0.0], np.float32)
    # with a zeroed critic target net, targets differ only via ent term
    zero_target = jax.tree_util.tree_map(jnp.zeros_like,
                                         m._state.critic_target_params)
    st = m._state.replace(critic_target_params=zero_target)
    from gym_dockauv_tpu.rl.distributions import squashed_sample_and_log_prob

    key = jax.random.PRNGKey(0)
    _, k_next = jax.random.split(key)
    nmean, nlog_std = m.actor.apply(st.actor_params, jnp.asarray(next_obs))
    _, next_logp = squashed_sample_and_log_prob(k_next, nmean, nlog_std)
    ent_coef = float(jnp.exp(st.log_ent_coef))
    # done row: target = r; alive row: r + gamma*(0 - ent*logp)
    t0 = 5.0
    t1 = 5.0 + m.cfg.gamma * (-ent_coef * float(next_logp[1]))
    q1, q2 = m.critic.apply(st.critic_params, jnp.asarray(obs),
                            jnp.asarray(actions))
    manual = 0.5 * (np.mean((np.asarray(q1) - [t0, t1]) ** 2)
                    + np.mean((np.asarray(q2) - [t0, t1]) ** 2))
    batch = tuple(jnp.asarray(x) for x in
                  (obs, actions, next_obs, rewards, dones))
    # disable the ent update so ent_coef stays at its initial value
    m.auto_ent = False
    _, metrics = jax.jit(
        lambda s, b, k: m._grad_update(s, b, jnp.asarray(True), 0, k)
    )(st, batch, key)
    np.testing.assert_allclose(float(metrics["critic_loss"]), manual,
                               rtol=1e-4)
