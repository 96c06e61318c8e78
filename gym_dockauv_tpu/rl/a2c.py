"""A2C — TPU-native.

SB3 1.5.0 A2C semantics (a2c/a2c.py:13-180): 5-step rollouts, a SINGLE
gradient step per rollout over the whole batch (no shuffling/minibatches/
clipping), vanilla policy-gradient loss with GAE(lambda=1) advantages,
RMSprop(alpha=0.99, eps=1e-5) optimizer, advantage normalization off by
default.  Shares the scan-based collect/GAE machinery with PPO.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..config.drl_hyperparams import A2CConfig
from .common import as_schedule, explained_variance
from .distributions import gaussian_entropy, gaussian_log_prob
from .networks import ActorCritic
from .ppo import OnPolicyState, PPO, collect_rollout, compute_gae


class A2C(PPO):
    config_cls = A2CConfig

    def _setup_model(self) -> None:
        cfg = self.cfg
        core = self.core
        self.net = ActorCritic(n_actions=core.n_actions,
                               net_arch=tuple(cfg.net_arch),
                               log_std_init=cfg.log_std_init)
        self.key, k_init, k_env = jax.random.split(self.key, 3)
        params = self.net.init(k_init, jnp.zeros((1, core.n_observations)))
        self.lr_schedule = as_schedule(cfg.learning_rate)

        @optax.inject_hyperparams
        def make_tx(learning_rate):
            return optax.chain(
                optax.clip_by_global_norm(cfg.max_grad_norm),
                # torch RMSprop(alpha=0.99, eps=1e-5) equivalent
                optax.rmsprop(learning_rate, decay=0.99, eps=1e-5),
            )

        self.tx = make_tx(learning_rate=self.lr_schedule(jnp.asarray(1.0)))
        opt_state = self.tx.init(params)
        env_states, obs = jax.jit(jax.vmap(core.reset))(
            jax.random.split(k_env, self.n_envs),
            jnp.zeros((self.n_envs,), jnp.int32))
        self._state = OnPolicyState(params, opt_state, env_states, obs, self.key)
        self._action_low = jnp.asarray(core.action_low, jnp.float32)
        self._action_high = jnp.asarray(core.action_high, jnp.float32)

    @property
    def _steps_per_iteration(self) -> int:
        return self.cfg.n_steps * self.n_envs

    def _iteration(self, state: OnPolicyState, progress_remaining):
        cfg = self.cfg
        lr = self.lr_schedule(progress_remaining)
        work_key, next_key = self._work_keys(state)
        env_states, last_obs, key, traj, stats = collect_rollout(
            self.core, self.net.apply, state.params, state.env_states,
            state.last_obs, work_key, cfg.n_steps, self._to_env_action)
        last_values = self.net.apply(state.params, last_obs)[2]
        advantages, returns = compute_gae(
            traj.reward, traj.value, traj.done, last_values,
            cfg.gamma, cfg.gae_lambda)

        obs = traj.obs.reshape((-1, traj.obs.shape[-1]))
        actions = traj.action.reshape((-1, traj.action.shape[-1]))
        adv = advantages.reshape(-1)
        ret = returns.reshape(-1)

        def loss_fn(params):
            mean, log_std, values = self.net.apply(params, obs)
            log_prob = gaussian_log_prob(actions, mean, log_std)
            entropy = gaussian_entropy(jnp.broadcast_to(log_std, mean.shape))
            a = adv
            if cfg.normalize_advantage:
                a = (a - a.mean()) / (a.std(ddof=1) + 1e-8)
            policy_loss = -jnp.mean(a * log_prob)
            value_loss = jnp.mean(jnp.square(ret - values))
            entropy_loss = -jnp.mean(entropy)
            loss = (policy_loss + cfg.ent_coef * entropy_loss
                    + cfg.vf_coef * value_loss)
            return loss, {"policy_loss": policy_loss, "value_loss": value_loss,
                          "entropy_loss": entropy_loss, "loss": loss}

        opt_state = state.opt_state._replace(
            hyperparams=dict(state.opt_state.hyperparams, learning_rate=lr))
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = self._pmean(grads)
        aux = self._pmean(aux)
        updates, opt_state = self.tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = dict(aux)
        metrics["explained_variance"] = self._pmean(explained_variance(
            traj.value.reshape(-1), ret))
        metrics["learning_rate"] = lr
        metrics["std"] = jnp.mean(jnp.exp(params["params"]["log_std"]))
        return OnPolicyState(params, opt_state, env_states, last_obs,
                             next_key), metrics, stats

    def _save_payload(self):
        return {"params": self._state.params,
                "opt_state": self._state.opt_state,
                "config": dataclasses.asdict(self.cfg)}
