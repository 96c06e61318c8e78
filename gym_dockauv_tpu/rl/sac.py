"""SAC — TPU-native.

Semantics of the reference's vendored SB3 1.5.0 SAC (sac/sac.py:16-314):
squashed-Gaussian actor, twin critics with min-twin targets, automatic
entropy temperature (target_entropy = -dim(A), log-alpha optimized with the
detached (logp + target_entropy)), polyak target updates each
`target_update_interval` gradient steps, update order ent-coef -> critic ->
actor (sac.py:215-268).  Replay lives on device (buffers.py here), so the
whole collect+train iteration is one XLA program.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config.drl_hyperparams import SACConfig
from .buffers import ReplayState
from .common import polyak_update
from .distributions import squashed_mode, squashed_sample_and_log_prob
from .networks import SACActor, TwinQCritic
from .off_policy import OffPolicyAlgorithm


@struct.dataclass
class SACState:
    actor_params: dict
    critic_params: dict
    critic_target_params: dict
    log_ent_coef: jnp.ndarray  # () learnable log alpha
    actor_opt: tuple
    critic_opt: tuple
    ent_opt: tuple
    replay: ReplayState
    env_states: object
    last_obs: jnp.ndarray
    key: jax.Array
    num_ts: jnp.ndarray  # () int32 device-side step counter
    n_updates: jnp.ndarray  # () int32


class SAC(OffPolicyAlgorithm):
    config_cls = SACConfig

    # ------------------------------------------------------------------
    def _setup_model(self) -> None:
        cfg = self.cfg
        core = self.core
        self._build_networks()
        self.key, ka, kc, ke = jax.random.split(self.key, 4)
        obs0 = jnp.zeros((1, core.n_observations))
        act0 = jnp.zeros((1, core.n_actions))
        actor_params = self.actor.init(ka, obs0)
        critic_params = self.critic.init(kc, obs0, act0)

        # entropy coefficient (sac.py:146-180)
        if cfg.target_entropy == "auto":
            self.target_entropy = -float(core.n_actions)
        else:
            self.target_entropy = float(cfg.target_entropy)
        self.auto_ent = isinstance(cfg.ent_coef, str) and cfg.ent_coef.startswith("auto")
        init_alpha = 1.0
        if self.auto_ent and "_" in str(cfg.ent_coef):
            init_alpha = float(str(cfg.ent_coef).split("_")[1])
        log_ent_coef = jnp.asarray(np.log(init_alpha), jnp.float32) \
            if self.auto_ent else jnp.asarray(np.log(float(cfg.ent_coef)), jnp.float32)

        lr = float(cfg.learning_rate)
        self.actor_tx = optax.adam(lr)
        self.critic_tx = optax.adam(lr)
        self.ent_tx = optax.adam(lr)

        env_states, obs = jax.jit(jax.vmap(core.reset))(
            jax.random.split(ke, self.n_envs),
            jnp.zeros((self.n_envs,), jnp.int32))
        self._state = SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            critic_target_params=jax.tree_util.tree_map(jnp.copy, critic_params),
            log_ent_coef=log_ent_coef,
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            ent_opt=self.ent_tx.init(log_ent_coef),
            replay=self._init_replay(),
            env_states=env_states,
            last_obs=obs,
            key=self.key,
            num_ts=jnp.zeros((), jnp.int32),
            n_updates=jnp.zeros((), jnp.int32),
        )
        self._action_low = jnp.asarray(core.action_low, jnp.float32)
        self._action_high = jnp.asarray(core.action_high, jnp.float32)

    def _build_networks(self):
        """Policy-construction hook ("MlpPolicy" default); DictSAC overrides
        with a MultiInputPolicy (rl/dict_obs.py)."""
        self.actor = SACActor(self.core.n_actions, tuple(self.cfg.net_arch))
        self.critic = TwinQCritic(tuple(self.cfg.net_arch))

    # ------------------------------------------------------------------
    def _explore_action(self, state: SACState, obs, key):
        mean, log_std = self.actor.apply(state.actor_params, obs)
        a, _ = squashed_sample_and_log_prob(key, mean, log_std)
        return a

    def _grad_update(self, state: SACState, batch, should_train, i, key):
        cfg = self.cfg
        obs, actions, next_obs, rewards, dones = batch
        k_pi, k_next = jax.random.split(key)

        # actions from the current actor, used by ent-coef AND actor losses
        # (sampled once at the top, sac.py:204-213)
        mean, log_std = self.actor.apply(state.actor_params, obs)
        actions_pi, log_prob = squashed_sample_and_log_prob(k_pi, mean, log_std)

        # 1) entropy coefficient — SB3 snapshots ent_coef from the
        # PRE-update log-alpha (exp(log_ent_coef.detach()), sac.py:215-218);
        # the alpha optimizer step below does not feed this gradient step
        ent_coef = jnp.exp(state.log_ent_coef)
        if self.auto_ent:
            def ent_loss_fn(log_alpha):
                return -jnp.mean(log_alpha * jax.lax.stop_gradient(
                    log_prob + self.target_entropy))

            ent_loss, g = jax.value_and_grad(ent_loss_fn)(state.log_ent_coef)
            g = self._pmean(g)
            upd, ent_opt = self.ent_tx.update(g, state.ent_opt)
            new_log_alpha = optax.apply_updates(state.log_ent_coef, upd)
            log_ent_coef = jnp.where(should_train, new_log_alpha,
                                     state.log_ent_coef)
            ent_opt = self._masked_apply(should_train, ent_opt, state.ent_opt)
        else:
            ent_loss = jnp.zeros(())
            log_ent_coef, ent_opt = state.log_ent_coef, state.ent_opt

        # 2) critics against min-twin entropy-regularized target (sac.py:229-251)
        next_mean, next_log_std = self.actor.apply(state.actor_params, next_obs)
        next_a, next_logp = squashed_sample_and_log_prob(k_next, next_mean,
                                                         next_log_std)
        q1_t, q2_t = self.critic.apply(state.critic_target_params, next_obs, next_a)
        target_q = jnp.minimum(q1_t, q2_t) - ent_coef * next_logp
        target = rewards + (1.0 - dones) * cfg.gamma * target_q
        target = jax.lax.stop_gradient(target)

        def critic_loss_fn(cp):
            q1, q2 = self.critic.apply(cp, obs, actions)
            return 0.5 * (jnp.mean(jnp.square(q1 - target))
                          + jnp.mean(jnp.square(q2 - target)))

        critic_loss, cg = jax.value_and_grad(critic_loss_fn)(state.critic_params)
        cg = self._pmean(cg)
        cupd, critic_opt = self.critic_tx.update(cg, state.critic_opt)
        critic_params = optax.apply_updates(state.critic_params, cupd)
        critic_params = self._masked_apply(should_train, critic_params,
                                           state.critic_params)
        critic_opt = self._masked_apply(should_train, critic_opt,
                                        state.critic_opt)

        # 3) actor against the UPDATED critic (sac.py:256-265)
        def actor_loss_fn(ap):
            m, ls = self.actor.apply(ap, obs)
            a_pi, lp = squashed_sample_and_log_prob(k_pi, m, ls)
            q1, q2 = self.critic.apply(critic_params, obs, a_pi)
            return jnp.mean(ent_coef * lp - jnp.minimum(q1, q2))

        actor_loss, ag = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        ag = self._pmean(ag)
        aupd, actor_opt = self.actor_tx.update(ag, state.actor_opt)
        actor_params = optax.apply_updates(state.actor_params, aupd)
        actor_params = self._masked_apply(should_train, actor_params,
                                          state.actor_params)
        actor_opt = self._masked_apply(should_train, actor_opt, state.actor_opt)

        # 4) polyak every target_update_interval grad steps (sac.py:267-268)
        do_polyak = should_train & (i % cfg.target_update_interval == 0)
        target_params = self._masked_apply(
            do_polyak,
            polyak_update(critic_params, state.critic_target_params, cfg.tau),
            state.critic_target_params)

        state = state.replace(
            actor_params=actor_params, critic_params=critic_params,
            critic_target_params=target_params, log_ent_coef=log_ent_coef,
            actor_opt=actor_opt, critic_opt=critic_opt, ent_opt=ent_opt,
            n_updates=state.n_updates + should_train.astype(jnp.int32))
        metrics = {"ent_coef": ent_coef, "ent_coef_loss": ent_loss,
                   "critic_loss": critic_loss, "actor_loss": actor_loss,
                   "mean_log_prob": jnp.mean(log_prob)}
        return state, metrics

    def _extra_iteration_metrics(self, state, progress_remaining):
        return {"n_updates": state.n_updates.astype(jnp.float32)}

    # ------------------------------------------------------------------
    def _inference_params(self):
        return self._state.actor_params

    def _predict_fn(self, params, obs, deterministic, key):
        mean, log_std = self.actor.apply(params, obs)
        if deterministic:
            a = squashed_mode(mean)
        else:
            a, _ = squashed_sample_and_log_prob(key, mean, log_std)
        return self._env_action(None, a)

    # ------------------------------------------------------------------
    def _save_payload(self):
        return {"actor_params": self._state.actor_params,
                "critic_params": self._state.critic_params,
                "critic_target_params": self._state.critic_target_params,
                "log_ent_coef": self._state.log_ent_coef,
                "config": dataclasses.asdict(self.cfg)}

    def _load_payload(self, payload):
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
        self._state = self._state.replace(
            actor_params=as_jnp(payload["actor_params"]),
            critic_params=as_jnp(payload["critic_params"]),
            critic_target_params=as_jnp(payload["critic_target_params"]),
            log_ent_coef=jnp.asarray(payload["log_ent_coef"]))
