"""TD3 / DDPG — TPU-native.

SB3 1.5.0 semantics (td3/td3.py:16-220; ddpg/ddpg.py:102-113): deterministic
tanh actor with actor-target, twin (TD3) or single (DDPG) critics, clipped
Gaussian target-policy smoothing, delayed policy + target updates every
`policy_delay` gradient steps, optional exploration action noise — Gaussian
(noise.py:23-52) or Ornstein-Uhlenbeck (noise.py:55-110, per-env process
state carried in TD3State and reset on episode done).  DDPG is TD3 with
policy_delay=1, target_noise_clip=0, n_critics=1.  `train_freq` supports
both SB3 units: env steps (the fused in-graph fast path, our default) and
the SB3-default `(1, "episode")` scheduling (host-driven
`_episode_iteration` in off_policy.py, with gradient_steps=-1 = one update
per collected env step).
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config.drl_hyperparams import DDPGConfig, TD3Config
from .buffers import ReplayState
from .common import polyak_update
from .networks import DeterministicActor, QCritic, TwinQCritic
from .off_policy import OffPolicyAlgorithm


@struct.dataclass
class TD3State:
    actor_params: dict
    actor_target_params: dict
    critic_params: dict
    critic_target_params: dict
    actor_opt: tuple
    critic_opt: tuple
    replay: ReplayState
    env_states: object
    last_obs: jnp.ndarray
    key: jax.Array
    num_ts: jnp.ndarray
    n_updates: jnp.ndarray
    # (n_envs, n_act) Ornstein-Uhlenbeck process state; all-zero (and
    # unused) unless cfg.action_noise_type == "ou"
    ou_state: jnp.ndarray = None


class TD3(OffPolicyAlgorithm):
    config_cls = TD3Config

    @property
    def n_critics(self) -> int:
        return int(getattr(self.cfg, "n_critics", 2))

    def _setup_model(self) -> None:
        cfg = self.cfg
        core = self.core
        self.actor = DeterministicActor(core.n_actions, tuple(cfg.net_arch))
        if self.n_critics == 2:
            self.critic = TwinQCritic(tuple(cfg.net_arch))
        else:
            self.critic = QCritic(tuple(cfg.net_arch))
        self.key, ka, kc, ke = jax.random.split(self.key, 4)
        obs0 = jnp.zeros((1, core.n_observations))
        act0 = jnp.zeros((1, core.n_actions))
        actor_params = self.actor.init(ka, obs0)
        critic_params = self.critic.init(kc, obs0, act0)
        lr = float(cfg.learning_rate)
        self.actor_tx = optax.adam(lr)
        self.critic_tx = optax.adam(lr)
        env_states, obs = jax.jit(jax.vmap(core.reset))(
            jax.random.split(ke, self.n_envs),
            jnp.zeros((self.n_envs,), jnp.int32))
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
        self._state = TD3State(
            actor_params=actor_params, actor_target_params=copy(actor_params),
            critic_params=critic_params,
            critic_target_params=copy(critic_params),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            replay=self._init_replay(), env_states=env_states, last_obs=obs,
            key=self.key, num_ts=jnp.zeros((), jnp.int32),
            n_updates=jnp.zeros((), jnp.int32),
            ou_state=jnp.zeros((self.n_envs, core.n_actions), jnp.float32))
        self._action_low = jnp.asarray(core.action_low, jnp.float32)
        self._action_high = jnp.asarray(core.action_high, jnp.float32)

    def _q_values(self, params, obs, actions):
        q = self.critic.apply(params, obs, actions)
        return q if isinstance(q, tuple) else (q,)

    def _explore_action(self, state: TD3State, obs, key):
        cfg = self.cfg
        a = self.actor.apply(state.actor_params, obs)
        if cfg.action_noise_std > 0:
            if cfg.action_noise_type == "ou":
                # OrnsteinUhlenbeckActionNoise step (noise.py:55-110):
                # per-env process state lives in TD3State, reset on done
                # by _post_step (off_policy_algorithm.py:615)
                noise = (state.ou_state
                         + cfg.action_noise_theta * (0.0 - state.ou_state)
                         * cfg.action_noise_dt
                         + cfg.action_noise_std
                         * jnp.sqrt(cfg.action_noise_dt)
                         * jax.random.normal(key, a.shape, a.dtype))
                state = state.replace(ou_state=noise)
            else:
                noise = cfg.action_noise_std * jax.random.normal(
                    key, a.shape, a.dtype)
            a = a + noise
        return jnp.clip(a, -1.0, 1.0), state

    def _post_step(self, st: TD3State, res):
        if self.cfg.action_noise_type == "ou" and self.cfg.action_noise_std > 0:
            return st.replace(ou_state=jnp.where(
                res.done[:, None], 0.0, st.ou_state))
        return st

    def _grad_update(self, state: TD3State, batch, should_train, i, key):
        cfg = self.cfg
        obs, actions, next_obs, rewards, dones = batch

        # target action with clipped smoothing noise (td3.py:160-170)
        noise = jnp.clip(
            cfg.target_policy_noise * jax.random.normal(
                key, actions.shape, actions.dtype),
            -cfg.target_noise_clip, cfg.target_noise_clip)
        next_a = jnp.clip(
            self.actor.apply(state.actor_target_params, next_obs) + noise,
            -1.0, 1.0)
        q_targets = self._q_values(state.critic_target_params, next_obs, next_a)
        target_q = q_targets[0]
        for q in q_targets[1:]:
            target_q = jnp.minimum(target_q, q)
        target = jax.lax.stop_gradient(
            rewards + (1.0 - dones) * cfg.gamma * target_q)

        def critic_loss_fn(cp):
            qs = self._q_values(cp, obs, actions)
            return sum(jnp.mean(jnp.square(q - target)) for q in qs)

        critic_loss, cg = jax.value_and_grad(critic_loss_fn)(state.critic_params)
        cg = self._pmean(cg)
        cupd, critic_opt = self.critic_tx.update(cg, state.critic_opt)
        critic_params = optax.apply_updates(state.critic_params, cupd)
        critic_params = self._masked_apply(should_train, critic_params,
                                           state.critic_params)
        critic_opt = self._masked_apply(should_train, critic_opt, state.critic_opt)

        # delayed policy + target updates (td3.py:172-186)
        do_policy = should_train & (state.n_updates % cfg.policy_delay == 0)

        def actor_loss_fn(ap):
            a = self.actor.apply(ap, obs)
            return -jnp.mean(self._q_values(critic_params, obs, a)[0])

        actor_loss, ag = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        ag = self._pmean(ag)
        aupd, actor_opt = self.actor_tx.update(ag, state.actor_opt)
        actor_params = optax.apply_updates(state.actor_params, aupd)
        actor_params = self._masked_apply(do_policy, actor_params,
                                          state.actor_params)
        actor_opt = self._masked_apply(do_policy, actor_opt, state.actor_opt)
        critic_target = self._masked_apply(
            do_policy,
            polyak_update(critic_params, state.critic_target_params, cfg.tau),
            state.critic_target_params)
        actor_target = self._masked_apply(
            do_policy,
            polyak_update(actor_params, state.actor_target_params, cfg.tau),
            state.actor_target_params)

        state = state.replace(
            actor_params=actor_params, actor_target_params=actor_target,
            critic_params=critic_params, critic_target_params=critic_target,
            actor_opt=actor_opt, critic_opt=critic_opt,
            n_updates=state.n_updates + should_train.astype(jnp.int32))
        return state, {"critic_loss": critic_loss, "actor_loss": actor_loss}

    def _extra_iteration_metrics(self, state, progress_remaining):
        return {"n_updates": state.n_updates.astype(jnp.float32)}

    # ------------------------------------------------------------------
    def _inference_params(self):
        return self._state.actor_params

    def _predict_fn(self, params, obs, deterministic, key):
        return self._env_action(None, self.actor.apply(params, obs))

    def _save_payload(self):
        return {"actor_params": self._state.actor_params,
                "critic_params": self._state.critic_params,
                "actor_target_params": self._state.actor_target_params,
                "critic_target_params": self._state.critic_target_params,
                "config": dataclasses.asdict(self.cfg)}

    def _load_payload(self, payload):
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
        self._state = self._state.replace(
            actor_params=as_jnp(payload["actor_params"]),
            critic_params=as_jnp(payload["critic_params"]),
            actor_target_params=as_jnp(payload["actor_target_params"]),
            critic_target_params=as_jnp(payload["critic_target_params"]))
