"""DQN — TPU-native.

SB3 1.5.0 semantics (dqn/dqn.py:17-268): epsilon-greedy exploration with a
linear schedule over `exploration_fraction` of training, Huber TD loss
against a hard-copied (tau=1) target network refreshed every
`target_update_interval` env steps, Adam + grad-norm clip 10.

The docking envs are continuous-action; like the reference (which ships DQN
unused, README.md:6 "tested with PPO and SAC"), DQN is provided for
capability parity and runs through a discrete action table: pass
`discrete_actions` of shape (K, n_actions) in env units, or use the default
bang-bang set {0} u {+-bound_i e_i}.  The buffer stores action indices.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config.drl_hyperparams import DQNConfig
from .buffers import ReplayState
from .common import polyak_update
from .networks import QNetwork
from .off_policy import OffPolicyAlgorithm


@struct.dataclass
class DQNState:
    params: dict
    target_params: dict
    opt_state: tuple
    replay: ReplayState
    env_states: object
    last_obs: jnp.ndarray
    key: jax.Array
    num_ts: jnp.ndarray
    n_updates: jnp.ndarray
    exploration_rate: jnp.ndarray  # () traced epsilon


def default_discrete_actions(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Bang-bang table: the zero action plus +-full-scale on each axis."""
    n = low.shape[0]
    mid = (low + high) / 2.0
    table = [mid]
    for i in range(n):
        hi = mid.copy()
        hi[i] = high[i]
        lo = mid.copy()
        lo[i] = low[i]
        table += [hi, lo]
    return np.stack(table)


class DQN(OffPolicyAlgorithm):
    config_cls = DQNConfig
    _discrete_actions_in: Optional[np.ndarray] = None

    def __init__(self, policy: str = "MlpPolicy", env=None,
                 discrete_actions: Optional[np.ndarray] = None, **kwargs):
        self._discrete_actions_in = discrete_actions
        super().__init__(policy, env, **kwargs)

    def _pre_load(self, payload):
        self._discrete_actions_in = np.asarray(payload["action_table"])

    def _setup_model(self) -> None:
        cfg = self.cfg
        core = self.core
        table = self._discrete_actions_in
        if table is None:
            table = default_discrete_actions(
                np.asarray(core.action_low), np.asarray(core.action_high))
        self.action_table = jnp.asarray(table, jnp.float32)
        self.n_discrete = int(self.action_table.shape[0])
        self.net = QNetwork(self.n_discrete, tuple(cfg.net_arch))
        self.key, ki, ke = jax.random.split(self.key, 3)
        params = self.net.init(ki, jnp.zeros((1, core.n_observations)))
        self.tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                              optax.adam(float(cfg.learning_rate)))
        env_states, obs = jax.jit(jax.vmap(core.reset))(
            jax.random.split(ke, self.n_envs),
            jnp.zeros((self.n_envs,), jnp.int32))
        self._state = DQNState(
            params=params,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.tx.init(params),
            replay=self._init_replay(n_act=1),
            env_states=env_states, last_obs=obs, key=self.key,
            num_ts=jnp.zeros((), jnp.int32), n_updates=jnp.zeros((), jnp.int32),
            exploration_rate=jnp.asarray(cfg.exploration_initial_eps))
        self._action_low = jnp.asarray(core.action_low, jnp.float32)
        self._action_high = jnp.asarray(core.action_high, jnp.float32)

    # -- exploration ---------------------------------------------------------
    def _exploration_schedule(self, progress_remaining):
        """get_linear_fn(initial, final, fraction) (utils.py:88-112).

        exploration_fraction <= 0 means "no decay window": epsilon is the
        final value from step 0 (guards the 0/0 NaN at
        progress_remaining=1.0 that a bare division would produce)."""
        cfg = self.cfg
        if cfg.exploration_fraction <= 0.0:
            return jnp.asarray(cfg.exploration_final_eps, jnp.float32)
        frac = (1.0 - progress_remaining) / cfg.exploration_fraction
        return jnp.where(
            frac > 1.0, cfg.exploration_final_eps,
            cfg.exploration_initial_eps + frac
            * (cfg.exploration_final_eps - cfg.exploration_initial_eps))

    def _explore_action(self, state: DQNState, obs, key):
        k_eps, k_rand = jax.random.split(key)
        q = self.net.apply(state.params, obs)
        greedy = jnp.argmax(q, axis=-1)
        rand = jax.random.randint(k_rand, greedy.shape, 0, self.n_discrete)
        take_rand = jax.random.uniform(k_eps, greedy.shape) < state.exploration_rate
        idx = jnp.where(take_rand, rand, greedy)
        return idx[:, None].astype(jnp.float32)  # stored as (N,1) float index

    def _random_action(self, state, key, shape):
        return jax.random.randint(key, shape[:-1] + (1,), 0,
                                  self.n_discrete).astype(jnp.float32)

    def _env_action(self, state, scaled):
        idx = scaled[..., 0].astype(jnp.int32)
        return self.action_table[idx]

    # -- updates --------------------------------------------------------------
    def _cycle(self, state: DQNState, progress_remaining):
        """One collect/update cycle with the target-refresh boundary check
        per cycle (NOT per _iteration), so jit_iters>1 cannot collapse
        multiple target_update_interval crossings into one refresh
        (dqn.py:_on_step semantics)."""
        state = state.replace(
            exploration_rate=self._exploration_schedule(progress_remaining))
        before = state.num_ts
        new_state, metrics, stats = super()._cycle(state, progress_remaining)
        crossed = (new_state.num_ts // self.cfg.target_update_interval) \
            > (before // self.cfg.target_update_interval)
        target = self._masked_apply(
            crossed,
            polyak_update(new_state.params, new_state.target_params,
                          self.cfg.tau),
            new_state.target_params)
        metrics["exploration_rate"] = new_state.exploration_rate
        return new_state.replace(target_params=target), metrics, stats

    def _grad_update(self, state: DQNState, batch, should_train, i, key):
        cfg = self.cfg
        obs, actions, next_obs, rewards, dones = batch
        idx = actions[:, 0].astype(jnp.int32)
        next_q = jnp.max(self.net.apply(state.target_params, next_obs), axis=-1)
        target = jax.lax.stop_gradient(
            rewards + (1.0 - dones) * cfg.gamma * next_q)

        def loss_fn(p):
            q = self.net.apply(p, obs)
            q_taken = jnp.take_along_axis(q, idx[:, None], axis=-1)[:, 0]
            return jnp.mean(optax.huber_loss(q_taken, target))  # smooth_l1

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = self._pmean(grads)
        upd, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        params = self._masked_apply(should_train, params, state.params)
        opt_state = self._masked_apply(should_train, opt_state, state.opt_state)
        state = state.replace(params=params, opt_state=opt_state,
                              n_updates=state.n_updates
                              + should_train.astype(jnp.int32))
        return state, {"loss": loss}

    def _extra_iteration_metrics(self, state, progress_remaining):
        return {"n_updates": state.n_updates.astype(jnp.float32)}

    # ------------------------------------------------------------------
    def _inference_params(self):
        # epsilon rides along as a traced value so non-deterministic
        # predict() follows the annealed exploration rate (it would
        # otherwise bake in as a compile-time constant)
        return (self._state.params, self._state.exploration_rate)

    def _predict_fn(self, params_and_eps, obs, deterministic, key):
        params, eps = params_and_eps
        q = self.net.apply(params, obs)
        idx = jnp.argmax(q, axis=-1)
        if not deterministic:  # static under jit
            k1, k2 = jax.random.split(key)
            rand = jax.random.randint(k1, idx.shape, 0, self.n_discrete)
            take = jax.random.uniform(k2, idx.shape) < eps
            idx = jnp.where(take, rand, idx)
        return self.action_table[idx]

    def _save_payload(self):
        return {"params": self._state.params,
                "target_params": self._state.target_params,
                "action_table": self.action_table,
                "config": dataclasses.asdict(self.cfg)}

    def _load_payload(self, payload):
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
        self._state = self._state.replace(
            params=as_jnp(payload["params"]),
            target_params=as_jnp(payload["target_params"]))
