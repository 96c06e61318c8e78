"""PPO (clipped surrogate) — TPU-native.

Semantics follow the reference's vendored SB3 1.5.0 PPO
(stable_baselines3/ppo/ppo.py:15-314 and
common/on_policy_algorithm.py:17-279): n_steps rollout per env with GAE,
n_epochs of shuffled minibatch updates with ratio clipping, optional value
clipping, entropy bonus, advantage normalization per minibatch (Bessel-
corrected std, matching torch), approx-KL early stop at 1.5*target_kl, Adam
with eps=1e-5 and global-norm clip.

The TPU shape: rollout collection is a `lax.scan` of the vmapped env
`step_autoreset` + policy forward (no host in the loop), GAE is a reverse
scan, and the epoch/minibatch sweep is another scan — one compiled program
per learn iteration.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config.drl_hyperparams import PPOConfig
from .base import BaseAlgorithm
from .common import EpisodeStats, as_schedule, explained_variance
from .distributions import gaussian_entropy, gaussian_log_prob, gaussian_sample
from .networks import ActorCritic


@struct.dataclass
class OnPolicyState:
    params: dict
    opt_state: tuple
    env_states: object  # batched EnvState
    last_obs: jnp.ndarray  # (N, O)
    key: jax.Array


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray  # unclipped sample (SB3 stores pre-clip actions)
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


def collect_rollout(core, apply_fn, params, env_states, obs, key, n_steps,
                    to_env_action):
    """n_steps of (policy forward -> env step_autoreset), batched over envs.

    Returns (env_states, last_obs, key, Transition(T,N,...), EpisodeStats).
    Mirrors on_policy_algorithm.py:129-217 minus the host round-trips.
    `to_env_action` maps the (pre-clip, stored) policy sample to env units —
    identity+clip in SB3-parity mode, affine unscale when scale_actions.
    """
    step_env = jax.vmap(core.step_autoreset)

    def body(carry, _):
        env_states, obs, key = carry
        key, k_act = jax.random.split(key)
        mean, log_std, value = apply_fn(params, obs)
        action = gaussian_sample(k_act, mean, log_std)
        log_prob = gaussian_log_prob(action, mean, log_std)
        env_states, res = step_env(env_states, to_env_action(action))
        tr = Transition(obs, action, log_prob, value, res.reward, res.done)
        stats = EpisodeStats(res.done, res.info.cumulative_reward,
                             res.info.t_step, res.info.goal_reached,
                             res.info.collision, res.info.cum_reward_arr)
        return (env_states, res.obs, key), (tr, stats)

    (env_states, obs, key), (traj, stats) = jax.lax.scan(
        body, (env_states, obs, key), None, length=n_steps)
    return env_states, obs, key, traj, stats


def compute_gae(rewards, values, dones, last_values, gamma, gae_lambda):
    """GAE(lambda) reverse scan (buffers.py compute_returns_and_advantage).
    dones[t] is the post-step done flag, so next_non_terminal[t] = 1-dones[t]
    — identical to SB3's episode_starts[t+1] indexing."""
    next_values = jnp.concatenate([values[1:], last_values[None]], axis=0)

    def body(last_gae, x):
        r, v, nv, d = x
        nnt = 1.0 - d
        delta = r + gamma * nv * nnt - v
        gae = delta + gamma * gae_lambda * nnt * last_gae
        return gae, gae

    _, adv_rev = jax.lax.scan(
        body, jnp.zeros_like(last_values),
        (rewards[::-1], values[::-1], next_values[::-1],
         dones[::-1].astype(rewards.dtype)))
    advantages = adv_rev[::-1]
    return advantages, advantages + values


class PPO(BaseAlgorithm):
    config_cls = PPOConfig

    # ------------------------------------------------------------------
    def _setup_model(self) -> None:
        cfg = self.cfg
        core = self.core
        buffer_size = cfg.n_steps * self.n_envs
        assert buffer_size % cfg.batch_size == 0, (
            f"batch_size {cfg.batch_size} must divide n_steps*n_envs {buffer_size}")
        self._build_networks()
        self.key, k_init, k_env = jax.random.split(self.key, 3)
        params = self.net.init(k_init, jnp.zeros((1, core.n_observations)))
        self.lr_schedule = as_schedule(cfg.learning_rate)
        self.clip_schedule = as_schedule(cfg.clip_range)

        @optax.inject_hyperparams
        def make_tx(learning_rate):
            return optax.chain(
                optax.clip_by_global_norm(cfg.max_grad_norm),
                optax.adam(learning_rate, eps=1e-5),  # ActorCriticPolicy default
            )

        self.tx = make_tx(learning_rate=self.lr_schedule(jnp.asarray(1.0)))
        opt_state = self.tx.init(params)

        keys = jax.random.split(k_env, self.n_envs)
        episodes = jnp.zeros((self.n_envs,), jnp.int32)
        env_states, obs = jax.jit(jax.vmap(core.reset))(keys, episodes)
        self._state = OnPolicyState(params, opt_state, env_states, obs, self.key)
        self._action_low = jnp.asarray(core.action_low, jnp.float32)
        self._action_high = jnp.asarray(core.action_high, jnp.float32)

    def _build_networks(self):
        """Policy-construction hook ("MlpPolicy" default); DictPPO overrides
        with a MultiInputPolicy (rl/dict_obs.py)."""
        cfg = self.cfg
        self.net = ActorCritic(n_actions=self.core.n_actions,
                               net_arch=tuple(cfg.net_arch),
                               log_std_init=cfg.log_std_init)

    @staticmethod
    def _log_std_leaf(params):
        """The state-independent log_std parameter, wherever the policy
        module nests it (top level for ActorCritic, under 'head' for the
        MultiInput wrapper)."""
        p = params["params"]
        return p["log_std"] if "log_std" in p else p["head"]["log_std"]

    def _to_env_action(self, action):
        """Policy sample -> env units (clip-only in SB3-parity mode).
        getattr: A2C shares this via inheritance but its config has no
        scale_actions knob."""
        if getattr(self.cfg, "scale_actions", False):
            a = jnp.clip(action, -1.0, 1.0)
            return self._action_low + 0.5 * (a + 1.0) * (
                self._action_high - self._action_low)
        return jnp.clip(action, self._action_low, self._action_high)

    @property
    def _steps_per_iteration(self) -> int:
        return self.cfg.n_steps * self.n_envs

    # ------------------------------------------------------------------
    def _normalize_advantages(self, advantages):
        """Advantage normalization over the GLOBAL minibatch.

        Single-device: torch-unbiased std over the minibatch, exactly SB3
        (ppo.py:219-221).  Sharded: each device sees only its local slice of
        the global minibatch, so the mean/std are computed from pmean'd
        moments — the normalized advantages (and hence the pmean'd gradient)
        match the unsharded run up to fp rounding, instead of being the mean
        of differently-normalized shard losses."""
        if self.axis_name is None:
            return (advantages - advantages.mean()) / (
                advantages.std(ddof=1) + 1e-8)  # torch-unbiased std
        n_shards = jax.lax.psum(1, self.axis_name)
        n_global = advantages.size * n_shards
        # one fused all-reduce for both moments (collective-count matters
        # on the DCN path, SCALING.md)
        m1, m2 = jax.lax.pmean(
            jnp.stack([advantages.mean(),
                       jnp.mean(jnp.square(advantages))]), self.axis_name)
        # Bessel-corrected variance from global moments == std(ddof=1)
        var = (m2 - jnp.square(m1)) * (n_global / (n_global - 1))
        return (advantages - m1) / (jnp.sqrt(jnp.maximum(var, 0.0)) + 1e-8)

    def _loss(self, params, batch, clip_range):
        cfg = self.cfg
        obs, actions, old_log_prob, old_values, advantages, returns = batch
        mean, log_std, values = self.net.apply(params, obs)
        log_prob = gaussian_log_prob(actions, mean, log_std)
        entropy = gaussian_entropy(jnp.broadcast_to(log_std, mean.shape))

        if cfg.normalize_advantage:
            advantages = self._normalize_advantages(advantages)
        log_ratio = log_prob - old_log_prob
        ratio = jnp.exp(log_ratio)
        pl1 = advantages * ratio
        pl2 = advantages * jnp.clip(ratio, 1.0 - clip_range, 1.0 + clip_range)
        policy_loss = -jnp.mean(jnp.minimum(pl1, pl2))

        if cfg.clip_range_vf is None:
            values_pred = values
        else:
            values_pred = old_values + jnp.clip(
                values - old_values, -cfg.clip_range_vf, cfg.clip_range_vf)
        value_loss = jnp.mean(jnp.square(returns - values_pred))
        entropy_loss = -jnp.mean(entropy)
        loss = policy_loss + cfg.ent_coef * entropy_loss + cfg.vf_coef * value_loss

        approx_kl = jnp.mean(ratio - 1.0 - log_ratio)
        clip_fraction = jnp.mean((jnp.abs(ratio - 1.0) > clip_range).astype(jnp.float32))
        aux = {"policy_gradient_loss": policy_loss, "value_loss": value_loss,
               "entropy_loss": entropy_loss, "approx_kl": approx_kl,
               "clip_fraction": clip_fraction, "loss": loss}
        return loss, aux

    def _iteration(self, state: OnPolicyState, progress_remaining):
        cfg = self.cfg
        # local (per-shard) env count: under shard_map this is n_envs/n_dev
        n_envs, T = state.last_obs.shape[0], cfg.n_steps
        batch_size = self._local_batch(n_envs, cfg.batch_size)
        lr = self.lr_schedule(progress_remaining)
        clip_range = self.clip_schedule(progress_remaining)
        work_key, next_key = self._work_keys(state)

        env_states, last_obs, key, traj, stats = collect_rollout(
            self.core, self.net.apply, state.params, state.env_states,
            state.last_obs, work_key, T, self._to_env_action)
        last_values = self.net.apply(state.params, last_obs)[2]
        advantages, returns = compute_gae(
            traj.reward, traj.value, traj.done, last_values,
            cfg.gamma, cfg.gae_lambda)

        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((T * n_envs,) + x.shape[2:]),
            (traj.obs, traj.action, traj.log_prob, traj.value, advantages, returns))
        n_batch = T * n_envs
        n_mb = n_batch // batch_size

        key, k_perm = jax.random.split(key)
        perms = jax.vmap(lambda k: jax.random.permutation(k, n_batch))(
            jax.random.split(k_perm, cfg.n_epochs))
        mb_idx = perms.reshape(cfg.n_epochs * n_mb, batch_size)

        opt_state = state.opt_state
        opt_state = opt_state._replace(
            hyperparams=dict(opt_state.hyperparams, learning_rate=lr))

        def mb_step(carry, idx):
            params, opt_state, cont = carry
            batch = jax.tree_util.tree_map(lambda x: x[idx], flat)
            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                params, batch, clip_range)
            # data-parallel: all-reduce grads/diagnostics over the mesh so
            # every replica applies the identical update (incl. the KL gate).
            # ONE pmean call site for both trees: the DCN/Gloo path is
            # collective-COUNT-bound (SCALING.md attribution — 9 small
            # all-reduces dominated the N=2 multi-process loss), and a
            # single site lets XLA emit one combined all-reduce
            grads, aux = self._pmean((grads, aux))
            if cfg.target_kl is not None:
                # SB3 breaks BEFORE applying the offending update (ppo.py:252-259)
                cont = cont & (aux["approx_kl"] <= 1.5 * cfg.target_kl)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            use = cont
            params = jax.tree_util.tree_map(
                lambda a, b: jnp.where(use, a, b), new_params, params)
            opt_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(use, a, b), new_opt, opt_state)
            return (params, opt_state, cont), aux

        (params, opt_state, _), auxes = jax.lax.scan(
            mb_step, (state.params, opt_state, jnp.asarray(True)), mb_idx)

        metrics = {k: jnp.mean(v) for k, v in auxes.items()}
        metrics["explained_variance"] = self._pmean(
            explained_variance(flat[3], flat[5]))
        metrics["learning_rate"] = lr
        metrics["clip_range"] = clip_range
        metrics["std"] = jnp.mean(jnp.exp(self._log_std_leaf(params)))

        new_state = OnPolicyState(params, opt_state, env_states, last_obs,
                                  next_key)
        return new_state, metrics, stats

    # ------------------------------------------------------------------
    def _inference_params(self):
        return self._state.params

    def _predict_fn(self, params, obs, deterministic, key):
        mean, log_std, _ = self.net.apply(params, obs)
        action = jnp.where(deterministic, mean,
                           gaussian_sample(key, mean, log_std))
        return self._to_env_action(action)

    # ------------------------------------------------------------------
    def _save_payload(self):
        return {"params": self._state.params,
                "opt_state": self._state.opt_state,
                "config": dataclasses.asdict(self.cfg)}

    def _load_payload(self, payload):
        self._state = self._state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, payload["params"]))
        if payload.get("opt_state") is not None:
            import warnings

            try:
                restored = jax.tree_util.tree_map(
                    jnp.asarray, payload["opt_state"],
                    is_leaf=lambda x: isinstance(x, np.ndarray))
                # validate structure AND leaf shapes against the fresh opt
                # state before adopting — a silent mismatch would only blow
                # up (or quietly mis-train) at the next jit
                def _check(new, cur):
                    ns = jnp.shape(new)
                    cs = jnp.shape(cur)
                    if ns != cs:
                        raise ValueError(
                            f"opt_state leaf shape {ns} != expected {cs}")
                    return new
                restored = jax.tree_util.tree_map(
                    _check, restored, self._state.opt_state)
                self._state = self._state.replace(opt_state=restored)
            except (ValueError, TypeError, KeyError) as e:
                # genuine shape/structure drift (e.g. net_arch override at
                # load): fall back to fresh Adam moments, but say so —
                # anything else (corrupt payload) propagates
                warnings.warn(
                    "PPO.load: saved optimizer state incompatible with the "
                    f"current model ({e}); keeping fresh optimizer state")
