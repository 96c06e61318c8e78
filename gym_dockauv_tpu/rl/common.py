"""Shared learner utilities.

Functional equivalents of stable_baselines3/common/utils.py:505 (schedules,
polyak update, explained variance), noise.py:167 (action noise) and the
Monitor episode-statistics role (monitor.py:17) — the latter implemented as
masked accumulators materialized once per learn iteration instead of
per-step host callbacks.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def constant_schedule(value: float) -> Schedule:
    def fn(progress_remaining):
        return jnp.asarray(value, jnp.float32)

    return fn


def linear_schedule(start: float, end: float = 0.0) -> Schedule:
    """SB3 `get_linear_fn` semantics: value = end + progress_remaining*(start-end)
    where progress_remaining goes 1 -> 0 over training (utils.py:88-100)."""

    def fn(progress_remaining):
        return end + progress_remaining * (start - end)

    return fn


def as_schedule(value) -> Schedule:
    if callable(value):
        return value
    return constant_schedule(float(value))


def polyak_update(params, target_params, tau: float):
    """target <- tau*params + (1-tau)*target (utils.py:445-465)."""
    return jax.tree_util.tree_map(
        lambda p, tp: tau * p + (1.0 - tau) * tp, params, target_params
    )


def explained_variance(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """1 - Var[y_true - y_pred]/Var[y_true] (utils.py:47-63)."""
    var_y = jnp.var(y_true)
    return jnp.where(var_y == 0, jnp.nan, 1.0 - jnp.var(y_true - y_pred) / var_y)


def scale_action(action, low, high):
    """Env units -> [-1, 1] (base_class policies scale_action)."""
    return 2.0 * (action - low) / (high - low) - 1.0


def unscale_action(action, low, high):
    """[-1, 1] -> env units."""
    return low + 0.5 * (action + 1.0) * (high - low)


class RunningMeanStd:
    """Numerically stable running mean/var (common/running_mean_std.py:5-40),
    host-side; used by the VecNormalize-equivalent wrapper."""

    def __init__(self, epsilon: float = 1e-4, shape=()):
        self.mean = np.zeros(shape, np.float64)
        self.var = np.ones(shape, np.float64)
        self.count = epsilon

    def update(self, arr: np.ndarray) -> None:
        batch_mean = np.mean(arr, axis=0)
        batch_var = np.var(arr, axis=0)
        batch_count = arr.shape[0]
        delta = batch_mean - self.mean
        tot_count = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot_count
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        m_2 = m_a + m_b + np.square(delta) * self.count * batch_count / tot_count
        self.mean, self.var, self.count = new_mean, m_2 / tot_count, tot_count


class NormalActionNoise:
    """Gaussian action noise (noise.py:23-52), functional sampling."""

    def __init__(self, mean, sigma):
        self.mean = jnp.asarray(mean)
        self.sigma = jnp.asarray(sigma)

    def sample(self, key, shape=()):
        return self.mean + self.sigma * jax.random.normal(
            key, shape + self.mean.shape
        )


class OrnsteinUhlenbeckActionNoise:
    """OU process noise (noise.py:55-110) as a pure step function; the state
    is carried by the caller (e.g. inside the learner scan)."""

    def __init__(self, mean, sigma, theta: float = 0.15, dt: float = 1e-2):
        self.mean = jnp.asarray(mean)
        self.sigma = jnp.asarray(sigma)
        self.theta = theta
        self.dt = dt

    def initial_state(self):
        return jnp.zeros_like(self.mean)

    def step(self, noise_prev, key):
        noise = (
            noise_prev
            + self.theta * (self.mean - noise_prev) * self.dt
            + self.sigma * jnp.sqrt(self.dt)
            * jax.random.normal(key, self.mean.shape)
        )
        return noise, noise


class EpisodeStats(NamedTuple):
    """Per-rollout episode bookkeeping gathered inside the collect scan.

    `returns`/`lengths` are only meaningful where `dones` is True; the host
    aggregates them into the SB3 `ep_info_buffer` equivalent
    (base_class.py:499-513)."""

    dones: jnp.ndarray  # (T, N) bool
    returns: jnp.ndarray  # (T, N) cumulative reward at episode end
    lengths: jnp.ndarray  # (T, N) int32 episode length at end
    goal_reached: jnp.ndarray  # (T, N) bool
    collision: jnp.ndarray  # (T, N) bool
    cum_reward_arr: jnp.ndarray  # (T, N, 13) cumulative reward decomposition


def summarize_episode_stats(stats: EpisodeStats) -> dict:
    """Host-side reduction of the masked accumulators."""
    dones = np.asarray(stats.dones)
    n = int(dones.sum())
    out = {"episodes": n}
    if n:
        out["ep_rew_mean"] = float(np.asarray(stats.returns)[dones].mean())
        out["ep_len_mean"] = float(np.asarray(stats.lengths)[dones].mean())
        out["success_rate"] = float(np.asarray(stats.goal_reached)[dones].mean())
        out["collision_rate"] = float(np.asarray(stats.collision)[dones].mean())
    return out


def flat_grad_norm(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
