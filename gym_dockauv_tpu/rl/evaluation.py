"""Policy evaluation.

Role of stable_baselines3/common/evaluation.py:131 `evaluate_policy`, but
vectorized: N eval episodes run as one jitted scan over a vmapped env batch
with a done-latch (no auto-reset), so evaluation is one device call instead
of n_episodes host loops.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_policy(model, env=None, n_eval_episodes: int = 10,
                    deterministic: bool = True, seed: int = 0,
                    return_episode_rewards: bool = False):
    """Returns (mean_reward, std_reward) or the per-episode lists."""
    core = model.core if env is None else getattr(env, "core", env)
    max_t = core.config.max_timesteps + 1

    def rollout(params, key):
        k_env, k_act = jax.random.split(key)
        keys = jax.random.split(k_env, n_eval_episodes)
        episodes = jnp.zeros((n_eval_episodes,), jnp.int32)
        states, obs = jax.vmap(core.reset)(keys, episodes)
        step_env = jax.vmap(core.step)

        def body(carry, _):
            states, obs, alive, reward_acc, len_acc, goal, key = carry
            key, k = jax.random.split(key)
            action = model._predict_fn(params, obs, deterministic, k)
            states, res = step_env(states, action)
            reward_acc = reward_acc + res.reward * alive
            len_acc = len_acc + alive.astype(jnp.int32)
            goal = goal | (res.info.goal_reached & alive)
            alive = alive & ~res.done
            return (states, res.obs, alive, reward_acc, len_acc, goal, key), None

        init = (states, obs, jnp.ones((n_eval_episodes,), bool),
                jnp.zeros((n_eval_episodes,)),
                jnp.zeros((n_eval_episodes,), jnp.int32),
                jnp.zeros((n_eval_episodes,), bool), k_act)
        (states, obs, alive, rewards, lengths, goal, _), _ = jax.lax.scan(
            body, init, None, length=max_t)
        return rewards, lengths, goal

    cache = getattr(model, "_eval_cache", None)
    cache_key = ("eval", n_eval_episodes, deterministic)
    rollout_jit = None
    if cache is not None and cache_key in cache:
        # the cached rollout closed over a specific env core: only reuse it
        # if that exact core is still the one we're evaluating (a plain
        # id(core) key could alias a recycled id after GC)
        core_ref, cached_fn = cache[cache_key]
        if core_ref() is core:
            rollout_jit = cached_fn
    if rollout_jit is None:
        import weakref

        rollout_jit = jax.jit(rollout)
        if cache is not None:
            cache[cache_key] = (weakref.ref(core), rollout_jit)
    rewards, lengths, goal = rollout_jit(
        model._inference_params(), jax.random.PRNGKey(seed))
    rewards = np.asarray(rewards)
    lengths = np.asarray(lengths)
    if return_episode_rewards:
        return rewards.tolist(), lengths.tolist()
    return float(rewards.mean()), float(rewards.std())
