"""Off-policy learner scaffolding.

Covers stable_baselines3/common/off_policy_algorithm.py:25-623: the
collect->store->train alternation, warmup with uniform random actions before
`learning_starts`, train_freq/gradient_steps scheduling, and action
scaling (policy works in [-1,1]; env receives unscaled actions, the buffer
stores scaled ones, off_policy_algorithm.py:366-420).

TPU shape: one jitted `_iteration` = `lax.scan` of train_freq collect steps
over the vmapped env batch (replay writes are in-graph `at[].set`) followed
by `lax.scan` of gradient_steps sampled updates, gated by a traced
`should_train` mask instead of host branching — so the warmup phase compiles
into the same program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import BaseAlgorithm
from .buffers import replay_add, replay_init, replay_sample
from .common import EpisodeStats, scale_action, unscale_action


class OffPolicyAlgorithm(BaseAlgorithm):
    """Subclasses define: state pytree with fields
    (replay, env_states, last_obs, key, num_ts, ...), plus hooks
    `_explore_action`, `_grad_update`, `_extra_iteration_metrics`."""

    # -- hooks -------------------------------------------------------------
    def _explore_action(self, state, obs, key):
        """Policy action in scaled [-1,1] units (training/exploration mode)."""
        raise NotImplementedError

    def _random_action(self, state, key, shape):
        """Warmup action, scaled units (uniform, matching space.sample())."""
        return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)

    def _env_action(self, state, scaled):
        """Scaled -> env units."""
        return unscale_action(scaled, self._action_low, self._action_high)

    def _grad_update(self, state, batch, should_train, update_index, key):
        """One gradient step on a replay batch; returns (state, metrics)."""
        raise NotImplementedError

    # -- shared pieces -------------------------------------------------------
    def _init_replay(self, n_act: int | None = None):
        return replay_init(self.cfg.buffer_size // self.n_envs, self.n_envs,
                           self.core.n_observations,
                           n_act if n_act is not None else self.core.n_actions)

    def _replay_record(self, st, res, next_obs, scaled):
        """Write one transition batch; HER overrides to store goal data."""
        return replay_add(st.replay, st.last_obs, next_obs, scaled,
                          res.reward, res.done.astype(jnp.float32))

    def _sample_replay(self, replay, key, batch_size):
        """Uniform sample; HER overrides with goal relabeling."""
        return replay_sample(replay, key, batch_size)

    @property
    def _jit_iters(self) -> int:
        return max(int(getattr(self.cfg, "jit_iters", 1)), 1)

    @property
    def _steps_per_iteration(self) -> int:
        return self.cfg.train_freq * self.n_envs * self._jit_iters

    def _collect(self, state, n_steps: int):
        """n_steps of explore-act -> env step -> replay add."""
        step_env = jax.vmap(self.core.step_autoreset)
        learning_starts = self.cfg.learning_starts

        def body(carry, _):
            st = carry
            key, k_act, k_rand = jax.random.split(st.key, 3)
            out = self._explore_action(st, st.last_obs, k_act)
            # stateful exploration (OU noise) returns (action, state)
            scaled_policy, st = out if isinstance(out, tuple) else (out, st)
            scaled_rand = self._random_action(
                st, k_rand, scaled_policy.shape)
            warmup = st.num_ts < learning_starts
            scaled = jnp.where(warmup, scaled_rand, scaled_policy)
            env_action = self._env_action(st, scaled)
            env_states, res = step_env(st.env_states, env_action)
            # true next obs: terminal observation when the episode ended
            # (off_policy_algorithm.py:404-420 terminal_observation handling)
            next_obs = jnp.where(res.done[:, None],
                                 res.info.terminal_observation, res.obs)
            replay = self._replay_record(st, res, next_obs, scaled)
            stats = EpisodeStats(res.done, res.info.cumulative_reward,
                                 res.info.t_step, res.info.goal_reached,
                                 res.info.collision, res.info.cum_reward_arr)
            st = st.replace(replay=replay, env_states=env_states,
                            last_obs=res.obs, key=key,
                            num_ts=st.num_ts + self.n_envs)
            st = self._post_step(st, res)
            return st, stats

        return jax.lax.scan(body, state, None, length=n_steps)

    def _post_step(self, st, res):
        """Per-step hook after the env transition (e.g. OU-noise reset on
        episode done, off_policy_algorithm.py:615)."""
        return st

    def _run_iteration(self, progress_remaining: float):
        if getattr(self.cfg, "train_freq_unit", "step") == "step":
            return super()._run_iteration(progress_remaining)
        return self._episode_iteration(progress_remaining)

    def _episode_iteration(self, progress_remaining: float):
        """SB3 episode-unit train_freq (off_policy_algorithm.py:555-623 +
        utils.should_collect_more_steps): step the vec env until
        `train_freq` episodes have finished anywhere in the batch, then run
        `gradient_steps` updates (-1 = one per env step collected, the SB3
        default pairing for TD3/DDPG's (1, "episode") train_freq).

        Host-driven by necessity — the collect length is data-dependent —
        so each env step and each gradient update is its own device
        dispatch.  That is exactly the reference's execution model (and
        still ~10x its throughput on CPU), but orders of magnitude slower
        than the fused step-unit path; use it for SB3 semantics parity,
        not for production training."""
        import numpy as np

        cfg = self.cfg
        if not hasattr(self, "_collect1_jit"):
            self._collect1_jit = jax.jit(lambda st: self._collect(st, 1))

            def _upd1(st, i):
                batch_size = self._local_batch(st.last_obs.shape[0],
                                               cfg.batch_size)
                key, k_samp, k_upd = jax.random.split(st.key, 3)
                batch = self._sample_replay(st.replay, k_samp, batch_size)
                st, metrics = self._grad_update(
                    st, batch, jnp.asarray(True), i, k_upd)
                return st.replace(key=key), metrics

            self._update1_jit = jax.jit(_upd1)

        episodes = 0
        steps = 0
        # every episode terminates within max_timesteps (is_done's cap), so
        # this bound is unreachable unless the env is broken
        bound = int(self.core.config.max_timesteps) + 2
        chunks = []
        while episodes < cfg.train_freq and steps < bound:
            self._state, stats = self._collect1_jit(self._state)
            chunks.append(stats)
            episodes += int(np.asarray(stats.dones).sum())
            steps += 1
        ep_stats = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *chunks)

        metrics: dict = {}
        if int(self._state.num_ts) >= cfg.learning_starts:
            n_updates = (cfg.gradient_steps if cfg.gradient_steps >= 0
                         else steps * self.n_envs)
            acc = []
            for i in range(n_updates):
                self._state, m = self._update1_jit(
                    self._state, jnp.asarray(i, jnp.int32))
                acc.append(m)
            if acc:
                metrics = {k: jnp.mean(jnp.stack([m[k] for m in acc]))
                           for k in acc[0]}
                metrics = self._pmean(metrics)
        metrics.update(self._extra_iteration_metrics(
            self._state, jnp.asarray(progress_remaining, jnp.float32)))
        return metrics, ep_stats, steps * self.n_envs

    def _iteration(self, state, progress_remaining):
        """One jitted program = jit_iters x (collect train_freq steps ->
        gradient_steps updates); jit_iters > 1 only amortizes dispatch."""
        k = self._jit_iters
        if k == 1:
            return self._cycle(state, progress_remaining)

        def one(st, _):
            st, metrics, stats = self._cycle(st, progress_remaining)
            return st, (metrics, stats)

        state, (metrics, stats) = jax.lax.scan(one, state, None, length=k)
        metrics = {key: jnp.mean(v) for key, v in metrics.items()}
        # stats leaves are (k, T, N): flatten the cycle axis into time
        stats = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), stats)
        return state, metrics, stats

    def _cycle(self, state, progress_remaining):
        cfg = self.cfg
        batch_size = self._local_batch(state.last_obs.shape[0], cfg.batch_size)
        work_key, next_key = self._work_keys(state)
        state, stats = self._collect(state.replace(key=work_key), cfg.train_freq)
        should_train = state.num_ts >= cfg.learning_starts

        def upd(carry, i):
            st, key = carry
            key, k_samp, k_upd = jax.random.split(key, 3)
            batch = self._sample_replay(st.replay, k_samp, batch_size)
            st, metrics = self._grad_update(st, batch, should_train, i, k_upd)
            return (st, key), metrics

        (state, key), metrics = jax.lax.scan(
            upd, (state, state.key), jnp.arange(cfg.gradient_steps))
        state = state.replace(key=next_key)
        metrics = {k: jnp.mean(v) for k, v in metrics.items()}
        # sharded: losses were computed on per-device local batches — average
        # them over the mesh so logged train/* values are global means, not
        # whichever replica's locals the runtime happens to return
        metrics = self._pmean(metrics)
        metrics.update(self._extra_iteration_metrics(state, progress_remaining))
        return state, metrics, stats

    def _extra_iteration_metrics(self, state, progress_remaining):
        return {}

    @staticmethod
    def _masked_apply(should, new_tree, old_tree):
        """Apply an update only when `should` (warmup gating in-graph)."""
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(should, a, b), new_tree, old_tree)

    def _scale(self, action):
        return scale_action(action, self._action_low, self._action_high)
