"""On-device experience buffers.

Replaces stable_baselines3/common/buffers.py:153-769.  The reference keeps a
NumPy ring buffer on host and copies minibatches to the torch device every
gradient step; here the whole buffer is a device-resident pytree — adds are
`x.at[pos].set(...)` inside the jitted collect step and samples are gathers
inside the jitted train step, so experience never crosses the host boundary.

Layout matches SB3: (capacity, n_envs, dim) with a step-ring position; a
sampled index is a (step, env) pair.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    obs: jnp.ndarray  # (C, N, O)
    next_obs: jnp.ndarray  # (C, N, O)
    actions: jnp.ndarray  # (C, N, A) stored scaled to [-1,1] (SB3 convention)
    rewards: jnp.ndarray  # (C, N)
    dones: jnp.ndarray  # (C, N) float32.  Timeouts ARE terminal here, which
    # matches the reference exactly: SB3's handle_timeout_termination
    # (buffers.py:257) keys on info["TimeLimit.truncated"], which the
    # gym-0.21 docking envs never set — the reference's timeout episodes
    # are stored as plain terminals too (docs/parity.md "Timeout
    # semantics"), so no adjustment knob exists on either side.
    pos: jnp.ndarray  # () int32 next write slot
    full: jnp.ndarray  # () bool

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]

    @property
    def size(self) -> jnp.ndarray:
        return jnp.where(self.full, self.capacity, self.pos)


def replay_init(capacity: int, n_envs: int, obs_dim: int, act_dim: int,
                dtype=jnp.float32) -> ReplayState:
    c = int(capacity)
    return ReplayState(
        obs=jnp.zeros((c, n_envs, obs_dim), dtype),
        next_obs=jnp.zeros((c, n_envs, obs_dim), dtype),
        actions=jnp.zeros((c, n_envs, act_dim), dtype),
        rewards=jnp.zeros((c, n_envs), dtype),
        dones=jnp.zeros((c, n_envs), dtype),
        pos=jnp.zeros((), jnp.int32),
        full=jnp.zeros((), bool),
    )


def replay_add(rb: ReplayState, obs, next_obs, action, reward, done) -> ReplayState:
    p = rb.pos
    return rb.replace(
        obs=rb.obs.at[p].set(obs),
        next_obs=rb.next_obs.at[p].set(next_obs),
        actions=rb.actions.at[p].set(action),
        rewards=rb.rewards.at[p].set(reward),
        dones=rb.dones.at[p].set(done),
        pos=(p + 1) % rb.capacity,
        full=rb.full | (p + 1 >= rb.capacity),
    )


def replay_sample(rb: ReplayState, key: jax.Array, batch_size: int):
    """Uniform (step, env) sample (buffers.py:262-306)."""
    k1, k2 = jax.random.split(key)
    n_envs = rb.obs.shape[1]
    step_idx = jax.random.randint(k1, (batch_size,), 0, rb.size)
    env_idx = jax.random.randint(k2, (batch_size,), 0, n_envs)
    return (
        rb.obs[step_idx, env_idx],
        rb.actions[step_idx, env_idx],
        rb.next_obs[step_idx, env_idx],
        rb.rewards[step_idx, env_idx],
        rb.dones[step_idx, env_idx],
    )
