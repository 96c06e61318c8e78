"""Policy / value networks (flax).

Architecture + initialization parity with the reference's vendored SB3 1.5.0
policies (stable_baselines3/common/policies.py:379-961, torch_layers.py:317,
sac/policies.py:26-120, td3/policies.py):

* PPO/A2C `ActorCriticPolicy`: separate pi/vf tanh MLPs (default [64,64]),
  orthogonal init (gain sqrt(2) hidden, 0.01 action head, 1.0 value head),
  state-independent log_std parameter.
* SAC actor: ReLU [256,256] trunk, mu + clamped log_std heads, tanh squash;
  twin ReLU Q-critics; PyTorch-default uniform fan-in init.
* TD3/DDPG: ReLU [400,300] deterministic tanh actor + twin critics.
* DQN: ReLU [64,64] Q-network.

These are tiny matmuls individually — the throughput comes from batching
thousands of envs so XLA tiles them onto the MXU, not from kernel tricks.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .distributions import LOG_STD_MAX, LOG_STD_MIN


def torch_linear_init(key, shape, dtype=jnp.float32):
    """PyTorch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MLP(nn.Module):
    """Plain MLP trunk; `ortho_gain=None` selects torch-default init."""

    features: Sequence[int]
    activation: Callable = nn.relu
    ortho_gain: float | None = None
    activate_final: bool = True

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            if self.ortho_gain is not None:
                kernel_init = nn.initializers.orthogonal(self.ortho_gain)
                bias_init = nn.initializers.zeros_init()
            else:
                kernel_init = torch_linear_init
                bias_init = torch_bias_init(x.shape[-1])
            x = nn.Dense(f, kernel_init=kernel_init, bias_init=bias_init)(x)
            if self.activate_final or i < len(self.features) - 1:
                x = self.activation(x)
        return x


class ActorCritic(nn.Module):
    """PPO/A2C policy: separate tanh pi/vf MLPs + linear heads + log_std."""

    n_actions: int
    net_arch: Tuple[int, ...] = (64, 64)
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs):
        latent_pi = MLP(self.net_arch, nn.tanh, ortho_gain=jnp.sqrt(2.0),
                        name="mlp_pi")(obs)
        latent_vf = MLP(self.net_arch, nn.tanh, ortho_gain=jnp.sqrt(2.0),
                        name="mlp_vf")(obs)
        mean = nn.Dense(self.n_actions,
                        kernel_init=nn.initializers.orthogonal(0.01),
                        bias_init=nn.initializers.zeros_init(),
                        name="action_net")(latent_pi)
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         bias_init=nn.initializers.zeros_init(),
                         name="value_net")(latent_vf)
        log_std = self.param("log_std",
                             nn.initializers.constant(self.log_std_init),
                             (self.n_actions,))
        return mean, log_std, jnp.squeeze(value, -1)

    def value(self, obs):
        return self(obs)[2]


class SACActor(nn.Module):
    """Squashed-Gaussian actor (sac/policies.py:26-120); returns (mu, log_std)
    pre-squash; sampling/log-prob live in distributions.py."""

    n_actions: int
    net_arch: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        latent = MLP(self.net_arch, nn.relu, name="latent_pi")(obs)
        mu = nn.Dense(self.n_actions, kernel_init=torch_linear_init,
                      bias_init=torch_bias_init(latent.shape[-1]),
                      name="mu")(latent)
        log_std = nn.Dense(self.n_actions, kernel_init=torch_linear_init,
                           bias_init=torch_bias_init(latent.shape[-1]),
                           name="log_std")(latent)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
        return mu, log_std


class QCritic(nn.Module):
    """Single continuous Q(s,a) head (policies.py:823-886)."""

    net_arch: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        x = MLP(self.net_arch, nn.relu, name="qf_latent")(x)
        q = nn.Dense(1, kernel_init=torch_linear_init,
                     bias_init=torch_bias_init(x.shape[-1]), name="qf_out")(x)
        return jnp.squeeze(q, -1)


class TwinQCritic(nn.Module):
    """n_critics=2 ContinuousCritic: both Q values in one module so one
    forward serves min-twin targets (policies.py:823-886)."""

    net_arch: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs, action):
        q1 = QCritic(self.net_arch, name="qf0")(obs, action)
        q2 = QCritic(self.net_arch, name="qf1")(obs, action)
        return q1, q2


class DeterministicActor(nn.Module):
    """TD3/DDPG actor: tanh output in [-1,1] (td3/policies.py:26-80)."""

    n_actions: int
    net_arch: Tuple[int, ...] = (400, 300)

    @nn.compact
    def __call__(self, obs):
        latent = MLP(self.net_arch, nn.relu, name="latent_pi")(obs)
        a = nn.Dense(self.n_actions, kernel_init=torch_linear_init,
                     bias_init=torch_bias_init(latent.shape[-1]),
                     name="mu")(latent)
        return jnp.tanh(a)


class QNetwork(nn.Module):
    """DQN discrete Q-network (dqn/policies.py:13-70)."""

    n_actions: int
    net_arch: Tuple[int, ...] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        latent = MLP(self.net_arch, nn.relu, name="q_latent")(obs)
        return nn.Dense(self.n_actions, kernel_init=torch_linear_init,
                        bias_init=torch_bias_init(latent.shape[-1]),
                        name="q_out")(latent)
