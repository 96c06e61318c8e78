"""Action distributions.

Pure-function counterparts of stable_baselines3/common/distributions.py:699
(DiagGaussianDistribution used by PPO/A2C, SquashedDiagGaussianDistribution
used by SAC).  No distribution objects — every op is a function of
(mean, log_std) so it traces cleanly under jit/vmap/scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_STD_MAX = 2.0
LOG_STD_MIN = -20.0  # SAC actor clamp (sac/policies.py:30-31)
_HALF_LOG_2PI = 0.5 * jnp.log(2.0 * jnp.pi)


# -- diagonal Gaussian (PPO / A2C) -----------------------------------------
def gaussian_sample(key, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, mean.dtype)


def gaussian_log_prob(actions, mean, log_std):
    """Sum of per-dimension log densities (distributions.py:145-152)."""
    var = jnp.exp(2.0 * log_std)
    lp = -0.5 * jnp.square(actions - mean) / var - log_std - _HALF_LOG_2PI
    return jnp.sum(lp, axis=-1)


def gaussian_entropy(log_std):
    """Summed diagonal entropy (distributions.py:154-156)."""
    return jnp.sum(log_std + 0.5 + _HALF_LOG_2PI, axis=-1)


# -- tanh-squashed Gaussian (SAC) -------------------------------------------
def squashed_sample_and_log_prob(key, mean, log_std, epsilon: float = 1e-6):
    """Sample a in (-1,1) plus its log-prob with the tanh Jacobian correction
    log pi(a) = log N(u) - sum log(1 - tanh(u)^2 + eps)
    (distributions.py:198-222)."""
    u = gaussian_sample(key, mean, log_std)
    a = jnp.tanh(u)
    log_prob = gaussian_log_prob(u, mean, log_std)
    log_prob -= jnp.sum(jnp.log(1.0 - jnp.square(a) + epsilon), axis=-1)
    return a, log_prob


def squashed_mode(mean):
    return jnp.tanh(mean)
