"""Ocean current disturbance models.

Two models, matching the reference:

1. Gauss-Markov point current (gym_dockauv/objects/current.py:7-105):
   first-order process V_c' = V_c + dt*(-mu*V_c + w), clipped to
   [V_min, V_max], with fixed flow angles (alpha, beta); rotated into the
   body frame on demand.  State is a per-env scalar; noise comes from the
   env's PRNG key (replacing the reference's global np.random).

2. Parabola grid field (gym_dockauv/objects/genenate_current.py): the
   reference precomputes a 200^3 lookup table into `current.pkl` at import
   time.  Here the field is evaluated in closed form from the generator
   math — no 64 MB table in HBM, no pickle dependency — while reproducing
   the exact nearest-lower-index semantics (including the deliberate x/y
   argument swap at genenate_current.py:142-143 and the call-site ordering
   at current.py:58, and numpy's negative-index wraparound when the query
   is left of the grid).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import geom

# --------------------------------------------------------------------------
# Gauss-Markov current
# --------------------------------------------------------------------------


@struct.dataclass
class CurrentParams:
    """Per-episode current configuration (reference Current.__init__)."""

    mu: jnp.ndarray
    v_min: jnp.ndarray
    v_max: jnp.ndarray
    alpha: jnp.ndarray  # flow elevation angle (constant in NED)
    beta: jnp.ndarray  # flow azimuth angle
    white_noise_std: jnp.ndarray
    current_scale: jnp.ndarray  # used only by the grid-field path


def make_current_params(
    mu=0.005,
    v_min=0.0,
    v_max=0.0,
    alpha=0.0,
    beta=0.0,
    white_noise_std=0.0,
    current_scale=1.0,
    dtype=jnp.float32,
) -> CurrentParams:
    c = lambda x: jnp.asarray(x, dtype=dtype)
    return CurrentParams(
        mu=c(mu),
        v_min=c(v_min),
        v_max=c(v_max),
        alpha=c(alpha),
        beta=c(beta),
        white_noise_std=c(white_noise_std),
        current_scale=c(current_scale),
    )


def gauss_markov_step(
    params: CurrentParams, v_c: jnp.ndarray, key: jax.Array, dt: float
) -> jnp.ndarray:
    """One step of the linear GM model (current.py:87-105)."""
    w = params.white_noise_std * jax.random.normal(key, v_c.shape, v_c.dtype)
    v_c = v_c + (-params.mu * v_c + w) * dt
    return jnp.clip(v_c, params.v_min, params.v_max)


def current_ned(params: CurrentParams, v_c: jnp.ndarray) -> jnp.ndarray:
    """NED flow vector from speed + fixed angles (current.py:64-85)."""
    return jnp.stack(
        [
            v_c * jnp.cos(params.alpha) * jnp.cos(params.beta),
            v_c * jnp.sin(params.beta),
            v_c * jnp.sin(params.alpha) * jnp.cos(params.beta),
        ],
        axis=-1,
    )


def nu_c_body(attitude: jnp.ndarray, vel_ned: jnp.ndarray) -> jnp.ndarray:
    """Rotate a NED flow vector into the body frame, pad to 6-vector
    (current.py:35-62)."""
    r = geom.rzyx(attitude[..., 0], attitude[..., 1], attitude[..., 2])
    vb = jnp.einsum("...ji,...j->...i", r, vel_ned)  # R^T v
    return jnp.concatenate([vb, jnp.zeros_like(vb)], axis=-1)


# --------------------------------------------------------------------------
# Parabola grid field (closed form)
# --------------------------------------------------------------------------

_GRID_N = 200
# Lookup grids (genenate_current.py:19-21,129-131): the index grids span
# [-20, 20]; the generator's value grids span [-10, 10] in x/y.
_LOOKUP_MIN, _LOOKUP_MAX = -20.0, 20.0
_VALUE_MIN, _VALUE_MAX = -10.0, 10.0


def _lookup_index(v: jnp.ndarray, dtype) -> jnp.ndarray:
    """Nearest-lower grid index: sum(v >= grid) - 1 (genenate_current.py:
    164-166), with numpy's -1 wraparound emulated as index 199."""
    grid = jnp.linspace(_LOOKUP_MIN, _LOOKUP_MAX, _GRID_N, dtype=dtype)
    idx = jnp.sum(v[..., None] >= grid, axis=-1) - 1
    return jnp.where(idx < 0, idx + _GRID_N, idx)


def grid_current_ned(position: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Closed-form evaluation of the reference's precomputed field.

    The generator (genenate_current.py:36-55, run once to produce
    current.pkl) builds, with numpy meshgrid 'xy' semantics
    (U[i, j, k]: X -> x[j], Y -> y[i]):

        distance  = |y_i - 0.25*(x_j - (-4))*(x_j - 4)|
        direction = normalize([1, x_j])        (parabola tangent)
        magnitude = min((0.5 + k/200) * exp(-distance) + 0.3, 1)
        U = magnitude*direction[0]; V = magnitude*direction[1]; W = 0

    The lookup (current.py:58 -> generate_current(p_N, p_E, p_D, 0) with
    signature (input_y, input_x, input_z, t)) indexes U[ind(p_E), ind(p_N),
    ind(p_D)], so i <- p_E and j <- p_N.

    position (..., 3) NED -> (..., 3) NED flow vector.
    """
    if dtype is None:
        dtype = position.dtype
    p_n, p_e, p_d = position[..., 0], position[..., 1], position[..., 2]
    i = _lookup_index(p_e, dtype)  # row index (generator's y axis)
    j = _lookup_index(p_n, dtype)  # column index (generator's x axis)
    k = _lookup_index(p_d, dtype)

    value_grid = jnp.linspace(_VALUE_MIN, _VALUE_MAX, _GRID_N, dtype=dtype)
    x_j = value_grid[j]
    y_i = value_grid[i]
    distance = jnp.abs(y_i - 0.25 * (x_j + 4.0) * (x_j - 4.0))
    inv_norm = 1.0 / jnp.sqrt(1.0 + x_j * x_j)
    magnitude = jnp.minimum(
        (0.5 + k.astype(dtype) / _GRID_N) * jnp.exp(-distance) + 0.3, 1.0
    )
    u = magnitude * inv_norm
    v = magnitude * x_j * inv_norm
    return jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)


def nu_c_from_position(
    params: CurrentParams, attitude: jnp.ndarray, position: jnp.ndarray
) -> jnp.ndarray:
    """Grid-field current in body frame (current.py:55-61): ignores V_c,
    uses current_scale * field(position)."""
    vel_ned = params.current_scale[..., None] * grid_current_ned(position)
    return nu_c_body(attitude, vel_ned)
