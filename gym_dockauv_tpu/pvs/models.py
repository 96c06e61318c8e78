"""Linear maneuvering models (python_vehicle_simulator/lib/models.py)."""
from __future__ import annotations

import jax.numpy as jnp


def clarke83(u_speed, length, beam, draft, cb, r66, xg, t_surge):
    """Clarke et al. (1983) regression 3x3 (M, N) surge/sway/yaw matrices
    (models.py:12-109): M nu_dot + N(U) nu = tau, where N folds linearized
    Coriolis + damping.  Pure jnp so speed-dependent re-evaluation traces
    into the step (shipClarke83 rebuilds it from the relative speed every
    tick, shipClarke83.py:196-199)."""
    rho = 1025.0
    vol = cb * length * beam * draft
    m = rho * vol
    iz = m * r66 ** 2 + m * xg ** 2
    mrb = jnp.array([[m, 0.0, 0.0],
                     [0.0, m, m * xg],
                     [0.0, m * xg, iz]])

    xudot = -0.1 * m
    u_speed = u_speed + 0.001  # avoid the U = 0 singularity (models.py:66)
    xu = -((m - xudot) / t_surge) / (0.5 * rho * length ** 2 * u_speed)
    xudot_nd = xudot / (0.5 * rho * length ** 3)

    s = jnp.pi * (draft / length) ** 2
    b_t = beam / draft
    b_l = beam / length
    yvdot = -s * (1.0 + 0.16 * cb * b_t - 5.1 * b_l ** 2)
    yrdot = -s * (0.67 * b_l - 0.0033 * b_t ** 2)
    nvdot = -s * (1.1 * b_l - 0.041 * b_t)
    nrdot = -s * (1.0 / 12.0 + 0.017 * cb * b_t - 0.33 * b_l)
    yv = -s * (1.0 + 0.4 * cb * b_t)
    yr = -s * (-0.5 + 2.2 * b_l - 0.08 * b_t)
    nv = -s * (0.5 + 2.4 * draft / length)
    nr = -s * (0.25 + 0.039 * b_t - 0.56 * b_l)

    ma_prime = jnp.array([[-xudot_nd, 0.0, 0.0],
                          [0.0, -yvdot, -yrdot],
                          [0.0, -nvdot, -nrdot]])
    n_prime = jnp.array([[-xu, 0.0, 0.0],
                         [0.0, -yv, -yr],
                         [0.0, -nv, -nr]])

    t = jnp.diag(jnp.array([1.0, 1.0, 1.0 / length]))
    tinv = jnp.diag(jnp.array([1.0, 1.0, length]))
    ma = (0.5 * rho * length ** 3) * tinv @ tinv @ (t @ (ma_prime @ tinv))
    n = (0.5 * rho * length ** 2 * u_speed) * tinv @ tinv @ (t @ (n_prime @ tinv))
    return mrb + ma, n
