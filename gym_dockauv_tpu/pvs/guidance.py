"""Guidance algorithms (python_vehicle_simulator/lib/guidance.py:19-34)."""
from __future__ import annotations

import jax.numpy as jnp


def ref_model3(x_d, v_d, a_d, r, wn_d, zeta_d, v_max, dt):
    """3rd-order reference model producing smooth desired position/velocity/
    acceleration with |v_d| <= v_max.  Integration order mirrors the
    reference exactly: jerk from the old states, then Euler updates of
    (x_d, v_d, a_d), then velocity saturation (guidance.py:19-34)."""
    j_d = (wn_d ** 3) * (r - x_d) \
        - (2.0 * zeta_d + 1.0) * wn_d ** 2 * v_d \
        - (2.0 * zeta_d + 1.0) * wn_d * a_d
    x_d = x_d + dt * v_d
    v_d = v_d + dt * a_d
    a_d = a_d + dt * j_d
    v_d = jnp.clip(v_d, -v_max, v_max)
    return x_d, v_d, a_d
