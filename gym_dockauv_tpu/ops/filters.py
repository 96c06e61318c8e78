"""Discrete filters.

Role of gym_dockauv/utils/lowpassfilter.py:5-45: first-order low-pass on
the actuator command, alpha = dt/(dt + T1) with T1 = 0.2 s by default.
Pure functions (batched over arbitrary leading dims); the Fossen vehicle
step (dynamics/statespace.py fossen_vehicle_step) composes these on its
hot path.
"""
from __future__ import annotations

import jax.numpy as jnp


def lowpass_alpha(dt, t1):
    """Filter coefficient alpha = dt / (dt + T1) (lowpassfilter.py:24-30)."""
    return dt / (dt + t1)


def apply_lowpass(x_new, x_prev, dt, t1=0.2):
    """One first-order LPF update: alpha*x_new + (1-alpha)*x_prev
    (lowpassfilter.py:32-45)."""
    alpha = lowpass_alpha(dt, t1)
    return alpha * x_new + (1.0 - alpha) * x_prev


def apply_lowpass_sequence(xs, x0, dt, t1=0.2):
    """Filter a whole (T, ...) sequence via an associative scan — the
    recurrence y_t = a*x_t + (1-a)*y_{t-1} computed in O(log T) depth on
    TPU (jnp.cumsum-style associative_scan on the affine maps)."""
    import jax

    alpha = lowpass_alpha(dt, t1)
    a = jnp.full(xs.shape, 1.0 - alpha)
    b = alpha * xs

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    a_sc, b_sc = jax.lax.associative_scan(combine, (a, b), axis=0)
    return a_sc * x0 + b_sc
