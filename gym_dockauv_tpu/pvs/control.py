"""Control laws (python_vehicle_simulator/lib/control.py:18-83), functional:
controller integrator/reference states ride in explicit pytrees instead of
object attributes, so autopilots compose into `lax.scan` sim loops and vmap
over vehicle batches.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.geom import rzyx, ssa
from .guidance import ref_model3


class PIDState(NamedTuple):
    """(integral error, reference-model position/velocity/acceleration)."""

    e_int: jnp.ndarray
    x_d: jnp.ndarray
    v_d: jnp.ndarray
    a_d: jnp.ndarray

    @classmethod
    def zero(cls):
        z = jnp.zeros(())
        return cls(z, z, z, z)


def pid_pole_placement(st: PIDState, e_x, e_v, m, d, k, wn_d, zeta_d, wn,
                       zeta, r, v_max, dt):
    """SISO PID with pole-placement gains + 3rd-order reference model
    (control.py:18-52).  Returns (u, next_state)."""
    kp = m * wn ** 2 - k
    kd = m * 2.0 * zeta * wn - d
    ki = (wn / 10.0) * kp
    u = -kp * e_x - kd * e_v - ki * st.e_int
    e_int = st.e_int + dt * e_x
    x_d, v_d, a_d = ref_model3(st.x_d, st.v_d, st.a_d, r, wn_d, zeta_d,
                               v_max, dt)
    return u, PIDState(e_int, x_d, v_d, a_d)


class DPState(NamedTuple):
    """(3-dim integral error, low-pass filtered x/y/psi setpoints)."""

    e_int: jnp.ndarray  # (3,)
    x_d: jnp.ndarray
    y_d: jnp.ndarray
    psi_d: jnp.ndarray

    @classmethod
    def zero(cls):
        z = jnp.zeros(())
        return cls(jnp.zeros(3), z, z, z)


def dp_pole_placement(st: DPState, m3, d3, eta3, nu3, wn, zeta, eta_ref, dt):
    """MIMO nonlinear PID for dynamic positioning (control.py:55-83).
    Returns (tau3, next_state)."""
    kp = wn @ wn @ m3
    kd = 2.0 * zeta @ wn @ m3 - d3
    ki = (1.0 / 10.0) * wn @ kp
    e = eta3 - eta_ref
    e = e.at[2].set(ssa(e[2]))
    r = rzyx(jnp.zeros(()), jnp.zeros(()), eta3[2])
    tau = -(r.T @ kp) @ e - (r.T @ kd @ r) @ nu3 - (r.T @ ki) @ st.e_int
    t_lp = 5.0 * jnp.stack([1.0 / wn[0, 0], 1.0 / wn[1, 1], 1.0 / wn[2, 2]])
    x_d = st.x_d + dt * (eta_ref[0] - st.x_d) / t_lp[0]
    y_d = st.y_d + dt * (eta_ref[1] - st.y_d) / t_lp[1]
    psi_d = st.psi_d + dt * (eta_ref[2] - st.psi_d) / t_lp[2]
    e_int = st.e_int + dt * e
    return tau, DPState(e_int, x_d, y_d, psi_d)
