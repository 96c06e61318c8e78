"""Standalone simulation harness + time-series plots.

Role of python_vehicle_simulator/lib/mainLoop.py:60-101 (`simulate`) and
plotTimeSeries.py (state/control plots).  The host for-loop becomes one
`lax.scan` over (eta, nu, u_actual, autopilot-state); simData layout matches
the reference: rows of [eta(6), nu(6), u_control(dimU), u_actual(dimU)],
with the control computed from the pre-step state.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geom


def attitude_euler(eta, nu, dt):
    """eta[k+1] via Euler with the body->NED kinematic transform
    (gnc.py:123-140)."""
    return eta + dt * geom.euler_kinematics(eta, nu)


def simulate(vehicle, N: int, sample_time: float,
             eta0=None) -> Tuple[np.ndarray, np.ndarray]:
    """(simTime (N+1,1), simData (N+1, 12+2*dimU)) — one jitted scan."""
    dim_u = vehicle.dim_u
    eta0 = jnp.zeros(6) if eta0 is None else jnp.asarray(eta0)
    nu0 = jnp.asarray(vehicle.nu0)
    ua0 = jnp.asarray(vehicle.u_actual0)
    ap0 = vehicle.init_ap_state()
    mode = vehicle.control_mode

    def control(carry, t):
        eta, nu, ua, ap = carry
        if mode == "stepInput":
            return vehicle.step_input(t), ap
        return vehicle.autopilot(ap, eta, nu, sample_time)

    def body(carry, i):
        eta, nu, ua, ap = carry
        t = i * sample_time
        u_control, ap = control(carry, t)
        row = jnp.concatenate([eta, nu, u_control, ua])
        nu, ua = vehicle.dynamics(eta, nu, ua, u_control, sample_time)
        eta = attitude_euler(eta, nu, sample_time)
        return (eta, nu, ua, ap), row

    (_, _, _, _), rows = jax.jit(
        lambda c: jax.lax.scan(body, c, jnp.arange(N + 1)))(
        (eta0, nu0, ua0, ap0))
    sim_time = np.arange(0, (N + 1) * sample_time, sample_time)[: N + 1, None]
    assert rows.shape == (N + 1, 12 + 2 * dim_u)
    return sim_time, np.asarray(rows)


def plot_time_series(vehicle, sim_time, sim_data, save_path=None, show=False):
    """plotVehicleStates + plotControls role (plotTimeSeries.py)."""
    import matplotlib.pyplot as plt

    t = sim_time[:, 0]
    eta = sim_data[:, 0:6]
    nu = sim_data[:, 6:12]
    dim_u = vehicle.dim_u
    u_control = sim_data[:, 12:12 + dim_u]
    u_actual = sim_data[:, 12 + dim_u:12 + 2 * dim_u]

    fig, axes = plt.subplots(3, 2, figsize=(11, 9))
    panels = [
        (eta[:, 0:3], ["x", "y", "z"], "position [m]"),
        (np.degrees(eta[:, 3:6]), ["phi", "theta", "psi"], "attitude [deg]"),
        (nu[:, 0:3], ["u", "v", "w"], "linear velocity [m/s]"),
        (np.degrees(nu[:, 3:6]), ["p", "q", "r"], "angular rate [deg/s]"),
    ]
    for ax, (data, labels, title) in zip(axes.flat, panels):
        for i, lab in enumerate(labels):
            ax.plot(t, data[:, i], label=lab)
        ax.set_title(title)
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
    for ax, (data, title) in zip(axes.flat[4:], [
            (u_control, "commanded inputs"), (u_actual, "actual inputs")]):
        for i in range(data.shape[1]):
            ax.plot(t, data[:, i], label=vehicle.controls[i][:18])
        ax.set_title(title)
        ax.legend(fontsize=6)
        ax.grid(alpha=0.3)
    fig.suptitle(vehicle.name)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=110)
    if show:
        plt.show()
    else:
        plt.close(fig)
    return save_path or fig
