"""Fossen vehicle models (python_vehicle_simulator/vehicles/*.py).

Eight vehicles beyond the REMUS-100 gym path, each re-designed functionally:
static parameters are precomputed host-side into jnp constants; `dynamics`
is a pure (eta, nu, u_actual, u_control, dt) -> (nu+, u_actual+) map with
saturations as `jnp.clip`/`where`; autopilot integrator states live in
explicit pytrees (`PIDState`/`DPState`) so whole simulations compile into
one `lax.scan` and vmap over vehicle/parameter batches.

Per-vehicle behavior sources (reference file: key lines):
  DSRV.py:116-170          heave/pitch linear model, stern-plane lag
  frigate.py:126-155       1-DOF nonlinear Nomoto, (K,T,n3) speed interp
  ROVzefakkel.py:120-150   same family, different table
  tanker.py:122-270        nonlinear maneuvering + shallow-water effects
  shipClarke83.py:152-218  Clarke83 linear 3-DOF + rudder forces
  semisub.py:185-222       6-DOF DP semisubmersible
  supply.py:152-192        3-DOF DP supply vessel (bis-scaled matrices)
  otter.py:231-313         6-DOF twin-propeller USV incl. payload
  remus100.py:520-626      REMUS depth/heading autopilot + step inputs
"""
from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..dynamics.remus import (
    _HOERNER_X,
    _HOERNER_Y,
    _m2c,
    build_remus_params,
    remus_substep,
)
from ..ops.geom import rzyx, skew, ssa
from .control import DPState, PIDState, dp_pole_placement, pid_pole_placement
from .models import clarke83

D2R = math.pi / 180.0
RHO = 1026.0


def sat(x, lo, hi):
    return jnp.clip(x, lo, hi)


def hoerner(beam, draft) -> float:
    """2-D crossflow coefficient from the digitized Hoerner curve
    (gnc.py:195-215); static per hull -> plain float."""
    return float(np.interp(beam / (2.0 * draft), _HOERNER_X, _HOERNER_Y))


def cross_flow_drag(length, draft, cd_2d, nu_r):
    """Vectorized 21-strip crossflow integral (gnc.py:219-251)."""
    n = 20
    dx = length / n
    x = -length / 2.0 + dx * jnp.arange(n + 1)
    ucf = jnp.abs(nu_r[1] + x * nu_r[5]) * (nu_r[1] + x * nu_r[5])
    yh = -0.5 * RHO * draft * cd_2d * dx * jnp.sum(ucf)
    nh = -0.5 * RHO * draft * cd_2d * dx * jnp.sum(x * ucf)
    return jnp.zeros(6).at[1].set(yh).at[5].set(nh)


def _h_mtrx(r):
    """6x6 system transform H(r) (gnc.py:57-72) — delegates to the shared
    ops.geom._h_offset implementation."""
    from ..ops.geom import _h_offset

    return np.asarray(_h_offset(jnp.asarray(np.asarray(r, float))))


def _current_nu(v_c, beta_c, psi):
    u_c = v_c * jnp.cos(beta_c - psi)
    v_cs = v_c * jnp.sin(beta_c - psi)
    return jnp.zeros(6).at[0].set(u_c).at[1].set(v_cs)


class Vehicle:
    """Common surface: name/L/dim_u/controls metadata, nu0/u_actual0 initial
    state, `dynamics`, `step_input`, `autopilot` + `init_ap_state`."""

    name = "vehicle"
    L = 1.0
    controls: list = []
    control_mode = "stepInput"

    @property
    def dim_u(self) -> int:
        return len(self.controls)

    def init_ap_state(self):
        return PIDState.zero()

    def autopilot(self, ap, eta, nu, dt):
        raise NotImplementedError

    def step_input(self, t):
        raise NotImplementedError

    def dynamics(self, eta, nu, u_actual, u_control, dt):
        raise NotImplementedError


# ---------------------------------------------------------------------------
class DSRV(Vehicle):
    """Deep submergence rescue vehicle: linear (w, q) model at constant
    cruise speed, PID depth autopilot (DSRV.py:43-218)."""

    name = "DSRV"
    L = 5.0
    controls = ["Stern plane (deg)"]

    def __init__(self, control_system: str = "stepInput", r: float = 0.0):
        self.control_mode = ("depthAutopilot"
                             if control_system == "depthAutopilot"
                             else "stepInput")
        self.ref = r
        self.delta_max = 20.0 * D2R
        self.t_delta = 1.0
        self.u0 = 4.11
        self.nu0 = jnp.zeros(6).at[0].set(self.u0)
        self.u_actual0 = jnp.zeros(1)
        # non-dimensional mass matrix entries
        iy, m = 0.001925, 0.036391
        mqdot, zqdot, mwdot, zwdot = -0.001573, -0.000130, -0.000146, -0.031545
        self.m11 = m - zwdot
        self.m12 = -zqdot
        self.m22 = iy - mqdot
        self.m21 = -mwdot
        self.detm = self.m11 * self.m22 - self.m12 * self.m21
        self.mq, self.zq = -0.01131, -0.017455
        self.mw, self.zw = 0.011175, -0.043938
        self.mdelta, self.zdelta = -0.012797, 0.027695
        # autopilot
        self.wn, self.zeta = 1.0, 1.0
        self.wn_d, self.zeta_d = self.wn / 5.0, 1.0
        self.w_max = 1.0

    def dynamics(self, eta, nu, u_actual, u_control, dt):
        delta_c = u_control[0]
        delta = sat(u_actual[0], -self.delta_max, self.delta_max)
        w, q, theta = nu[2], nu[4], eta[4]
        u_speed = jnp.sqrt(self.u0 ** 2 + w ** 2)
        mtheta = -0.156276 / u_speed ** 2
        z_f = self.zq * q + self.zw * w + self.zdelta * delta
        m_f = self.mq * q + self.mw * w + mtheta * theta + self.mdelta * delta
        nu_dot = jnp.zeros(6)
        nu_dot = nu_dot.at[2].set((self.m22 * z_f - self.m12 * m_f) / self.detm)
        nu_dot = nu_dot.at[4].set((-self.m21 * z_f + self.m11 * m_f) / self.detm)
        delta_dot = (delta_c - delta) / self.t_delta
        nu = (nu + dt * nu_dot).at[0].set(self.u0)
        return nu, jnp.atleast_1d(delta + dt * delta_dot)

    def step_input(self, t):
        d = jnp.where(t > 50.0, 0.0,
                      jnp.where(t > 30.0, 10.0 * D2R, 20.0 * D2R))
        return jnp.atleast_1d(d)

    def autopilot(self, ap, eta, nu, dt):
        e_z = eta[2] - ap.x_d
        e_w = nu[2] - ap.v_d
        delta_c, ap = pid_pole_placement(
            ap, e_z, e_w, self.m11, 0.0, 0.0, self.wn_d, self.zeta_d,
            self.wn, self.zeta, self.ref, self.w_max, dt)
        return jnp.atleast_1d(delta_c), ap


# ---------------------------------------------------------------------------
class _NomotoShip(Vehicle):
    """1-DOF nonlinear Nomoto steering family (frigate.py:126-155 and
    ROVzefakkel.py:120-150 share the model; tables differ)."""

    delta_max = 30.0 * D2R
    ddelta_max = 10.0 * D2R
    n1 = 1.0
    controls = ["Rudder angle (deg)"]

    def __init__(self, control_system: str = "stepInput", U: float = 5.0,
                 r: float = 0.0):
        self.control_mode = ("headingAutopilot"
                             if control_system == "headingAutopilot"
                             else "stepInput")
        lo, hi = self.u_range
        if not lo <= U <= hi:
            raise ValueError(f"speed U must be within [{lo}, {hi}] m/s")
        self.ref = r
        self.nu0 = jnp.zeros(6).at[0].set(U)
        self.u_actual0 = jnp.zeros(1)
        self.K, self.T, self.n3 = self._interp_kt(U)
        self.wn, self.zeta = 0.4, 1.0
        self.wn_d, self.zeta_d = self.wn / 5.0, 1.0
        self.r_max = 1.0 * D2R

    def dynamics(self, eta, nu, u_actual, u_control, dt):
        delta_c = u_control[0]
        delta = sat(u_actual[0], -self.delta_max, self.delta_max)
        r = nu[5]
        delta_dot = sat(delta_c - delta, -self.ddelta_max, self.ddelta_max)
        r_dot = (self.K * delta - self.n3 * r ** 3 - self.n1 * r) / self.T
        nu = nu.at[5].add(dt * r_dot)
        return nu, jnp.atleast_1d(delta + dt * delta_dot)

    def step_input(self, t):
        d = jnp.where(t > 50.0, 0.0,
                      jnp.where(t > 30.0, 10.0 * D2R, 20.0 * D2R))
        return jnp.atleast_1d(d)

    def autopilot(self, ap, eta, nu, dt):
        e_psi = eta[5] - ap.x_d
        e_r = nu[5] - ap.v_d
        delta, ap = pid_pole_placement(
            ap, e_psi, e_r, self.T / self.K, self.n1 / self.K, 0.0,
            self.wn_d, self.zeta_d, self.wn, self.zeta,
            self.ref * D2R, self.r_max, dt)
        return jnp.atleast_1d(delta), ap


class Frigate(_NomotoShip):
    name = "Frigate"
    L = 100.0
    u_range = (5.0, 12.0)

    @staticmethod
    def _interp_kt(U):
        u_d = [6.0, 9.0, 12.0]
        return (float(np.interp(U, u_d, [0.08, 0.18, 0.23])),
                float(np.interp(U, u_d, [20.0, 27.0, 21.0])),
                float(np.interp(U, u_d, [0.4, 0.6, 0.3])))

    def __init__(self, control_system="stepInput", U=5.0, r=0.0):
        super().__init__(control_system, U, r)


class ROVzefakkel(_NomotoShip):
    name = "ROV Zefakkel"
    L = 45.0
    u_range = (1.0, 7.0)

    @staticmethod
    def _interp_kt(U):
        u_d = [2.0, 2.6, 3.6, 4.0, 5.0, 6.2]
        return (float(np.interp(U, u_d, [0.15, 0.19, 0.29, 0.37, 0.50, 0.83])),
                float(np.interp(U, u_d, [33.0, 33.0, 33.0, 33.0, 31.0, 43.0])),
                0.4)

    def __init__(self, control_system="stepInput", U=3.0, r=0.0):
        super().__init__(control_system, U, r)


# ---------------------------------------------------------------------------
class Tanker(Vehicle):
    """Rudder-controlled tanker with shallow-water effects
    (tanker.py:122-270)."""

    name = "Tanker"
    L = 304.8
    draft = 18.46
    controls = ["Rudder angle (deg)"]

    def __init__(self, control_system="stepInput", r=0.0, V_current=0.0,
                 beta_current=0.0, depth=20.0, rpm=80.0):
        self.control_mode = ("headingAutopilot"
                             if control_system == "headingAutopilot"
                             else "stepInput")
        if not 10.0 <= rpm <= 90.0:
            raise ValueError("RPM must be within [10, 90]")
        if depth < self.draft:
            raise ValueError("water depth must exceed the draft 18.46 m")
        self.ref = r
        self.v_c = V_current
        self.beta_c = beta_current * D2R
        self.depth = depth
        self.n_c = rpm
        self.delta_max = 30.0 * D2R
        self.ddelta_max = 5.0 * D2R
        self.nu0 = jnp.zeros(6).at[0].set(4.8)
        self.u_actual0 = jnp.zeros(1)
        self.wn, self.zeta = 0.15, 0.8
        self.wn_d, self.zeta_d = self.wn / 5.0, 1.0
        self.r_max = 1.0 * D2R

    def dynamics(self, eta, nu, u_actual, u_control, dt):
        h, L = self.depth, self.L
        delta_c = u_control[0]
        # the reference computes the force terms with the RAW stored rudder
        # angle and saturates only before the rate limit (tanker.py:133,267)
        delta = u_actual[0]
        n = self.n_c / 60.0
        r = nu[5]
        nu_r = nu - _current_nu(self.v_c, self.beta_c, eta[5])
        u_r, v_r = nu_r[0], nu_r[1]
        beta = v_r / u_r  # sideslip (undefined at u_r=0, like the reference)

        t_ded = 0.22
        cun, cnn = 0.605, 38.2
        tuu, tun, tnn = -0.00695, -0.00063, 0.0000354
        m11, m22, m33 = 1.050, 2.020, 0.1232
        d11, d22, d33 = 2.020, -0.752, -0.231
        xuuz, yt, nt = -0.0061, 0.04, -0.02
        xuu, yvv, nvr, xvv = -0.0377, -2.400, -0.300, 0.3
        yuv, nuv = -1.205, -0.451
        xudotz, yvdotz, nrdotz = -0.05, -0.387, -0.0045
        yurz, nurz, xvrz = 0.182, -0.047, 0.387
        yvvz, nvrz = -1.5, -0.120
        xccdd, nuvz = -0.093, -0.241
        xccbd, yccd, nccd = 0.152, 0.208, -0.098
        xvvzz, yccbbd, nccbbd = 0.0125, -2.16, 0.688
        yccbbdz, nccbbdz = -0.191, 0.344

        z = self.draft / (h - self.draft)
        yuvz = jnp.where(z >= 0.8, -0.85 * (1.0 - 0.8 / z), 0.0)

        g_t = (1 / L) * tuu * u_r ** 2 + tun * u_r * n + L * tnn * abs(n) * n
        c = jnp.sqrt(jnp.maximum(cun * u_r * n + cnn * n ** 2, 0.0))

        gx = (1 / L) * (
            xuu * u_r ** 2 + L * d11 * v_r * r + xvv * v_r ** 2
            + xccdd * jnp.abs(c) * c * delta ** 2
            + xccbd * jnp.abs(c) * c * beta * delta
            + L * g_t * (1 - t_ded)
            + xuuz * u_r ** 2 * z + L * xvrz * v_r * r * z
            + xvvzz * v_r ** 2 * z ** 2)
        gy = (1 / L) * (
            yuv * u_r * v_r + yvv * jnp.abs(v_r) * v_r
            + yccd * jnp.abs(c) * c * delta + L * d22 * u_r * r
            + yccbbd * jnp.abs(c) * c * jnp.abs(beta) * beta * jnp.abs(delta)
            + yt * g_t * L + L * yurz * u_r * r * z
            + yuvz * u_r * v_r * z + yvvz * jnp.abs(v_r) * v_r * z
            + yccbbdz * jnp.abs(c) * c * jnp.abs(beta) * beta
            * jnp.abs(delta) * z)
        gn = (nuv * u_r * v_r + L * nvr * jnp.abs(v_r) * r
              + nccd * jnp.abs(c) * c * delta + L * d33 * u_r * r
              + nccbbd * jnp.abs(c) * c * jnp.abs(beta) * beta
              * jnp.abs(delta)
              + L * nt * g_t + L * nurz * u_r * r * z
              + nuvz * u_r * v_r * z + L * nvrz * jnp.abs(v_r) * r * z
              + nccbbdz * jnp.abs(c) * c * jnp.abs(beta) * beta
              * jnp.abs(delta) * z)

        m11 = m11 - xudotz * z
        m22 = m22 - yvdotz * z
        m33 = m33 - nrdotz * z
        nu_dot = jnp.zeros(6).at[0].set(gx / m11).at[1].set(gy / m22) \
            .at[5].set(gn / (L ** 2 * m33))

        delta = sat(delta, -self.delta_max, self.delta_max)
        delta_dot = sat(delta_c - delta, -self.ddelta_max, self.ddelta_max)
        return nu + dt * nu_dot, jnp.atleast_1d(delta + dt * delta_dot)

    def step_input(self, t):
        return jnp.atleast_1d(jnp.where(t > 50.0, 0.0, 10.0 * D2R))

    def autopilot(self, ap, eta, nu, dt):
        e_psi = eta[5] - ap.x_d
        e_r = nu[5] - ap.v_d
        delta_r, ap = pid_pole_placement(
            ap, e_psi, e_r, 500.0, 0.0, 0.0, self.wn_d, self.zeta_d,
            self.wn, self.zeta, self.ref * D2R, self.r_max, dt)
        return jnp.atleast_1d(-delta_r), ap


# ---------------------------------------------------------------------------
class ShipClarke83(Vehicle):
    """Clarke83 linear 3-DOF maneuvering model with nonlinear rudder forces
    (shipClarke83.py:152-218)."""

    name = "Linear ship (Clarke83)"
    controls = ["Rudder angle (deg)"]

    def __init__(self, control_system="stepInput", r=0.0, L=50.0, B=7.0,
                 T=5.0, Cb=0.7, V_current=0.0, beta_current=0.0, tau_X=1e5):
        self.control_mode = ("headingAutopilot"
                             if control_system == "headingAutopilot"
                             else "stepInput")
        self.ref = r
        self.L, self.B, self.T, self.Cb = L, B, T, Cb
        self.lam = 0.7  # rudder aspect ratio
        self.tau_x = tau_X
        self.v_c = V_current
        self.beta_c = beta_current * D2R
        self.delta_max = 30.0 * D2R
        self.t_delta = 1.0
        self.r66 = 0.27 * L if L > 100 else 0.25 * L
        self.nu0 = jnp.zeros(6).at[0].set(2.0)
        self.u_actual0 = jnp.zeros(1)
        self.wn, self.zeta = 0.3, 1.0
        self.wn_d, self.zeta_d = self.wn / 5.0, 1.0
        self.r_max = 1.0 * D2R
        # controller design model at U0 = 3 m/s (shipClarke83.py:131-136)
        m_mat, n_mat = clarke83(3.0, L, B, T, Cb, self.r66, 0.0, L)
        self.m_pid = float(m_mat[2, 2])
        self.d_pid = float(n_mat[2, 2])
        # rudder yaw-moment coefficient at U0 (shipClarke83.py:139-148)
        b_r = 0.7 * T
        ar = b_r ** 2 / self.lam
        cn = 6.13 * self.lam / (self.lam + 2.25)
        a_h, x_r, x_h = 0.4, -0.45 * L, -1.0 * L
        self.nd_design = -0.25 * (x_r + a_h * x_h) * RHO * 3.0 ** 2 * ar * cn

    def dynamics(self, eta, nu, u_actual, u_control, dt):
        nu_r = nu - _current_nu(self.v_c, self.beta_c, eta[5])
        u_rel = jnp.sqrt(nu_r[0] ** 2 + nu_r[1] ** 2)
        delta_c = u_control[0]
        delta = u_actual[0]

        b_r = 0.7 * self.T
        ar = b_r ** 2 / self.lam
        cn = 6.13 * self.lam / (self.lam + 2.25)
        t_r = 1.0 - 0.28 * self.Cb - 0.55
        a_h, x_r, x_h = 0.4, -0.45 * self.L, -1.0 * self.L
        xdd = -0.5 * (1 - t_r) * RHO * u_rel ** 2 * ar * cn
        yd = -0.25 * (1 + a_h) * RHO * u_rel ** 2 * ar * cn
        nd = -0.25 * (x_r + a_h * x_h) * RHO * u_rel ** 2 * ar * cn

        delta_r = -delta
        t_ded = 0.1
        tau = jnp.stack([
            (1 - t_ded) * self.tau_x - xdd * jnp.sin(delta_r) ** 2,
            -yd * jnp.sin(2.0 * delta_r),
            -nd * jnp.sin(2.0 * delta_r)])

        m_mat, n_mat = clarke83(u_rel, self.L, self.B, self.T, self.Cb,
                                self.r66, 0.0, self.L)
        nu3 = jnp.stack([nu_r[0], nu_r[1], nu_r[5]])
        nu3_dot = jnp.linalg.solve(m_mat, tau - n_mat @ nu3)
        nu_dot = jnp.zeros(6).at[0].set(nu3_dot[0]).at[1].set(nu3_dot[1]) \
            .at[5].set(nu3_dot[2])

        delta = sat(delta, -self.delta_max, self.delta_max)
        delta_dot = (delta_c - delta) / self.t_delta
        return nu + dt * nu_dot, jnp.atleast_1d(delta + dt * delta_dot)

    def step_input(self, t):
        return jnp.atleast_1d(jnp.where(t > 50.0, 0.0, 10.0 * D2R))

    def autopilot(self, ap, eta, nu, dt):
        e_psi = eta[5] - ap.x_d
        e_r = nu[5] - ap.v_d
        tau_n, ap = pid_pole_placement(
            ap, e_psi, e_r, self.m_pid, self.d_pid, 0.0, self.wn_d,
            self.zeta_d, self.wn, self.zeta, self.ref * D2R, self.r_max, dt)
        return jnp.atleast_1d(tau_n / self.nd_design), ap


# ---------------------------------------------------------------------------
class _DPVessel(Vehicle):
    """Shared DP machinery: |n|n thrust, B-matrix allocation, nonlinear DP
    PID (semisub.py / supply.py)."""

    t_n = 1.0

    def init_ap_state(self):
        return DPState.zero()

    def control_allocation(self, tau3):
        """Raw pseudo-inverse allocation u_alloc = B'(BB')^-1 tau3
        (semisub.py:225-233; the |n|n -> n sqrt mapping is applied only in
        DPcontrol, semisub.py:262-268, NOT in stepInput)."""
        b = self.b_mat
        return b.T @ jnp.linalg.solve(b @ b.T, tau3)

    def autopilot(self, ap, eta, nu, dt):
        eta3 = jnp.stack([eta[0], eta[1], eta[5]])
        nu3 = jnp.stack([nu[0], nu[1], nu[5]])
        tau3, ap = dp_pole_placement(ap, self.m3_pid, self.d3_pid, eta3, nu3,
                                     self.wn, self.zeta, self.ref, dt)
        u_alloc = self.control_allocation(tau3)
        return jnp.sign(u_alloc) * jnp.sqrt(jnp.abs(u_alloc)), ap


class Semisub(_DPVessel):
    """6-DOF semisubmersible with 6-thruster DP (semisub.py:53-288)."""

    name = "Semisubmersible"
    L = 84.6
    controls = ["#1 Bow tunnel thruster (RPM)", "#2 Bow tunnel thruster (RPM)",
                "#3 Aft tunnel thruster (RPM)", "#4 Aft tunnel thruster (RPM)",
                "#5 Right pontoon main propeller (RPM)",
                "#6 Left pontoon main propeller (RPM)"]

    def __init__(self, control_system="stepInput", r_x=0.0, r_y=0.0, r_n=0.0,
                 V_current=0.0, beta_current=0.0):
        self.control_mode = ("DPcontrol" if control_system == "DPcontrol"
                             else "stepInput")
        self.ref = jnp.asarray([r_x, r_y, r_n * D2R])
        self.v_c = V_current
        self.beta_c = beta_current * D2R
        self.n_max = jnp.asarray([160.0, 160, 160, 160, 250, 250])
        self.nu0 = jnp.zeros(6)
        self.u_actual0 = jnp.zeros(6)

        mrb = 1.0e10 * np.array([
            [0.0027, 0, 0, 0, -0.0530, 0],
            [0, 0.0027, 0, 0.0530, 0, -0.0014],
            [0, 0, 0.0027, 0, 0.0014, 0],
            [0, 0.0530, 0, 3.4775, 0, -0.0265],
            [-0.0530, 0, 0.0014, 0, 3.8150, 0],
            [0, -0.0014, 0, -0.0265, 0, 3.7192]])
        ma = 1.0e10 * np.array([
            [0.0017, 0, 0, 0, -0.0255, 0],
            [0, 0.0042, 0, 0.0365, 0, 0],
            [0, 0, 0.0021, 0, 0, 0],
            [0, 0.0365, 0, 1.3416, 0, 0],
            [-0.0255, 0, 0, 0, 2.2267, 0],
            [0, 0, 0, 0, 0, 3.2049]])
        self.d_mat = jnp.asarray(1.0e9 * np.array([
            [0.0004, 0, 0, 0, -0.0085, 0],
            [0, 0.0003, 0, 0.0067, 0, -0.0002],
            [0, 0, 0.0034, 0, 0.0017, 0],
            [0, 0.0067, 0, 4.8841, 0, -0.0034],
            [-0.0085, 0, 0.0017, 0, 7.1383, 0],
            [0, -0.0002, 0, -0.0034, 0, 0.8656]]))
        self.g_mat = jnp.asarray(
            1.0e10 * np.diag([0.0, 0.0, 0.0006, 1.4296, 2.6212, 0.0]))
        m = mrb + ma
        self.m_inv = jnp.asarray(np.linalg.inv(m))
        k = np.diag([3.5, 3.5, 25.0, 25.0, 25.0, 25.0])
        t = np.array([[0, 0, 0, 0, 1, 1], [1, 1, 1, 1, 0, 0],
                      [30, 20, -20, -30, -self.L / 2, self.L / 2]], float)
        self.b_mat = jnp.asarray(t @ k)
        self.m3_pid = jnp.asarray(np.diag([m[0, 0], m[1, 1], m[5, 5]]))
        self.d3_pid = jnp.asarray(np.diag(
            [np.asarray(self.d_mat)[0, 0], np.asarray(self.d_mat)[1, 1],
             np.asarray(self.d_mat)[5, 5]]))
        self.wn = jnp.asarray(np.diag([0.15, 0.15, 0.05]))
        self.zeta = jnp.asarray(np.diag([1.0, 1.0, 1.0]))

    def dynamics(self, eta, nu, u_actual, u_control, dt):
        # reference aliasing: n IS u_actual, saturated in place before the
        # lag term (semisub.py:199-206) -> lag uses the saturated value
        n = sat(u_actual, -self.n_max, self.n_max)
        nu_r = nu - _current_nu(self.v_c, self.beta_c, eta[5])
        tau3 = self.b_mat @ (jnp.abs(n) * n)
        tau = jnp.zeros(6).at[0].set(tau3[0]).at[1].set(tau3[1]) \
            .at[5].set(tau3[2])
        nu_dot = self.m_inv @ (tau - self.d_mat @ nu_r - self.g_mat @ eta)
        n_dot = (u_control - n) / self.t_n
        return nu + dt * nu_dot, n + dt * n_dot

    def step_input(self, t):
        tau3 = jnp.where(t > 70.0, jnp.zeros(3),
                         jnp.where(t > 30.0, jnp.asarray([1000.0, 1000, 0]),
                                   jnp.asarray([10000.0, 0, 100000])))
        return self.control_allocation(tau3)


class Supply(_DPVessel):
    """3-DOF DP supply vessel, bis-scaled model (supply.py:100-192)."""

    name = "Offshore supply vessel"
    L = 76.2
    controls = ["#1 Bow thruster (RPM)", "#2 Bow thruster (RPM)",
                "#3 Right main propeller (RPM)", "#4 Left main propeller (RPM)"]

    def __init__(self, control_system="stepInput", r_x=0.0, r_y=0.0, r_n=0.0,
                 V_current=0.0, beta_current=0.0):
        self.control_mode = ("DPcontrol" if control_system == "DPcontrol"
                             else "stepInput")
        m, g = 6000.0e3, 9.81
        self.ref = jnp.asarray([r_x, r_y, r_n * D2R])
        self.v_c = V_current
        self.beta_c = beta_current * D2R
        self.n_max = jnp.asarray([250.0, 250, 160, 160])
        self.nu0 = jnp.zeros(6)
        self.u_actual0 = jnp.zeros(4)
        k = np.diag([2.4, 2.4, 17.6, 17.6])
        t = np.array([[0, 0, 1, 1], [1, 1, 0, 0],
                      [30, 22, -self.L / 2, self.L / 2]], float)
        self.b_mat = jnp.asarray(t @ k)
        tbis_inv = np.diag([1.0, 1.0, self.L])
        mbis = np.array([[1.1274, 0, 0], [0, 1.8902, -0.0744],
                         [0, -0.0744, 0.1278]])
        dbis = np.array([[0.0358, 0, 0], [0, 0.1183, -0.0124],
                         [0, -0.0041, 0.0308]])
        m3 = m * tbis_inv @ mbis @ tbis_inv
        self.m3 = jnp.asarray(m3)
        self.m3_inv = jnp.asarray(np.linalg.inv(m3))
        self.d3 = jnp.asarray(m * math.sqrt(g / self.L)
                              * tbis_inv @ dbis @ tbis_inv)
        self.m3_pid = self.m3
        self.d3_pid = self.d3
        self.wn = jnp.asarray(np.diag([0.3, 0.3, 0.1]))
        self.zeta = jnp.asarray(np.diag([1.0, 1.0, 1.0]))

    def dynamics(self, eta, nu, u_actual, u_control, dt):
        n = sat(u_actual, -self.n_max, self.n_max)
        nu_r = nu - _current_nu(self.v_c, self.beta_c, eta[5])
        tau3 = self.b_mat @ (jnp.abs(n) * n)
        nu3_r = jnp.stack([nu_r[0], nu_r[1], nu_r[5]])
        nu3_dot = self.m3_inv @ (tau3 - self.d3 @ nu3_r)
        nu_dot = jnp.zeros(6).at[0].set(nu3_dot[0]).at[1].set(nu3_dot[1]) \
            .at[5].set(nu3_dot[2])
        n_dot = (u_control - n) / self.t_n
        return nu + dt * nu_dot, n + dt * n_dot

    def step_input(self, t):
        return jnp.where(t > 70.0, jnp.zeros(4),
                         jnp.where(t > 30.0, jnp.full(4, 50.0),
                                   jnp.asarray([0.0, 0, 100, 100])))


# ---------------------------------------------------------------------------
class Otter(Vehicle):
    """Otter twin-propeller USV, 6-DOF with payload (otter.py:55-397)."""

    name = "Otter USV"
    L = 2.0
    controls = ["Left propeller shaft speed (rad/s)",
                "Right propeller shaft speed (rad/s)"]

    def __init__(self, control_system="stepInput", r=0.0, V_current=0.0,
                 beta_current=0.0, tau_X=120.0):
        self.control_mode = ("headingAutopilot"
                             if control_system == "headingAutopilot"
                             else "stepInput")
        self.ref = r
        self.v_c = V_current
        self.beta_c = beta_current * D2R
        self.tau_x = tau_X
        g, rho = 9.81, RHO
        self.g = g
        self.t_n = 1.0
        self.B = 1.08
        self.nu0 = jnp.zeros(6)
        self.u_actual0 = jnp.zeros(2)

        m, mp = 55.0, 25.0
        self.m_total = m + mp
        rp = np.array([0.05, 0.0, -0.35])
        rg_hull = np.array([0.2, 0.0, -0.2])
        rg = (m * rg_hull + mp * rp) / (m + mp)
        s_rg = np.asarray(skew(jnp.asarray(rg)))
        s_rp = np.asarray(skew(jnp.asarray(rp)))
        self.s_rp = jnp.asarray(s_rp)
        h_rg = _h_mtrx(rg)
        self.mp = mp

        r44, r55, r66 = 0.4 * self.B, 0.25 * self.L, 0.25 * self.L
        t_yaw = 1.0
        umax = 6.0 * 0.5144
        self.b_pont, y_pont = 0.25, 0.395
        cw_pont, cb_pont = 0.75, 0.4
        nabla = (m + mp) / rho
        self.draft = nabla / (2 * cb_pont * self.b_pont * self.L)
        ig_cg = m * np.diag([r44 ** 2, r55 ** 2, r66 ** 2])
        ig = ig_cg - m * s_rg @ s_rg - mp * s_rp @ s_rp
        self.ig = jnp.asarray(ig)

        self.l1, self.l2 = -y_pont, y_pont
        self.k_pos = 0.02216 / 2
        self.k_neg = 0.01289 / 2
        self.n_max = math.sqrt(0.5 * 24.4 * g / self.k_pos)
        self.n_min = -math.sqrt(0.5 * 13.6 * g / self.k_neg)

        mrb_cg = np.zeros((6, 6))
        mrb_cg[0:3, 0:3] = (m + mp) * np.identity(3)
        mrb_cg[3:6, 3:6] = ig
        mrb = h_rg.T @ mrb_cg @ h_rg
        ma = -np.diag([-0.1 * m, -1.5 * m, -1.0 * m, -0.2 * ig[0, 0],
                       -0.8 * ig[1, 1], -1.7 * ig[2, 2]])
        self.ma = jnp.asarray(ma)
        m_sys = mrb + ma
        self.m_inv = jnp.asarray(np.linalg.inv(m_sys))
        self.h_rg = jnp.asarray(h_rg)

        aw_pont = cw_pont * self.L * self.b_pont
        i_t = (2 * (1 / 12) * self.L * self.b_pont ** 3
               * (6 * cw_pont ** 3 / ((1 + cw_pont) * (1 + 2 * cw_pont)))
               + 2 * aw_pont * y_pont ** 2)
        i_l = 0.8 * 2 * (1 / 12) * self.b_pont * self.L ** 3
        kb = (1 / 3) * (5 * self.draft / 2
                        - 0.5 * nabla / (self.L * self.b_pont))
        bm_t, bm_l = i_t / nabla, i_l / nabla
        km_t, km_l = kb + bm_t, kb + bm_l
        kg = self.draft - rg[2]
        gm_t, gm_l = km_t - kg, km_l - kg
        g33 = rho * g * (2 * aw_pont)
        g44 = rho * g * nabla * gm_t
        g55 = rho * g * nabla * gm_l
        g_cf = np.diag([0.0, 0, g33, g44, g55, 0])
        h_lcf = _h_mtrx(np.array([-0.2, 0.0, 0.0]))
        self.g_mat = jnp.asarray(h_lcf.T @ g_cf @ h_lcf)

        w3 = math.sqrt(g33 / m_sys[2, 2])
        w4 = math.sqrt(g44 / m_sys[3, 3])
        w5 = math.sqrt(g55 / m_sys[4, 4])
        xu = -24.4 * g / umax
        zw = -2 * 0.3 * w3 * m_sys[2, 2]
        kp = -2 * 0.2 * w4 * m_sys[3, 3]
        mq = -2 * 0.4 * w5 * m_sys[4, 4]
        nr = -m_sys[5, 5] / t_yaw
        self.d_mat = jnp.asarray(-np.diag([xu, 0.0, zw, kp, mq, nr]))
        self.cd_2d = hoerner(self.b_pont, self.draft)

        b_alloc = self.k_pos * np.array([[1.0, 1.0],
                                         [-self.l1, -self.l2]])
        self.b_alloc_inv = jnp.asarray(np.linalg.inv(b_alloc))
        self.wn, self.zeta = 1.2, 0.8
        self.wn_d, self.zeta_d = self.wn / 5.0, 1.0
        self.r_max = 10.0 * D2R

    def dynamics(self, eta, nu, u_actual, u_control, dt):
        n = sat(u_actual, self.n_min, self.n_max)
        nu_c = _current_nu(self.v_c, self.beta_c, eta[5])
        dnu_c = jnp.zeros(6).at[0].set(nu[5] * nu_c[1]) \
            .at[1].set(-nu[5] * nu_c[0])
        nu_r = nu - nu_c

        crb_cg = jnp.zeros((6, 6))
        crb_cg = crb_cg.at[0:3, 0:3].set(self.m_total * skew(nu[3:6]))
        crb_cg = crb_cg.at[3:6, 3:6].set(-skew(self.ig @ nu[3:6]))
        crb = self.h_rg.T @ crb_cg @ self.h_rg
        ca = _m2c(self.ma, nu_r)
        # neglect yaw Munk moment (otter.py:256-259)
        ca = ca.at[5, 0].set(0.0).at[5, 1].set(0.0) \
            .at[0, 5].set(0.0).at[1, 5].set(0.0)
        c = crb + ca

        r_mat = rzyx(eta[3], eta[4], eta[5])
        f_payload = r_mat.T @ jnp.asarray([0.0, 0.0, self.mp * self.g])
        m_payload = self.s_rp @ f_payload
        g_0 = jnp.concatenate([f_payload, m_payload])

        thrust = jnp.where(n > 0, self.k_pos * n * jnp.abs(n),
                           self.k_neg * n * jnp.abs(n))
        tau = jnp.zeros(6).at[0].set(thrust[0] + thrust[1]) \
            .at[5].set(-self.l1 * thrust[0] - self.l2 * thrust[1])

        tau_damp = -(self.d_mat @ nu_r)
        tau_damp = tau_damp.at[5].add(
            -10.0 * self.d_mat[5, 5] * jnp.abs(nu_r[5]) * nu_r[5])
        tau_cf = cross_flow_drag(self.L, self.draft, self.cd_2d, nu_r)
        sum_tau = (tau + tau_damp + tau_cf - c @ nu_r - self.g_mat @ eta + g_0)
        nu_dot = dnu_c + self.m_inv @ sum_tau
        n_dot = (u_control - n) / self.t_n
        return nu + dt * nu_dot, n + dt * n_dot

    def control_allocation(self, tau_x, tau_n):
        u_alloc = self.b_alloc_inv @ jnp.stack([tau_x, tau_n])
        return jnp.sign(u_alloc) * jnp.sqrt(jnp.abs(u_alloc))

    def step_input(self, t):
        on = (t > 30.0) & (t < 100.0)
        return jnp.where(on, jnp.asarray([80.0, 120.0]), jnp.zeros(2))

    def autopilot(self, ap, eta, nu, dt):
        e_psi = eta[5] - ap.x_d
        e_r = nu[5] - ap.v_d
        m = 41.4
        k = 1.0 / m
        d = 1.0 / k
        tau_n, ap = pid_pole_placement(
            ap, e_psi, e_r, m, d, 0.0, self.wn_d, self.zeta_d, self.wn,
            self.zeta, self.ref * D2R, self.r_max, dt)
        return self.control_allocation(jnp.asarray(self.tau_x), tau_n), ap


# ---------------------------------------------------------------------------
class Remus100AP(Vehicle):
    """REMUS 100 for the standalone sim: the gym-path dynamics
    (dynamics/remus.py) plus the reference's depth/heading autopilot and
    step inputs (remus100.py:520-626)."""

    name = "Remus 100"
    L = 1.6
    controls = ["Tail rudder (deg)", "Stern plane (deg)",
                "Propeller revolution (rpm)"]

    class ApState(NamedTuple):
        z_d: jnp.ndarray
        z_int: jnp.ndarray
        theta_int: jnp.ndarray
        psi: PIDState  # heading PID + reference model
        e_psi_int: jnp.ndarray

    def __init__(self, control_system="stepInput", r_z=0.0, r_psi=0.0,
                 r_rpm=1525.0, V_current=0.0, beta_current=0.0):
        self.control_mode = ("depthHeadingAutopilot"
                             if control_system == "depthHeadingAutopilot"
                             else "stepInput")
        self.params = build_remus_params()
        self.ref_z, self.ref_psi, self.ref_n = r_z, r_psi, r_rpm
        self.v_c = V_current
        self.beta_c = beta_current * D2R
        self.nu0 = jnp.zeros(6)
        self.u_actual0 = jnp.zeros(3)
        # autopilot gains (remus100.py:218-239)
        self.wn_psi, self.zeta_psi = 0.5, 1.0
        self.wn_d, self.zeta_d = self.wn_psi / 5.0, 1.0
        self.r_max = 1.0 * D2R
        self.wn_d_z = 1.0 / 20.0
        self.kp_z, self.t_z = 0.1, 100.0
        self.kp_theta, self.kd_theta, self.ki_theta = 1.0, 3.0, 0.1
        self.m55 = float(np.asarray(self.params.mrb + self.params.ma)[4, 4])
        self.m66 = float(np.asarray(self.params.mrb + self.params.ma)[5, 5])

    def init_ap_state(self):
        z = jnp.zeros(())
        return self.ApState(z, z, z, PIDState.zero(), z)

    def dynamics(self, eta, nu, u_actual, u_control, dt):
        nu_c6 = _current_nu(self.v_c, self.beta_c, eta[5])
        eta2, nu2, u2, _ = remus_substep(self.params, eta, nu, u_actual,
                                         u_control, nu_c6, dt)
        del eta2  # the sim loop integrates eta itself (mainLoop.py:95-97)
        return nu2, u2

    def step_input(self, t):
        delta_r = jnp.where(t > 100.0, 0.0, 5.0 * D2R)
        delta_s = jnp.where(t > 50.0, 0.0, -5.0 * D2R)
        return jnp.stack([delta_r, delta_s, jnp.asarray(1525.0)])

    def autopilot(self, ap: "Remus100AP.ApState", eta, nu, dt):
        z, theta, psi = eta[2], eta[4], eta[5]
        q, r = nu[4], nu[5]
        # depth: successive loop closure (remus100.py:572-587)
        lp = jnp.exp(-dt * self.wn_d_z)
        z_d = lp * ap.z_d + (1.0 - lp) * self.ref_z
        theta_d = self.kp_z * ((z - z_d) + (1.0 / self.t_z) * ap.z_int)
        delta_s = (-self.kp_theta * ssa(theta - theta_d)
                   - self.kd_theta * q - self.ki_theta * ap.theta_int)
        z_int = ap.z_int + dt * (z - z_d)
        theta_int = ap.theta_int + dt * ssa(theta - theta_d)
        # heading PID (remus100.py:590-625)
        e_psi = psi - ap.psi.x_d
        e_r = r - ap.psi.v_d
        delta_r, psi_st = pid_pole_placement(
            ap.psi._replace(e_int=ap.e_psi_int), e_psi, e_r, self.m66,
            0.0, 0.0, self.wn_d, self.zeta_d, self.wn_psi, self.zeta_psi,
            self.ref_psi * D2R, self.r_max, dt)
        e_psi_int = psi_st.e_int + dt * ssa(psi - psi_st.x_d)
        u = jnp.stack([delta_r, delta_s, jnp.asarray(self.ref_n)])
        return u, self.ApState(z_d, z_int, theta_int, psi_st, e_psi_int)


VEHICLES = {
    "DSRV": DSRV,
    "frigate": Frigate,
    "otter": Otter,
    "ROVzefakkel": ROVzefakkel,
    "semisub": Semisub,
    "shipClarke83": ShipClarke83,
    "supply": Supply,
    "tanker": Tanker,
    "remus100": Remus100AP,
}
