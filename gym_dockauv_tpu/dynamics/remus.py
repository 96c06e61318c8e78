"""REMUS 100 torpedo AUV plant, TPU-native.

Functional re-implementation of the Fossen python_vehicle_simulator REMUS 100
model as vendored/modified by the reference
(python_vehicle_simulator/vehicles/remus100.py:59-518 and lib/gnc.py), with:

  * all rigid-body/added-mass constants, Lamb k-factors, damping natural
    frequencies, and propeller curve coefficients precomputed on host into a
    `RemusParams` pytree (remus100.py:141-215);
  * the reference's locally modified fin lift coefficients CL_delta_r = 5 and
    CL_delta_s = 7 (remus100.py:196-205, 10x the stock 0.5/0.7) kept for
    behavioral parity;
  * the 20-strip crossflow integral (gnc.py:219-251) vectorized over a
    precomputed strip-abscissa vector (Hoerner coefficient is constant since
    B/(2T) = 0.5 for this hull, precomputed via np.interp);
  * the 5 x 0.02 s forward-Euler substep loop (remus100.py:493-505) expressed
    as a `lax.scan`, with the saturate-then-integrate actuator ordering
    (remus100.py:301-308 vs :463-476) preserved exactly;
  * everything batched over leading dims and free of Python branching.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import geom

# Hoerner 2-D crossflow coefficient table (gnc.py:195-215, digitized data).
_HOERNER_X = np.array(
    [0.0109, 0.1766, 0.3530, 0.4519, 0.4728, 0.4929, 0.4933, 0.5585, 0.6464,
     0.8336, 0.9880, 1.3081, 1.6392, 1.8600, 2.3129, 2.6000, 3.0088, 3.4508,
     3.7379, 4.0031]
)
_HOERNER_Y = np.array(
    [1.9661, 1.9657, 1.8976, 1.7872, 1.5837, 1.2786, 1.2108, 1.0836, 0.9986,
     0.8796, 0.8284, 0.7599, 0.6914, 0.6571, 0.6307, 0.5962, 0.5868, 0.5859,
     0.5599, 0.5593]
)


@struct.dataclass
class RemusParams:
    mrb: jnp.ndarray  # (6,6)
    ma: jnp.ndarray  # (6,6)
    m_inv: jnp.ndarray  # (6,6)
    d_diag: jnp.ndarray  # (6,) base linear damping diagonal
    w_weight: jnp.ndarray  # scalar W (= B)
    r_bg: jnp.ndarray  # (3,)
    r_bb: jnp.ndarray  # (3,)
    cd_0: jnp.ndarray  # parasitic drag coefficient
    cl_alpha: jnp.ndarray  # linear lift slope for the hull "wing"
    ar_ratio: jnp.ndarray  # wing aspect ratio b^2/S
    area_s: jnp.ndarray  # reference area S
    strip_x: jnp.ndarray  # (21,) crossflow strip abscissae
    strip_coef: jnp.ndarray  # scalar -0.5*rho*T*Cd_2D*dx
    cl_delta_r: jnp.ndarray
    cl_delta_s: jnp.ndarray
    a_r: jnp.ndarray  # rudder area
    a_s: jnp.ndarray  # stern-plane area
    x_r: jnp.ndarray  # rudder x-position
    x_s: jnp.ndarray  # stern-plane x-position
    delta_max: jnp.ndarray  # fin saturation (rad)
    n_max: jnp.ndarray  # prop rpm saturation
    t_delta: jnp.ndarray  # fin time constant
    t_n: jnp.ndarray  # prop time constant
    rho: jnp.ndarray
    d_prop: jnp.ndarray
    t_prop: jnp.ndarray
    kt_0: jnp.ndarray
    kq_0: jnp.ndarray
    kt_max: jnp.ndarray
    kq_max: jnp.ndarray
    ja_max: jnp.ndarray
    n_substeps: int = struct.field(pytree_node=False, default=5)
    sub_dt: float = struct.field(pytree_node=False, default=0.02)


def build_remus_params(dtype=jnp.float32, n_substeps: int = 5, sub_dt: float = 0.02) -> RemusParams:
    """Precompute all REMUS constants (remus100.py:112-215) in float64."""
    rho = 1026.0
    g = 9.81
    L, diam = 1.6, 0.19
    a, b = L / 2, diam / 2
    S = 0.7 * L * diam
    r_bg = np.array([0.0, 0.0, 0.02])
    r_bb = np.zeros(3)

    cd = 0.42
    cd_0 = cd * math.pi * b**2 / S

    m = 4.0 / 3.0 * math.pi * rho * a * b**2
    ix = (2.0 / 5.0) * m * b**2
    iy = (1.0 / 5.0) * m * (a**2 + b**2)
    mrb_cg = np.diag([m, m, m, ix, iy, iy])

    def skew_np(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], float)

    h_rg = np.eye(6)
    h_rg[0:3, 3:6] = skew_np(r_bg).T
    mrb = h_rg.T @ mrb_cg @ h_rg

    w = m * g

    r44 = 0.3
    ma_44 = r44 * ix
    e = math.sqrt(1 - (b / a) ** 2)
    alpha_0 = (2 * (1 - e**2) / e**3) * (0.5 * math.log((1 + e) / (1 - e)) - e)
    beta_0 = 1 / e**2 - (1 - e**2) / (2 * e**3) * math.log((1 + e) / (1 - e))
    k1 = alpha_0 / (2 - alpha_0)
    k2 = beta_0 / (2 - beta_0)
    k_prime = e**4 * (beta_0 - alpha_0) / (
        (2 - e**2) * (2 * e**2 - (2 - e**2) * (beta_0 - alpha_0))
    )
    ma = np.diag([m * k1, m * k2, m * k2, ma_44, k_prime * iy, k_prime * iy])

    m_total = mrb + ma
    m_inv = np.linalg.inv(m_total)

    w_roll = math.sqrt(w * r_bg[2] / m_total[3, 3])
    w_pitch = math.sqrt(w * r_bg[2] / m_total[4, 4])
    t_surge = t_sway = t_heave = 20.0
    d_diag = np.array(
        [
            m_total[0, 0] / t_surge,
            m_total[1, 1] / t_sway,
            m_total[2, 2] / t_heave,
            m_total[3, 3] * 2 * 0.3 * w_roll,
            m_total[4, 4] * 2 * 0.8 * w_pitch,
            m_total[5, 5] / 5.0,
        ]
    )

    # Hull lift slope (gnc.py:345-353 with b=diam, S as above)
    ar = diam**2 / S
    cl_alpha = math.pi * ar / (1 + math.sqrt(1 + (ar / 2) ** 2))

    # Crossflow strips (gnc.py:231-247): 21 sample points, dx = L/20,
    # constant Hoerner coefficient at B/(2T) = 0.5.
    n_strips = 20
    dx = L / n_strips
    cd_2d = float(np.interp(diam / (2 * diam), _HOERNER_X, _HOERNER_Y))
    strip_x = -L / 2 + dx * np.arange(n_strips + 1)
    strip_coef = -0.5 * rho * diam * cd_2d * dx

    c = lambda x: jnp.asarray(np.asarray(x, np.float64), dtype=dtype)
    return RemusParams(
        mrb=c(mrb),
        ma=c(ma),
        m_inv=c(m_inv),
        d_diag=c(d_diag),
        w_weight=c(w),
        r_bg=c(r_bg),
        r_bb=c(r_bb),
        cd_0=c(cd_0),
        cl_alpha=c(cl_alpha),
        ar_ratio=c(ar),
        area_s=c(S),
        strip_x=c(strip_x),
        strip_coef=c(strip_coef),
        cl_delta_r=c(5.0),  # reference-modified value (remus100.py:198)
        cl_delta_s=c(7.0),  # reference-modified value (remus100.py:205)
        a_r=c(2 * 0.10 * 0.05),
        a_s=c(2 * 0.10 * 0.05),
        x_r=c(-a),
        x_s=c(-a),
        delta_max=c(30 * math.pi / 180),
        n_max=c(1525.0),
        t_delta=c(1.0),
        t_n=c(1.0),
        rho=c(rho),
        d_prop=c(0.14),
        t_prop=c(0.1),
        kt_0=c(0.4566),
        kq_0=c(0.0700),
        kt_max=c(0.1798),
        kq_max=c(0.0312),
        ja_max=c(0.6632),
        n_substeps=n_substeps,
        sub_dt=sub_dt,
    )


def _m2c(m: jnp.ndarray, nu: jnp.ndarray) -> jnp.ndarray:
    """Coriolis matrix from (symmetrized) mass matrix (gnc.py:142-179)."""
    ms = 0.5 * (m + m.T)
    nu1, nu2 = nu[..., 0:3], nu[..., 3:6]
    dt1 = jnp.einsum("ij,...j->...i", ms[0:3, 0:3], nu1) + jnp.einsum(
        "ij,...j->...i", ms[0:3, 3:6], nu2
    )
    dt2 = jnp.einsum("ij,...j->...i", ms[3:6, 0:3], nu1) + jnp.einsum(
        "ij,...j->...i", ms[3:6, 3:6], nu2
    )
    s1, s2 = geom.skew(dt1), geom.skew(dt2)
    zero = jnp.zeros_like(s1)
    top = jnp.concatenate([zero, -s1], axis=-1)
    bot = jnp.concatenate([-s1, -s2], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def remus_nu_dot(
    p: RemusParams,
    eta: jnp.ndarray,  # (..., 6)
    nu: jnp.ndarray,  # (..., 6)
    u_sat: jnp.ndarray,  # (..., 3) saturated actual [delta_r, delta_s, n]
    nu_c: jnp.ndarray,  # (..., 6) current in body frame
) -> jnp.ndarray:
    """Acceleration nu_dot (remus100.py:241-460), given pre-saturated
    actuator state."""
    u_c, v_c, w_c = nu_c[..., 0], nu_c[..., 1], nu_c[..., 2]
    nu_c6 = jnp.stack(
        [u_c, v_c, w_c, jnp.zeros_like(u_c), jnp.zeros_like(u_c), jnp.zeros_like(u_c)],
        axis=-1,
    )
    r_yaw = nu[..., 5]
    dnu_c = jnp.stack(
        [r_yaw * v_c, -r_yaw * u_c] + [jnp.zeros_like(u_c)] * 4, axis=-1
    )
    nu_r = nu - nu_c6
    alpha = jnp.arctan2(nu_r[..., 2], nu_r[..., 0])
    u_speed = jnp.linalg.norm(nu[..., 0:3], axis=-1)
    u_rel = jnp.linalg.norm(nu_r[..., 0:3], axis=-1)

    delta_r, delta_s, n_rpm = u_sat[..., 0], u_sat[..., 1], u_sat[..., 2]

    # Propeller thrust/torque via advance-ratio-linearized KT/KQ
    # (remus100.py:310-355).
    n_rps = n_rpm / 60.0
    va = 0.944 * u_speed
    abs_n = jnp.abs(n_rps)
    kt_slope = (p.kt_max - p.kt_0) / p.ja_max
    kq_slope = (p.kq_max - p.kq_0) / p.ja_max
    fwd_x = p.rho * p.d_prop**4 * (p.kt_0 * abs_n * n_rps + kt_slope * (va / p.d_prop) * abs_n)
    fwd_k = p.rho * p.d_prop**5 * (p.kq_0 * abs_n * n_rps + kq_slope * (va / p.d_prop) * abs_n)
    rev_x = p.rho * p.d_prop**4 * p.kt_0 * abs_n * n_rps
    rev_k = p.rho * p.d_prop**5 * p.kq_0 * abs_n * n_rps
    x_prop = jnp.where(n_rps > 0, fwd_x, rev_x)
    k_prop = jnp.where(n_rps > 0, fwd_k, rev_k)

    # Coriolis: rigid-body + added mass with Munk moments zeroed
    # (remus100.py:361-372).
    crb = _m2c(p.mrb, nu_r)
    ca = _m2c(p.ma, nu_r)
    munk_mask = jnp.ones((6, 6), dtype=ca.dtype)
    munk_mask = munk_mask.at[4, 0].set(0.0).at[4, 3].set(0.0)
    munk_mask = munk_mask.at[5, 0].set(0.0).at[5, 1].set(0.0)
    c_mat = crb + ca * munk_mask

    # Speed-faded linear damping (remus100.py:386-397).
    fade = jnp.exp(-3.0 * u_rel)
    d_scale = jnp.stack(
        [fade, fade, jnp.ones_like(fade), jnp.ones_like(fade), jnp.ones_like(fade), fade],
        axis=-1,
    )
    d_diag = p.d_diag * d_scale

    # Hull lift/drag (gnc.py:255-376, sigma=0 blending).
    cl = p.cl_alpha * alpha
    cd = p.cd_0 + cl**2 / (jnp.pi * 0.7 * p.ar_ratio)
    q_dyn = 0.5 * p.rho * u_rel**2 * p.area_s
    f_drag = q_dyn * cd
    f_lift = q_dyn * cl
    ca_, sa_ = jnp.cos(alpha), jnp.sin(alpha)
    zeros = jnp.zeros_like(f_drag)
    tau_liftdrag = jnp.stack(
        [ca_ * (-f_drag) - sa_ * (-f_lift), zeros, sa_ * (-f_drag) + ca_ * (-f_lift),
         zeros, zeros, zeros],
        axis=-1,
    )

    # Crossflow drag, vectorized strips (gnc.py:219-251).
    v_r = nu_r[..., 1]
    r_r = nu_r[..., 5]
    ucf = (v_r[..., None] + p.strip_x * r_r[..., None]) * jnp.abs(
        v_r[..., None] + p.strip_x * r_r[..., None]
    )
    yh = p.strip_coef * jnp.sum(ucf, axis=-1)
    nh = p.strip_coef * jnp.sum(p.strip_x * ucf, axis=-1)
    tau_crossflow = jnp.stack([zeros, yh, zeros, zeros, zeros, nh], axis=-1)

    # Restoring forces, W == B neutral buoyancy (gnc.py:380-414).
    theta, phi = eta[..., 4], eta[..., 3]
    sth, cth = jnp.sin(theta), jnp.cos(theta)
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    zgw = p.r_bg[2] * p.w_weight - p.r_bb[2] * p.w_weight
    xgw = p.r_bg[0] * p.w_weight - p.r_bb[0] * p.w_weight
    ygw = p.r_bg[1] * p.w_weight - p.r_bb[1] * p.w_weight
    g_vec = jnp.stack(
        [zeros, zeros, zeros,
         -ygw * cth * cphi + zgw * cth * sphi,
         zgw * sth + xgw * cth * cphi,
         -xgw * cth * sphi - ygw * sth],
        axis=-1,
    )

    # Fin forces (remus100.py:412-452).
    u_rh2 = nu_r[..., 0] ** 2 + nu_r[..., 1] ** 2
    u_rv2 = nu_r[..., 0] ** 2 + nu_r[..., 2] ** 2
    x_r_force = -0.5 * p.rho * u_rh2 * p.a_r * p.cl_delta_r * delta_r**2
    x_s_force = -0.5 * p.rho * u_rv2 * p.a_s * p.cl_delta_s * delta_s**2
    y_r_force = -0.5 * p.rho * u_rh2 * p.a_r * p.cl_delta_r * delta_r
    z_s_force = -0.5 * p.rho * u_rv2 * p.a_s * p.cl_delta_s * delta_s

    tau = jnp.stack(
        [
            (1.0 - p.t_prop) * x_prop + x_r_force + x_s_force,
            y_r_force,
            z_s_force,
            k_prop / 10.0,  # scaled to match experiments (remus100.py:440)
            p.x_s * z_s_force,
            p.x_r * y_r_force,
        ],
        axis=-1,
    )

    cd_nu = jnp.einsum("...ij,...j->...i", c_mat, nu_r) + d_diag * nu_r
    tau_sum = tau + tau_liftdrag + tau_crossflow - cd_nu - g_vec
    return dnu_c + jnp.einsum("ij,...j->...i", p.m_inv, tau_sum)


def remus_substep(
    p: RemusParams,
    eta: jnp.ndarray,
    nu: jnp.ndarray,
    u_actual: jnp.ndarray,
    u_control: jnp.ndarray,
    nu_c: jnp.ndarray,
    dt: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One Euler substep: saturate -> accelerate -> integrate nu & actuators
    -> integrate eta with the *new* nu (remus100.py:472-476 + :504)."""
    sat_fins = jnp.clip(u_actual[..., 0:2], -p.delta_max, p.delta_max)
    sat_n = jnp.clip(u_actual[..., 2:3], -p.n_max, p.n_max)
    u_sat = jnp.concatenate([sat_fins, sat_n], axis=-1)

    nu_dot = remus_nu_dot(p, eta, nu, u_sat, nu_c)
    # First-order actuator lag toward commands (remus100.py:462-470).
    t_act = jnp.stack([p.t_delta, p.t_delta, p.t_n], axis=-1)
    u_dot = (u_control - u_sat) / t_act

    nu_new = nu + dt * nu_dot
    u_new = u_sat + dt * u_dot
    eta_dot = geom.euler_kinematics(eta, nu_new)
    eta_new = eta + dt * eta_dot
    return eta_new, nu_new, u_new, nu_dot


def remus_vehicle_step(
    p: RemusParams,
    state: jnp.ndarray,  # (..., 12) [eta, nu]
    u_actual: jnp.ndarray,  # (..., 3)
    u_control: jnp.ndarray,  # (..., 3) raw action (auvsim_remus.py:95)
    nu_c: jnp.ndarray,  # (..., 6)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One 0.1 s control tick = 5 Euler substeps (remus100.py:493-518).

    Returns (new_state12 with SSA-wrapped angles, new u_actual,
    state_dot12 = [J(eta_f) nu_f ; last nu_dot]).
    """
    def body(carry, _):
        eta, nu, ua = carry
        eta, nu, ua, nu_dot = remus_substep(p, eta, nu, ua, u_control, nu_c, p.sub_dt)
        return (eta, nu, ua), nu_dot

    (eta_f, nu_f, ua_f), nu_dots = jax.lax.scan(
        body, (state[..., :6], state[..., 6:], u_actual), None, length=p.n_substeps
    )
    last_nu_dot = jax.tree_util.tree_map(lambda x: x[-1], nu_dots)

    eta_dot = geom.euler_kinematics(eta_f, nu_f)
    state_dot = jnp.concatenate([eta_dot, last_nu_dot], axis=-1)
    eta_wrapped = eta_f.at[..., 3:6].set(geom.ssa(eta_f[..., 3:6]))
    new_state = jnp.concatenate([eta_wrapped, nu_f], axis=-1)
    return new_state, ua_f, state_dot
