"""Fossen 6-DOF state-space dynamics, precomputed for XLA.

Re-design of the reference's `StateSpace`/`AUVSim` object graph
(gym_dockauv/objects/statespace.py:11-448, auvsim.py:11-171) as:

  * a host-side spec (`VehicleSpec`) holding the named hydrodynamic
    derivatives (the values that live in the reference's flat XML files),
  * a device-side parameter pytree (`FossenParams`) with everything
    state-independent precomputed (M^-1, damping coefficient matrices,
    control-matrix polynomial, restoring-force constants),
  * pure batched functions `fossen_state_dot` / `fossen_vehicle_step`.

The damping generalization: the reference's base class uses diagonal
linear+quadratic damping (statespace.py:288-351) while LAUV overrides D with
cross-coupled linear, quadratic and lift terms (vehicles/LAUV.py:69-101).
Both are instances of

    D(nu) = D_lin + D_quad * |nu|_col + D_lift * |nu_0|

where ``|nu|_col`` scales column j by |nu_j| — so one compiled kernel covers
every vehicle of this family.  Likewise B(nu) = B0 + B2 * nu_0^2 covers the
constant BlueROV2 B (vehicles/BlueROV2.py:37-44) and LAUV's u^2-scaled fins
(vehicles/LAUV.py:59-67).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple
import xml.etree.ElementTree as ET

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import geom
from ..ops.filters import apply_lowpass
from ..ops.integrators import rkf45_step

# ---------------------------------------------------------------------------
# Host-side spec
# ---------------------------------------------------------------------------

_SCALAR_FIELDS = (
    "m BY I_x I_y I_z I_xy I_xz I_yz x_G y_G z_G x_B y_B z_B "
    "X_udot Y_vdot Z_wdot K_pdot M_qdot N_rdot "
    "X_u Y_v Z_w K_p M_q N_r X_uu Y_vv Z_ww K_pp M_qq N_rr"
).split()

# Extra derivatives used by the LAUV damping/control model
# (vehicles/LAUV.py:32-55).
_LAUV_FIELDS = (
    "N_urf N_uvf N_uvb M_uqf M_uwf M_uwb Z_uqf Z_uwf Z_uwb Y_urf Y_uvf Y_uvb "
    "N_vv M_ww Z_qq Y_rr N_v M_w Z_q Y_r N_uudr M_uuds Z_uuds Y_uudr"
).split()


@dataclasses.dataclass
class VehicleSpec:
    """Named hydrodynamic derivatives (the reference's XML schema).

    Defaults mirror `StateSpace.__init__` (statespace.py:55-84).
    """

    name: str = "AUV"
    g: float = 9.81
    m: float = 0.0
    BY: float = 0.0
    I_x: float = 0.0
    I_y: float = 0.0
    I_z: float = 0.0
    I_xy: float = 0.0
    I_xz: float = 0.0
    I_yz: float = 0.0
    x_G: float = 0.0
    y_G: float = 0.0
    z_G: float = 0.0
    x_B: float = 0.0
    y_B: float = 0.0
    z_B: float = 0.0
    X_udot: float = 0.0
    Y_vdot: float = 0.0
    Z_wdot: float = 0.0
    K_pdot: float = 0.0
    M_qdot: float = 0.0
    N_rdot: float = 0.0
    X_u: float = 0.0
    Y_v: float = 0.0
    Z_w: float = 0.0
    K_p: float = 0.0
    M_q: float = 0.0
    N_r: float = 0.0
    X_uu: float = 0.0
    Y_vv: float = 0.0
    Z_ww: float = 0.0
    K_pp: float = 0.0
    M_qq: float = 0.0
    N_rr: float = 0.0
    # LAUV extras (zero for other vehicles)
    N_urf: float = 0.0
    N_uvf: float = 0.0
    N_uvb: float = 0.0
    M_uqf: float = 0.0
    M_uwf: float = 0.0
    M_uwb: float = 0.0
    Z_uqf: float = 0.0
    Z_uwf: float = 0.0
    Z_uwb: float = 0.0
    Y_urf: float = 0.0
    Y_uvf: float = 0.0
    Y_uvb: float = 0.0
    N_vv: float = 0.0
    M_ww: float = 0.0
    Z_qq: float = 0.0
    Y_rr: float = 0.0
    N_v: float = 0.0
    M_w: float = 0.0
    Z_q: float = 0.0
    Y_r: float = 0.0
    N_uudr: float = 0.0
    M_uuds: float = 0.0
    Z_uuds: float = 0.0
    Y_uudr: float = 0.0

    @classmethod
    def from_xml(cls, xml_path: str) -> "VehicleSpec":
        """Load a flat vehicle-parameter XML (reference statespace.py:427-448).

        Unknown tags raise, matching the reference's strict loader.
        """
        spec = cls()
        known = {f.name for f in dataclasses.fields(cls)}
        root = ET.parse(xml_path).getroot()
        for child in root:
            if child.tag in ("name",):
                spec.name = child.text
            elif child.tag in ("version",):
                continue
            elif child.tag in known:
                setattr(spec, child.tag, float(child.text))
            else:
                raise AttributeError(
                    f"Unknown vehicle parameter tag {child.tag!r}; declare it "
                    "in VehicleSpec first (mirrors reference policy)."
                )
        return spec


# ---------------------------------------------------------------------------
# Device-side parameter pytree
# ---------------------------------------------------------------------------


@struct.dataclass
class FossenParams:
    """Precomputed constants for `fossen_state_dot`; all state-independent."""

    m: jnp.ndarray  # scalar
    w_weight: jnp.ndarray  # scalar, W = m*g
    buoyancy: jnp.ndarray  # scalar, BY
    r_g: jnp.ndarray  # (3,)
    r_b: jnp.ndarray  # (3,)
    i_b: jnp.ndarray  # (3,3) inertia about CO (statespace.py:104-117)
    ma_lin: jnp.ndarray  # (3,) diag of M_A translational block (positive)
    ma_ang: jnp.ndarray  # (3,) diag of M_A rotational block (positive)
    m_inv: jnp.ndarray  # (6,6)
    d_lin: jnp.ndarray  # (6,6)
    d_quad: jnp.ndarray  # (6,6), column-scaled by |nu_j|
    d_lift: jnp.ndarray  # (6,6), scaled by |nu_0|
    b0: jnp.ndarray  # (6,a)
    b2: jnp.ndarray  # (6,a), scaled by nu_0^2
    u_bound: jnp.ndarray  # (a,2) [low, high]
    lpf_t1: jnp.ndarray  # scalar, input low-pass time constant


def build_fossen_params(
    spec: VehicleSpec,
    b0: np.ndarray,
    u_bound: np.ndarray,
    b2: np.ndarray | None = None,
    d_lin: np.ndarray | None = None,
    d_quad: np.ndarray | None = None,
    d_lift: np.ndarray | None = None,
    lpf_t1: float = 0.2,
    dtype=jnp.float32,
) -> FossenParams:
    """Assemble the precomputed pytree in float64 on host, cast to dtype."""
    s = spec
    i_g = np.array(
        [
            [s.I_x, -s.I_xy, -s.I_xz],
            [-s.I_xy, s.I_y, -s.I_yz],
            [s.I_xz, -s.I_yz, s.I_z],
        ]
    )
    r_g = np.array([s.x_G, s.y_G, s.z_G])
    r_b = np.array([s.x_B, s.y_B, s.z_B])

    def skew_np(a):
        return np.array(
            [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]], dtype=float
        )

    # I_b about CO (statespace.py:115)
    i_b = i_g + s.m * skew_np(r_g) @ skew_np(r_g).T

    # M_RB at CO via H-transform (statespace.py:138-161)
    m_rb_cg = np.zeros((6, 6))
    m_rb_cg[:3, :3] = s.m * np.eye(3)
    m_rb_cg[3:, 3:] = i_g
    h = np.eye(6)
    h[0:3, 3:6] = skew_np(r_g).T
    m_rb = h.T @ m_rb_cg @ h

    # Diagonal added mass (statespace.py:164-187); derivatives are negative.
    ma_diag = -np.array([s.X_udot, s.Y_vdot, s.Z_wdot, s.K_pdot, s.M_qdot, s.N_rdot])
    m_total = m_rb + np.diag(ma_diag)
    m_inv = np.linalg.inv(m_total)

    if d_lin is None:
        d_lin = np.diag(-np.array([s.X_u, s.Y_v, s.Z_w, s.K_p, s.M_q, s.N_r]))
    if d_quad is None:
        d_quad = np.diag(-np.array([s.X_uu, s.Y_vv, s.Z_ww, s.K_pp, s.M_qq, s.N_rr]))
    if d_lift is None:
        d_lift = np.zeros((6, 6))
    if b2 is None:
        b2 = np.zeros_like(np.asarray(b0, dtype=float))

    as_dt = lambda x: jnp.asarray(np.asarray(x, dtype=np.float64), dtype=dtype)
    return FossenParams(
        m=as_dt(s.m),
        w_weight=as_dt(s.m * s.g),
        buoyancy=as_dt(s.BY),
        r_g=as_dt(r_g),
        r_b=as_dt(r_b),
        i_b=as_dt(i_b),
        ma_lin=as_dt(ma_diag[:3]),
        ma_ang=as_dt(ma_diag[3:]),
        m_inv=as_dt(m_inv),
        d_lin=as_dt(d_lin),
        d_quad=as_dt(d_quad),
        d_lift=as_dt(d_lift),
        b0=as_dt(b0),
        b2=as_dt(b2),
        u_bound=as_dt(u_bound),
        lpf_t1=as_dt(lpf_t1),
    )


# ---------------------------------------------------------------------------
# Pure dynamics
# ---------------------------------------------------------------------------


def coriolis(params: FossenParams, nu_r: jnp.ndarray) -> jnp.ndarray:
    """C(nu_r) = C_RB + C_A, shape (..., 6, 6).

    C_RB uses the velocity-independent parametrization (statespace.py:199-228)
    and C_A the diagonal-added-mass skew form (statespace.py:230-276).
    """
    nu1, nu2 = nu_r[..., 0:3], nu_r[..., 3:6]
    s_nu2 = geom.skew(nu2)
    s_rg = geom.skew(params.r_g)
    ib_nu2 = jnp.einsum("ij,...j->...i", params.i_b, nu2)

    c_rb_tl = params.m * s_nu2
    c_rb_tr = -params.m * s_nu2 @ s_rg
    c_rb_bl = params.m * s_rg @ s_nu2
    c_rb_br = -geom.skew(ib_nu2)

    s_ma1 = geom.skew(params.ma_lin * nu1)
    s_ma2 = geom.skew(params.ma_ang * nu2)
    # M_A = -diag(derivatives) so M_A11 @ nu1 = +ma_lin*nu1... careful:
    # reference C_A uses M_A directly; M_A = -diag([X_udot..]) = +diag(ma).
    c_a_tr = -s_ma1
    c_a_bl = -s_ma1
    c_a_br = -s_ma2

    top = jnp.concatenate([c_rb_tl, c_rb_tr + c_a_tr], axis=-1)
    bot = jnp.concatenate([c_rb_bl + c_a_bl, c_rb_br + c_a_br], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def damping(params: FossenParams, nu_r: jnp.ndarray) -> jnp.ndarray:
    """D(nu_r) as D_lin + D_quad*|nu|_col + D_lift*|u| (see module doc)."""
    abs_nu = jnp.abs(nu_r)
    return (
        params.d_lin
        + params.d_quad * abs_nu[..., None, :]
        + params.d_lift * abs_nu[..., 0, None, None]
    )


def restoring(params: FossenParams, eta: jnp.ndarray) -> jnp.ndarray:
    """Restoring force vector G(eta) (statespace.py:353-397), shape (..., 6)."""
    phi, theta = eta[..., 3], eta[..., 4]
    sth, cth = jnp.sin(theta), jnp.cos(theta)
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    w, b = params.w_weight, params.buoyancy
    xw = params.r_g[0] * w - params.r_b[0] * b
    yw = params.r_g[1] * w - params.r_b[1] * b
    zw = params.r_g[2] * w - params.r_b[2] * b
    return jnp.stack(
        [
            (w - b) * sth,
            -(w - b) * cth * sphi,
            -(w - b) * cth * cphi,
            -yw * cth * cphi + zw * cth * sphi,
            zw * sth + xw * cth * cphi,
            -xw * cth * sphi - yw * sth,
        ],
        axis=-1,
    )


def control_matrix(params: FossenParams, nu_r: jnp.ndarray) -> jnp.ndarray:
    """B(nu) = B0 + B2 * u^2, shape (..., 6, a)."""
    u2 = nu_r[..., 0, None, None] ** 2
    return params.b0 + params.b2 * u2


def coriolis_times_nu(params: FossenParams, nu_r: jnp.ndarray) -> jnp.ndarray:
    """(C_RB + C_A) @ nu_r in closed form — skew matvecs become cross
    products, so no (..., 6, 6) temporaries (those tile at 36/1024 lane
    utilization on TPU).  Algebraically identical to
    `coriolis(params, nu_r) @ nu_r`; verified in tests."""
    nu1, nu2 = nu_r[..., 0:3], nu_r[..., 3:6]
    m = params.m
    rg = params.r_g
    ib_nu2 = jnp.einsum("ij,...j->...i", params.i_b, nu2)
    nu2_x_nu1 = jnp.cross(nu2, nu1)
    # C_RB rows: S(a)@b == a x b for each skew block
    top = m * (nu2_x_nu1 - jnp.cross(nu2, jnp.cross(rg, nu2)))
    bot = m * jnp.cross(rg, nu2_x_nu1) - jnp.cross(ib_nu2, nu2)
    # C_A blocks: -S(ma_lin*nu1) (tr & bl), -S(ma_ang*nu2) (br)
    ma1 = params.ma_lin * nu1
    ma2 = params.ma_ang * nu2
    top = top - jnp.cross(ma1, nu2)
    bot = bot - jnp.cross(ma1, nu1) - jnp.cross(ma2, nu2)
    return jnp.concatenate([top, bot], axis=-1)


def damping_times_nu(params: FossenParams, nu_r: jnp.ndarray) -> jnp.ndarray:
    """D(nu_r) @ nu_r via three constant-matrix matvecs (no (...,6,6)
    temporaries).  Identical to `damping(params, nu_r) @ nu_r`."""
    abs_nu = jnp.abs(nu_r)
    lin = jnp.einsum("ij,...j->...i", params.d_lin, nu_r)
    quad = jnp.einsum("ij,...j->...i", params.d_quad, abs_nu * nu_r)
    lift = abs_nu[..., 0, None] * jnp.einsum("ij,...j->...i", params.d_lift,
                                             nu_r)
    return lin + quad + lift


def fossen_state_dot(
    params: FossenParams,
    state: jnp.ndarray,
    u: jnp.ndarray,
    nu_c: jnp.ndarray,
) -> jnp.ndarray:
    """RHS of the 12 ODEs (auvsim.py:120-171): [J(eta)(nu_r+nu_c); M^-1 tau].

    ``state`` is (..., 12) = [eta, nu_r]; ``u`` (..., a); ``nu_c`` (..., 6).
    Hot-path form: all matrix products are either constant-matrix matvecs or
    closed-form cross-product expansions (see coriolis_times_nu).
    """
    eta = state[..., :6]
    nu_r = state[..., 6:]

    eta_dot = geom.euler_kinematics(eta, nu_r + nu_c)

    # B(nu) @ u = B0 @ u + u_surge^2 * (B2 @ u)
    tau = jnp.einsum("ij,...j->...i", params.b0, u) \
        + nu_r[..., 0, None] ** 2 * jnp.einsum("ij,...j->...i", params.b2, u)
    forces = tau - coriolis_times_nu(params, nu_r) \
        - damping_times_nu(params, nu_r) - restoring(params, eta)
    nu_dot = jnp.einsum("ij,...j->...i", params.m_inv, forces)
    return jnp.concatenate([eta_dot, nu_dot], axis=-1)


def unnormalize_input(params: FossenParams, action: jnp.ndarray) -> jnp.ndarray:
    """Map [-1,1] action linearly to u_bound (auvsim.py:67-75)."""
    a = jnp.clip(action, -1.0, 1.0)
    lo, hi = params.u_bound[..., 0], params.u_bound[..., 1]
    return lo + (hi - lo) * (a + 1.0) / 2.0


def fossen_vehicle_step(
    params: FossenParams,
    state: jnp.ndarray,
    u_prev: jnp.ndarray,
    action: jnp.ndarray,
    nu_c: jnp.ndarray,
    dt: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One control tick: unnormalize -> LPF -> RKF45 -> angle wrap.

    Mirrors `AUVSim.step`/`_sim` (auvsim.py:77-118): the 4th-order RKF45
    result is kept, angles are SSA-wrapped, and the post-step state
    derivative is cached (used by the reward's Thetadot term and by
    chi/upsilon).  Returns (new_state, new_u, state_dot_cache).
    """
    u_cmd = unnormalize_input(params, action)
    u = apply_lowpass(u_cmd, u_prev, dt, params.lpf_t1)

    w4, _ = rkf45_step(lambda y: fossen_state_dot(params, y, u, nu_c), state, dt)
    new_state = w4.at[..., 3:6].set(geom.ssa(w4[..., 3:6]))
    state_dot_cache = fossen_state_dot(params, new_state, u, nu_c)
    return new_state, u, state_dot_cache
