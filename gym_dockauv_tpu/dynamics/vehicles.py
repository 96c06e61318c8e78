"""Vehicle definitions: BlueROV2, LAUV, REMUS 100 action interface.

Numeric parameter values are the published system-identification constants
used by the reference (sources cited there: Einarsson & Lipenitis; Wu & Eng;
Silva et al.; Fossen 2021):

  * BlueROV2: gym_dockauv/objects/vehicles/BlueROV2.xml + BlueROV2.py:27-88
  * LAUV:     gym_dockauv/objects/vehicles/LAUV.xml + LAUV.py:29-110
  * remus100 gym-side action bounds: objects/vehicles/remus100.py:45-48
    (full REMUS plant lives in dynamics/remus.py)

Custom vehicles can be loaded from the same flat-XML schema via
`VehicleSpec.from_xml` + `build_fossen_params`.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .statespace import FossenParams, VehicleSpec, build_fossen_params

__all__ = [
    "bluerov2_spec",
    "lauv_spec",
    "build_bluerov2",
    "build_lauv",
    "REMUS_U_BOUND",
    "make_vehicle",
]


def bluerov2_spec() -> VehicleSpec:
    """BlueROV2 heavy-configuration derivatives (BlueROV2.xml:9-42).

    X_udot/Y_vdot/Z_wdot are the Munk-moment-stabilized -7.57 values
    (BlueROV2.xml:25-27 change notes).
    """
    return VehicleSpec(
        name="BlueROV2",
        m=11.5,
        BY=114.8,
        I_x=0.21,
        I_y=0.245,
        I_z=0.245,
        z_G=0.02,
        X_udot=-7.57,
        Y_vdot=-7.57,
        Z_wdot=-7.57,
        K_pdot=-0.12,
        M_qdot=-0.12,
        N_rdot=-0.12,
        X_u=-4.03,
        Y_v=-6.22,
        Z_w=-5.18,
        K_p=-0.07,
        M_q=-0.07,
        N_r=-0.07,
        X_uu=-18.18,
        Y_vv=-21.66,
        Z_ww=-36.99,
        K_pp=-1.55,
        M_qq=-1.55,
        N_rr=-1.55,
    )


def lauv_spec() -> VehicleSpec:
    """LAUV torpedo derivatives (LAUV.xml:10-58)."""
    return VehicleSpec(
        name="LAUV",
        m=18.0,
        BY=177.58,
        I_x=0.0405,
        I_y=1.07,
        I_z=1.07,
        z_G=0.01,
        X_udot=-1.0291,
        Y_vdot=-16.153,
        Z_wdot=-16.153,
        K_pdot=0.0,
        M_qdot=0.758,
        N_rdot=0.758,
        X_u=-2.4,
        Y_v=-23.0,
        Z_w=-23.0,
        K_p=-0.3,
        M_q=-9.7,
        N_r=-9.7,
        X_uu=-2.4,
        Y_vv=-80.0,
        Z_ww=-80.0,
        K_pp=-0.0006,
        M_qq=-9.1,
        N_rr=-9.1,
        N_urf=-3.072,
        N_uvf=7.68,
        N_uvb=3.3088,
        M_uqf=-3.072,
        M_uwf=-7.68,
        M_uwb=-3.3088,
        Z_uqf=-7.68,
        Z_uwf=-19.2,
        Z_uwb=-10.956,
        Y_urf=7.68,
        Y_uvf=-19.2,
        Y_uvb=-10.956,
        N_vv=-1.5,
        M_ww=1.5,
        Z_qq=-0.3,
        Y_rr=0.3,
        N_v=-3.1,
        M_w=3.1,
        Z_q=-11.5,
        Y_r=11.5,
        N_uudr=-7.68,
        M_uuds=-7.68,
        Z_uuds=-19.2,
        Y_uudr=19.2,
    )


def build_bluerov2(control_mode: str = "joystick", dtype=jnp.float32) -> FossenParams:
    """BlueROV2 params; control modes per BlueROV2.py:34-74."""
    spec = bluerov2_spec()
    if control_mode == "joystick":
        k_thrust = 20.0
        b0 = np.diag([2.83, 2.83, 4.0, 0.436, 0.24, 0.378]) * k_thrust
        u_bound = np.array([[-1.0, 1.0]] * 6)
    elif control_mode == "direct":
        k_thrust = np.diag([40.0] * 8)
        t_thrust = np.array(
            [
                [0.707, 0.707, -0.707, -0.707, 0, 0, 0, 0],
                [-0.707, 0.707, -0.707, 0.707, 0, 0, 0, 0],
                [0, 0, 0, 0, -1, -1, -1, -1],
                [0.06, -0.06, 0.06, -0.06, -0.218, -0.218, 0.218, 0.218],
                [0.06, 0.06, -0.06, -0.06, 0.120, -0.120, 0.120, -0.120],
                [-0.189, 0.189, 0.189, -0.189, 0, 0, 0, 0],
            ]
        )
        b0 = t_thrust @ k_thrust
        u_bound = np.array([[-1.0, 1.0]] * 8)
    else:
        raise KeyError("Invalid control mode for BlueROV2 (joystick|direct).")
    return build_fossen_params(spec, b0=b0, u_bound=u_bound, dtype=dtype)


def build_lauv(dtype=jnp.float32) -> FossenParams:
    """LAUV params: u^2-scaled fin control matrix and cross-coupled damping
    (LAUV.py:59-110)."""
    s = lauv_spec()
    b0 = np.zeros((6, 3))
    b0[0, 0] = 1.0
    b2 = np.zeros((6, 3))
    b2[1, 1] = s.Y_uudr
    b2[2, 2] = s.Z_uuds
    b2[4, 2] = s.M_uuds
    b2[5, 1] = s.N_uudr

    d_lin = -np.array(
        [
            [s.X_u, 0, 0, 0, 0, 0],
            [0, s.Y_v, 0, 0, 0, s.Y_r],
            [0, 0, s.Z_w, 0, s.Z_q, 0],
            [0, 0, 0, s.K_p, 0, 0],
            [0, 0, s.M_w, 0, s.M_q, 0],
            [0, s.N_v, 0, 0, 0, s.N_r],
        ]
    )
    # Quadratic terms: entry (i, j) multiplies |nu_j| (column-scaled form).
    d_quad = -np.array(
        [
            [s.X_uu, 0, 0, 0, 0, 0],
            [0, s.Y_vv, 0, 0, 0, s.Y_rr],
            [0, 0, s.Z_ww, 0, s.Z_qq, 0],
            [0, 0, 0, s.K_pp, 0, 0],
            [0, 0, s.M_ww, 0, s.M_qq, 0],
            [0, s.N_vv, 0, 0, 0, s.N_rr],
        ]
    )
    d_lift = -np.array(
        [
            [0, 0, 0, 0, 0, 0],
            [0, s.Y_uvb + s.Y_uvf, 0, 0, 0, s.Y_urf],
            [0, 0, s.Z_uwb + s.Z_uwf, 0, s.Z_uqf, 0],
            [0, 0, 0, 0, 0, 0],
            [0, 0, s.M_uwb + s.M_uwf, 0, s.M_uqf, 0],
            [0, s.N_uvb + s.N_uvf, 0, 0, 0, s.N_urf],
        ]
    )
    u_bound = np.array(
        [
            [0.0, 14.0],
            [-30 * np.pi / 180, 30 * np.pi / 180],
            [-30 * np.pi / 180, 30 * np.pi / 180],
        ]
    )
    return build_fossen_params(
        s, b0=b0, b2=b2, d_lin=d_lin, d_quad=d_quad, d_lift=d_lift,
        u_bound=u_bound, dtype=dtype,
    )


# REMUS gym-side action bounds: [rudder cmd, stern cmd, prop rpm]
# (objects/vehicles/remus100.py:45-48).  SB3 emits actions directly in these
# units; the remus env passes them through raw (auvsim_remus.py:95).
REMUS_U_BOUND = np.array([[-10.0, 10.0], [-10.0, 10.0], [0.0, 1500.0]])


def make_vehicle(name: str, dtype=jnp.float32):
    """Vehicle factory by config string (reference docking3d.py:76-78)."""
    if name == "BlueROV2":
        return build_bluerov2(dtype=dtype)
    if name == "LAUV":
        return build_lauv(dtype=dtype)
    raise KeyError(f"Unknown Fossen vehicle {name!r} (BlueROV2|LAUV); "
                   "remus100 uses gym_dockauv_tpu.dynamics.remus")
