"""Vehicle-simulator periphery parity tests.

Each vehicle model + autopilot is driven through BOTH the reference's
`simulate` harness (python_vehicle_simulator/lib/mainLoop.py:60-101) and our
scan-based `pvs.simulate`, and full trajectories are compared (x64 parity
mode from conftest)."""
import numpy as np
import pytest

from .reference_oracle import load_reference

from gym_dockauv_tpu import pvs


def _run_reference(name, mode, kwargs, N, dt):
    load_reference()
    from python_vehicle_simulator.lib.mainLoop import simulate as ref_sim
    import python_vehicle_simulator.vehicles as rv

    cls = getattr(rv, name)
    vehicle = cls(mode, **kwargs) if mode != "stepInput" else cls()
    if name == "remus100":
        # the reference's gym adaptation added an nu_c argument to
        # remus100.dynamics (remus100.py:241), breaking its own mainLoop;
        # drive it manually with nu_c from (V_c, beta_c) like the original
        # commented-out code (remus100.py:251-252)
        return _ref_sim_remus(vehicle, N, dt)
    return ref_sim(N, dt, vehicle)


def _ref_sim_remus(vehicle, N, dt):
    import math as _math

    from python_vehicle_simulator.lib.gnc import attitudeEuler

    eta = np.zeros(6)
    nu = vehicle.nu.copy()
    u_actual = vehicle.u_actual.copy()
    sim_data = np.empty((0, 12 + 2 * vehicle.dimU))
    for i in range(N + 1):
        t = i * dt
        if vehicle.controlMode == "depthHeadingAutopilot":
            u_control = vehicle.depthHeadingAutopilot(eta, nu, dt)
        else:
            u_control = vehicle.stepInput(t)
        row = np.concatenate([eta, nu, u_control, u_actual])
        sim_data = np.vstack([sim_data, row])
        u_c = vehicle.V_c * _math.cos(vehicle.beta_c - eta[5])
        v_c = vehicle.V_c * _math.sin(vehicle.beta_c - eta[5])
        nu_c = np.array([u_c, v_c, 0, 0, 0, 0], float)
        nu, u_actual, _ = vehicle.dynamics(eta, nu, u_actual, u_control, dt,
                                           nu_c)
        eta = attitudeEuler(eta, nu, dt)
    sim_time = np.arange(0, (N + 1) * dt, dt)[: N + 1, None]
    return sim_time, sim_data


def _run_ours(name, mode, args, N, dt):
    cls = pvs.VEHICLES[name]
    vehicle = cls(mode, *args) if mode != "stepInput" else cls()
    return pvs.simulate(vehicle, N, dt)


CASES = [
    # (name, mode, ref kwargs builder / our positional args, N, dt, tol)
    ("DSRV", "stepInput", (), 300, 0.02, 1e-9),
    ("DSRV", "depthAutopilot", (60.0,), 300, 0.02, 1e-9),
    ("frigate", "stepInput", (), 300, 0.02, 1e-9),
    ("frigate", "headingAutopilot", (6.0, 30.0), 300, 0.02, 1e-9),
    ("ROVzefakkel", "stepInput", (), 300, 0.02, 1e-9),
    ("ROVzefakkel", "headingAutopilot", (3.0, 20.0), 300, 0.02, 1e-9),
    ("tanker", "stepInput", (), 300, 0.05, 1e-9),
    ("tanker", "headingAutopilot", (10.0, 0.5, 150.0, 20.0, 70.0), 300, 0.05,
     1e-9),
    ("shipClarke83", "stepInput", (), 300, 0.05, 1e-7),
    ("shipClarke83", "headingAutopilot",
     (10.0, 50.0, 7.0, 5.0, 0.7, 0.5, 150.0, 1e5), 300, 0.05, 1e-7),
    ("semisub", "stepInput", (), 200, 0.1, 1e-7),
    ("semisub", "DPcontrol", (4.0, 3.0, 20.0, 0.5, 190.0), 200, 0.1, 1e-7),
    ("supply", "stepInput", (), 200, 0.1, 1e-7),
    ("supply", "DPcontrol", (4.0, 3.0, 20.0, 0.5, 190.0), 200, 0.1, 1e-7),
    ("otter", "stepInput", (), 300, 0.02, 1e-7),
    ("otter", "headingAutopilot", (30.0, 0.3, 150.0, 110.0), 300, 0.02, 1e-7),
    ("remus100", "stepInput", (), 200, 0.02, 1e-6),
    ("remus100", "depthHeadingAutopilot", (30.0, 50.0, 1525.0, 0.5, 170.0),
     200, 0.02, 1e-6),
]

MODE_MAP = {  # our ctor mode strings match the reference's
    "stepInput": "stepInput",
    "depthAutopilot": "depthAutopilot",
    "headingAutopilot": "headingAutopilot",
    "DPcontrol": "DPcontrol",
    "depthHeadingAutopilot": "depthHeadingAutopilot",
}


@pytest.mark.parametrize("name,mode,args,N,dt,tol",
                         CASES, ids=[f"{c[0]}-{c[1]}" for c in CASES])
def test_pvs_vehicle_parity(name, mode, args, N, dt, tol):
    t_ref, data_ref = _run_reference(name, mode, dict(
        zip(_ref_kwarg_names(name, mode), args)) or {}, N, dt)
    t_our, data_our = _run_ours(name, MODE_MAP[mode], args, N, dt)
    assert data_our.shape == data_ref.shape
    np.testing.assert_allclose(t_our[:, 0], t_ref[:, 0], atol=1e-12)
    scale = np.maximum(np.abs(data_ref).max(axis=0), 1.0)
    err = np.abs(data_our - data_ref).max(axis=0) / scale
    assert err.max() < tol, (
        f"max rel err {err.max():.2e} at column {int(err.argmax())}")


def _ref_kwarg_names(name, mode):
    if mode == "stepInput":
        return []
    if name == "DSRV":
        return ["r"]
    if name in ("frigate", "ROVzefakkel"):
        return ["U", "r"]
    if name == "tanker":
        return ["r", "V_current", "beta_current", "depth", "rpm"]
    if name == "shipClarke83":
        return ["r", "L", "B", "T", "Cb", "V_current", "beta_current",
                "tau_X"]
    if name in ("semisub", "supply"):
        return ["r_x", "r_y", "r_n", "V_current", "beta_current"]
    if name == "otter":
        return ["r", "V_current", "beta_current", "tau_X"]
    if name == "remus100":
        return ["r_z", "r_psi", "r_rpm", "V_current", "beta_current"]
    raise KeyError(name)


def test_pid_pole_placement_matches_reference():
    load_reference()
    from python_vehicle_simulator.lib.control import PIDpolePlacement

    import jax.numpy as jnp

    st = pvs.PIDState(jnp.asarray(0.2), jnp.asarray(0.1), jnp.asarray(0.05),
                      jnp.asarray(0.01))
    u, st2 = pvs.pid_pole_placement(st, 0.3, -0.1, 10.0, 2.0, 0.5, 0.2, 1.0,
                                    1.0, 0.8, 1.5, 0.5, 0.02)
    u_ref, e_int, x_d, v_d, a_d = PIDpolePlacement(
        0.2, 0.3, -0.1, 0.1, 0.05, 0.01, 10.0, 2.0, 0.5, 0.2, 1.0, 1.0, 0.8,
        1.5, 0.5, 0.02)
    np.testing.assert_allclose(float(u), u_ref, rtol=1e-12)
    np.testing.assert_allclose(float(st2.e_int), e_int, rtol=1e-12)
    np.testing.assert_allclose(float(st2.x_d), x_d, rtol=1e-12)
    np.testing.assert_allclose(float(st2.v_d), v_d, rtol=1e-12)
    np.testing.assert_allclose(float(st2.a_d), a_d, rtol=1e-12)


def test_clarke83_matches_reference():
    load_reference()
    from python_vehicle_simulator.lib.models import clarke83 as ref_clarke

    m_ref, n_ref = ref_clarke(3.0, 50.0, 7.0, 5.0, 0.7, 12.5, 0.0, 50.0)
    m, n = pvs.clarke83(3.0, 50.0, 7.0, 5.0, 0.7, 12.5, 0.0, 50.0)
    np.testing.assert_allclose(np.asarray(m), m_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(n), n_ref, rtol=1e-9)


def test_simulate_plot(tmp_path):
    v = pvs.Frigate("headingAutopilot", 6.0, 20.0)
    t, data = pvs.simulate(v, 100, 0.05)
    out = pvs.plot_time_series(v, t, data, save_path=str(tmp_path / "ts.png"))
    import os

    assert os.path.exists(out)


def test_tanker_saturation_regime_parity():
    """Force the rudder past deltaMax: the reference computes forces with
    the RAW stored angle and saturates only before the rate limit
    (tanker.py:133,267-272) — drive both dynamics there directly."""
    load_reference()
    import jax.numpy as jnp
    from python_vehicle_simulator.vehicles.tanker import tanker as RefTanker
    from python_vehicle_simulator.lib.gnc import attitudeEuler

    from gym_dockauv_tpu.pvs.sim import attitude_euler

    ref = RefTanker()
    ours = pvs.Tanker()
    eta = np.zeros(6)
    nu = np.asarray(ref.nu).copy()
    ua = np.asarray(ref.u_actual).copy()
    eta_j, nu_j, ua_j = jnp.zeros(6), jnp.asarray(nu), jnp.asarray(ua)
    dt = 0.2
    u_cmd = np.array([np.deg2rad(45.0)])  # far beyond deltaMax = 30 deg
    saturated_steps = 0
    for _ in range(120):
        nu, ua = ref.dynamics(eta, nu, ua, u_cmd, dt)
        eta = attitudeEuler(eta, nu, dt)
        nu_j, ua_j = ours.dynamics(eta_j, nu_j, ua_j, jnp.asarray(u_cmd), dt)
        eta_j = attitude_euler(eta_j, nu_j, dt)
        saturated_steps += int(abs(ua[0]) > np.deg2rad(30.0) - 1e-9)
    assert saturated_steps > 50, "drive did not reach the saturation regime"
    np.testing.assert_allclose(np.asarray(nu_j), nu, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ua_j), ua, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(eta_j), eta, rtol=1e-9, atol=1e-12)
