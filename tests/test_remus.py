"""Parity tests: REMUS 100 plant vs reference python_vehicle_simulator."""
import numpy as np
import jax
import jax.numpy as jnp

from gym_dockauv_tpu.dynamics.remus import (
    build_remus_params,
    remus_nu_dot,
    remus_vehicle_step,
)
from .reference_oracle import load_reference

load_reference()
from python_vehicle_simulator.vehicles.remus100 import remus100 as RefRemus  # noqa: E402


def test_constant_assembly_parity():
    ref = RefRemus()
    p = build_remus_params(dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(p.mrb), ref.MRB, atol=1e-10)
    np.testing.assert_allclose(np.asarray(p.ma), ref.MA, atol=1e-10)
    np.testing.assert_allclose(np.asarray(p.m_inv), ref.Minv, atol=1e-12)
    np.testing.assert_allclose(float(p.w_weight), ref.W, atol=1e-10)
    np.testing.assert_allclose(float(p.cd_0), ref.CD_0, atol=1e-14)
    assert float(p.cl_delta_r) == ref.CL_delta_r == 5
    assert float(p.cl_delta_s) == ref.CL_delta_s == 7


def test_nu_dot_parity():
    """Single-substep acceleration against reference dynamics()."""
    ref = RefRemus()
    p = build_remus_params(dtype=jnp.float64)
    rng = np.random.default_rng(0)
    for trial in range(12):
        eta = rng.normal(size=6) * np.array([5, 5, 5, 0.3, 0.3, 2])
        nu = rng.normal(size=6) * np.array([1.5, 0.5, 0.5, 0.2, 0.2, 0.5])
        u_actual = np.array(
            [rng.uniform(-0.7, 0.7), rng.uniform(-0.7, 0.7), rng.uniform(-200, 1600)]
        )
        u_control = np.array([rng.uniform(-10, 10), rng.uniform(-10, 10), rng.uniform(0, 1500)])
        nu_c = np.concatenate([rng.normal(size=3) * 0.3, np.zeros(3)])

        nu_ref, ua_ref, nudot_ref = ref.dynamics(
            eta.copy(), nu.copy(), u_actual.copy(), u_control.copy(), 0.02, nu_c.copy()
        )
        # our kernel takes the saturated actuator state
        sat = np.concatenate(
            [np.clip(u_actual[:2], -ref.deltaMax_r, ref.deltaMax_r),
             np.clip(u_actual[2:], -ref.nMax, ref.nMax)]
        )
        got = np.asarray(
            remus_nu_dot(p, jnp.asarray(eta), jnp.asarray(nu), jnp.asarray(sat), jnp.asarray(nu_c))
        )
        np.testing.assert_allclose(got, nudot_ref, atol=1e-9, err_msg=f"trial {trial}")


def test_control_tick_parity():
    """Full 5-substep control tick vs reference remus_solver over a
    trajectory, including actuator lag/saturation and SSA wrap."""
    ref = RefRemus()
    ref.reset()  # initializes the solver's time/bookkeeping state
    p = build_remus_params(dtype=jnp.float64)
    rng = np.random.default_rng(7)

    import gym_dockauv.utils.geomutils as ref_geom

    state = np.zeros(12)
    u_actual = np.zeros(3)
    state_j = jnp.zeros(12, dtype=jnp.float64)
    ua_j = jnp.zeros(3, dtype=jnp.float64)

    @jax.jit
    def tick(s, ua, uc, nc):
        return remus_vehicle_step(p, s, ua, uc, nc)

    for t in range(60):
        u_control = np.array(
            [rng.uniform(-10, 10), rng.uniform(-10, 10), rng.uniform(0, 1500)]
        )
        nu_c = np.concatenate([rng.normal(size=3) * 0.3, np.zeros(3)])

        s12, u_actual, sdot_ref = ref.remus_solver(
            u_control.copy(), state[:6].copy(), state[6:].copy(), nu_c.copy(), u_actual.copy()
        )
        s12[3:6] = ref_geom.ssa(s12[3:6])  # env-level wrap (auvsim_remus.py:132)
        state = s12

        state_j, ua_j, sdot_j = tick(state_j, ua_j, jnp.asarray(u_control), jnp.asarray(nu_c))
        np.testing.assert_allclose(np.asarray(state_j), state, atol=1e-8, err_msg=f"t={t}")
        np.testing.assert_allclose(np.asarray(ua_j), u_actual, atol=1e-8)
        np.testing.assert_allclose(np.asarray(sdot_j), sdot_ref, atol=1e-7)


def test_vmap_and_batch():
    p = build_remus_params(dtype=jnp.float64)
    rng = np.random.default_rng(5)
    n = 8
    s = jnp.asarray(rng.normal(size=(n, 12)) * 0.1)
    ua = jnp.zeros((n, 3), dtype=jnp.float64)
    uc = jnp.asarray(np.tile(np.array([2.0, -3.0, 1200.0]), (n, 1)))
    nc = jnp.zeros((n, 6), dtype=jnp.float64)
    batched = jax.vmap(lambda a, b, c, d: remus_vehicle_step(p, a, b, c, d))
    bs, bua, bsd = batched(s, ua, uc, nc)
    s0, ua0, sd0 = remus_vehicle_step(p, s[0], ua[0], uc[0], nc[0])
    np.testing.assert_allclose(np.asarray(bs[0]), np.asarray(s0), atol=1e-12)
    assert np.all(np.isfinite(np.asarray(bs)))
