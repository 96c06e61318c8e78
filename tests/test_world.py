"""Parity tests: radar fan + currents vs reference sensor.py / current.py /
genenate_current.py."""
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp

from gym_dockauv_tpu.world import radar as tr
from gym_dockauv_tpu.world import current as tc
from .reference_oracle import load_reference

load_reference()


def _install_grid_stub():
    """current.py imports genenate_current, which unpickles current.pkl at
    import time (the pickle does not exist in the reference checkout).  The
    GM/NED code paths never call it; install an inert stub."""
    name = "gym_dockauv.objects.genenate_current"
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.generate_current = lambda *a, **k: np.zeros(3)
        sys.modules[name] = mod


_install_grid_stub()
from gym_dockauv.objects.sensor import Radar as RefRadar  # noqa: E402
from gym_dockauv.objects.current import Current as RefCurrent  # noqa: E402


def test_radar_fan_parity():
    eta = np.array([1.0, -2.0, 0.5, 0.1, -0.2, 0.7])
    ref = RefRadar(eta=eta, freq=1, alpha=60 * np.pi / 180, beta=80 * np.pi / 180,
                   ray_per_deg=10 * np.pi / 180, max_dist=10, blocksize_reduce=2)
    fan = tr.build_radar_fan(dtype=jnp.float64)
    assert fan.n_rays == ref.n_rays == 63
    assert (fan.n_vertical, fan.n_horizontal) == (ref.n_vertical, ref.n_horizontal)
    assert fan.n_rays_reduced == ref.n_rays_reduced == 20
    np.testing.assert_allclose(np.asarray(fan.rd_b), ref.rd_b, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fan.alpha), ref.alpha, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fan.beta), ref.beta, atol=1e-12)

    ref.update(eta)
    got = np.asarray(tr.ray_directions_ned(fan, jnp.asarray(eta[3:6])))
    np.testing.assert_allclose(got, ref.rd_n, atol=1e-12)


def test_radar_clamp_and_reduce_parity():
    rng = np.random.default_rng(0)
    eta = np.zeros(6)
    ref = RefRadar(eta=eta, freq=1, alpha=60 * np.pi / 180, beta=80 * np.pi / 180,
                   ray_per_deg=10 * np.pi / 180, max_dist=10, blocksize_reduce=2)
    fan = tr.build_radar_fan(dtype=jnp.float64)
    dist = rng.uniform(-5, 15, size=63)
    dist[5] = -np.inf
    ref.update_intersec(dist.copy())
    got_clamped = np.asarray(tr.clamp_intersections(fan, jnp.asarray(dist)))
    np.testing.assert_allclose(got_clamped, ref.intersec_dist, atol=1e-12)
    got_red = np.asarray(tr.reduced_observation(fan, jnp.asarray(got_clamped)))
    np.testing.assert_allclose(got_red, ref.intersec_dist_reduced, atol=1e-12)


def test_gauss_markov_and_body_rotation_parity():
    """GM step with zero noise is deterministic; compare over 100 steps."""
    ref = RefCurrent(mu=0.005, V_min=0.2, V_max=0.9, Vc_init=0.8, alpha_init=0.4,
                     beta_init=-1.1, white_noise_std=0.0, step_size=0.1)
    p = tc.make_current_params(mu=0.005, v_min=0.2, v_max=0.9, alpha=0.4, beta=-1.1,
                               white_noise_std=0.0, dtype=jnp.float64)
    v = jnp.asarray(0.8, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    for _ in range(100):
        ref.sim()
        v = tc.gauss_markov_step(p, v, key, 0.1)
    np.testing.assert_allclose(float(v), ref.V_c, atol=1e-12)

    att = np.array([0.2, -0.3, 1.2])
    want = ref(att)
    got = np.asarray(tc.nu_c_body(jnp.asarray(att), tc.current_ned(p, v)))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_grid_current_closed_form_vs_generator_math():
    """Re-run the reference generator's math (genenate_current.py:38-55 with
    numpy meshgrid 'xy' semantics) at sampled query points and compare to the
    closed-form lookup, including the x/y argument swap and index wraparound."""
    n = 200
    x = np.linspace(-10, 10, n)
    y = np.linspace(-10, 10, n)
    lon = np.linspace(-20.0, 20.0, n)

    def ref_lookup(p_ned):
        # generate_current(input_y=p_N, input_x=p_E, input_z=p_D, 0)
        input_y, input_x, input_z = p_ned[0], p_ned[1], p_ned[2]
        ind_x = np.sum(input_x >= lon) - 1
        ind_y = np.sum(input_y >= lon) - 1
        ind_z = np.sum(input_z >= lon) - 1
        i, j, k = ind_x, ind_y, ind_z  # U[ind_x, ind_y, ind_z]
        # U[i,j,k]: X[i,j,k]=x[j], Y[i,j,k]=y[i] ('xy' meshgrid)
        xv, yv = x[j], y[i]
        distance = np.abs(yv - 0.25 * (xv + 4) * (xv - 4))
        direction = np.array([1.0, xv])
        direction = direction / np.linalg.norm(direction)
        k_wrapped = k % n  # numpy negative-index wraparound
        magnitude = min((0.5 + k_wrapped / n) * np.exp(-distance) + 0.3, 1.0)
        return np.array([magnitude * direction[0], magnitude * direction[1], 0.0])

    rng = np.random.default_rng(3)
    pts = np.concatenate(
        [
            rng.uniform(-19, 19, size=(40, 3)),
            np.array([[-25.0, 0.0, 0.0], [25.0, 3.0, -25.0], [0.0, 0.0, 0.0]]),
        ]
    )
    got = np.asarray(tc.grid_current_ned(jnp.asarray(pts)))
    want = np.stack([ref_lookup(p) for p in pts])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_nu_c_from_position_scale():
    p = tc.make_current_params(current_scale=2.0, dtype=jnp.float64)
    att = jnp.zeros(3, dtype=jnp.float64)
    pos = jnp.asarray(np.array([1.0, 2.0, 0.0]))
    nu1 = np.asarray(tc.nu_c_from_position(p, att, pos))
    p1 = tc.make_current_params(current_scale=1.0, dtype=jnp.float64)
    nu0 = np.asarray(tc.nu_c_from_position(p1, att, pos))
    np.testing.assert_allclose(nu1, 2.0 * nu0, atol=1e-12)
    assert nu1.shape == (6,) and np.all(nu1[3:] == 0)


def test_batched_radar_and_current():
    fan = tr.build_radar_fan(dtype=jnp.float64)
    att = jnp.asarray(np.random.default_rng(9).normal(size=(32, 3)) * 0.4)
    rd = tr.ray_directions_ned(fan, att)
    assert rd.shape == (32, 63, 3)
    pos = jnp.asarray(np.random.default_rng(10).uniform(-15, 15, size=(32, 3)))
    cur = tc.grid_current_ned(pos)
    assert cur.shape == (32, 3)
    assert np.all(np.isfinite(np.asarray(cur)))
