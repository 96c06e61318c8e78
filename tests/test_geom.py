"""Parity tests: geometry kernels vs reference gym_dockauv.utils.geomutils."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_dockauv_tpu.ops import geom
from .reference_oracle import load_reference

load_reference()
from gym_dockauv.utils import geomutils as ref_geom  # noqa: E402

RNG = np.random.default_rng(0)


def test_ssa_parity():
    angles = RNG.uniform(-20, 20, size=(257,))
    np.testing.assert_allclose(
        np.asarray(geom.ssa(jnp.asarray(angles))), ref_geom.ssa(angles), rtol=0, atol=1e-12
    )


def test_ssa_range():
    angles = jnp.linspace(-100, 100, 4097)
    out = np.asarray(geom.ssa(angles))
    assert np.all(out >= -np.pi) and np.all(out < np.pi)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_rzyx_tzyx_j_parity(seed):
    rng = np.random.default_rng(seed)
    for _ in range(20):
        phi, theta, psi = rng.uniform(-np.pi, np.pi, 3) * np.array([1, 0.45, 1])
        np.testing.assert_allclose(
            np.asarray(geom.rzyx(jnp.asarray(phi), jnp.asarray(theta), jnp.asarray(psi))),
            ref_geom.Rzyx(phi, theta, psi),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(geom.tzyx(jnp.asarray(phi), jnp.asarray(theta))),
            ref_geom.Tzyx(phi, theta),
            atol=1e-12,
        )
        eta = rng.uniform(-5, 5, 6)
        eta[3:5] *= 0.2
        np.testing.assert_allclose(
            np.asarray(geom.kinematic_j(jnp.asarray(eta))), ref_geom.J(eta), atol=1e-12
        )


def test_batched_rzyx():
    rng = np.random.default_rng(7)
    angles = rng.uniform(-np.pi, np.pi, size=(64, 3))
    batched = np.asarray(
        geom.rzyx(jnp.asarray(angles[:, 0]), jnp.asarray(angles[:, 1]), jnp.asarray(angles[:, 2]))
    )
    for i in range(64):
        np.testing.assert_allclose(batched[i], ref_geom.Rzyx(*angles[i]), atol=1e-12)


def test_skew_move_to_co_parity():
    rng = np.random.default_rng(11)
    a = rng.normal(size=3)
    np.testing.assert_allclose(np.asarray(geom.skew(jnp.asarray(a))), ref_geom.S_skew(a), atol=1e-12)
    m = rng.normal(size=(6, 6))
    np.testing.assert_allclose(
        np.asarray(geom.move_to_co(jnp.asarray(m), jnp.asarray(a))),
        ref_geom.move_to_CO(m, a),
        atol=1e-12,
    )


def test_euler_kinematics_equals_j_matvec():
    rng = np.random.default_rng(13)
    eta = jnp.asarray(rng.uniform(-3, 3, size=(32, 6)) * np.array([1, 1, 1, 1, 0.4, 1]))
    nu = jnp.asarray(rng.normal(size=(32, 6)))
    direct = geom.euler_kinematics(eta, nu)
    via_j = jnp.einsum("...ij,...j->...i", geom.kinematic_j(eta), nu)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_j), atol=1e-12)


def test_jit_compiles():
    f = jax.jit(lambda e, n: geom.euler_kinematics(e, n))
    out = f(jnp.zeros((4, 6)), jnp.ones((4, 6)))
    assert out.shape == (4, 6)


def test_lowpass_filter_matches_reference():
    """ops.filters vs the reference LowPassFilter (lowpassfilter.py:5-45)."""
    import numpy as np
    import jax.numpy as jnp

    from gym_dockauv_tpu.ops.filters import (
        apply_lowpass,
        apply_lowpass_sequence,
        lowpass_alpha,
    )
    from .reference_oracle import load_reference

    load_reference()
    from gym_dockauv.utils.lowpassfilter import LowPassFilter

    ref = LowPassFilter(T1=0.2, sample_time=0.1)
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(50, 3))
    y = jnp.zeros(3)
    y_ref = np.zeros(3)
    ys = []
    for x in xs:
        y_ref = ref.apply_lowpass(x, y_ref)
        y = apply_lowpass(jnp.asarray(x), y, 0.1, 0.2)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-12)
        ys.append(np.asarray(y))
    np.testing.assert_allclose(float(lowpass_alpha(0.1, 0.2)), ref.alpha,
                               rtol=1e-12)
    # associative-scan sequence form equals the step recurrence
    seq = apply_lowpass_sequence(jnp.asarray(xs), jnp.zeros(3), 0.1, 0.2)
    np.testing.assert_allclose(np.asarray(seq), np.stack(ys), rtol=1e-9)
