"""Batched rigid-body geometry kernels (JAX/XLA).

TPU-native re-design of the reference's scalar NumPy geometry utilities
(reference: gym_dockauv/utils/geomutils.py:4-157 and
python_vehicle_simulator/lib/gnc.py:18-137).  Everything here is written
shape-polymorphic over leading batch dimensions so a single jitted program
serves one env or a sharded batch of millions: angles are `(...,)` arrays,
matrices come back as `(..., 3, 3)` / `(..., 6, 6)`.

All functions are pure and differentiable; no Python branching on values.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "ssa",
    "rzyx",
    "tzyx",
    "kinematic_j",
    "skew",
    "move_to_co",
    "euler_kinematics",
]


def ssa(angle: jnp.ndarray) -> jnp.ndarray:
    """Smallest signed angle, maps to [-pi, pi).

    Matches reference `geomutils.ssa` (geomutils.py:4-11): (a+pi) mod 2pi - pi.
    """
    return (angle + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def rzyx(phi: jnp.ndarray, theta: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
    """ZYX Euler rotation matrix body->NED, shape (..., 3, 3).

    Matches reference `geomutils.Rzyx` (geomutils.py:14-43).
    NOTE: `euler_kinematics` inlines these entries component-form for the
    hot path — keep the two in sync (guarded by
    test_closed_form_force_products_match_matrix_forms).
    """
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)

    r00 = cpsi * cth
    r01 = -spsi * cphi + cpsi * sth * sphi
    r02 = spsi * sphi + cpsi * cphi * sth
    r10 = spsi * cth
    r11 = cpsi * cphi + sphi * sth * spsi
    r12 = -cpsi * sphi + sth * spsi * cphi
    r20 = -sth
    r21 = cth * sphi
    r22 = cth * cphi
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def tzyx(phi: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Euler-rate transformation matrix, shape (..., 3, 3).

    Matches reference `geomutils.Tzyx` (geomutils.py:46-75).  Like the
    reference, singular at theta = +-pi/2 (IEEE inf propagates).
    NOTE: entries are inlined in `euler_kinematics` — keep in sync.
    """
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    cth = jnp.cos(theta)
    tth = jnp.tan(theta)

    one = jnp.ones_like(phi)
    zero = jnp.zeros_like(phi)
    rows = jnp.stack(
        [
            jnp.stack([one, sphi * tth, cphi * tth], axis=-1),
            jnp.stack([zero, cphi, -sphi], axis=-1),
            jnp.stack([zero, sphi / cth, cphi / cth], axis=-1),
        ],
        axis=-2,
    )
    return rows


def kinematic_j(eta: jnp.ndarray) -> jnp.ndarray:
    """6x6 combined kinematic transform J(eta), shape (..., 6, 6).

    Matches reference `geomutils.J` (geomutils.py:78-103).
    """
    phi, theta, psi = eta[..., 3], eta[..., 4], eta[..., 5]
    r = rzyx(phi, theta, psi)
    t = tzyx(phi, theta)
    zero = jnp.zeros_like(r)
    top = jnp.concatenate([r, zero], axis=-1)
    bot = jnp.concatenate([zero, t], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def euler_kinematics(eta: jnp.ndarray, nu: jnp.ndarray) -> jnp.ndarray:
    """eta_dot = [R(Theta) v; T(Theta) w] without materializing J or even
    the 3x3 blocks: fully component-form (the (N,3,3) temporaries tile at
    9/1024 lane utilization on TPU; scalar lanes tile perfectly).  The
    expressions are verbatim the rzyx/tzyx entries, so results match
    `J(eta) @ nu` (auvsim.py:162, gnc.py:123-137) op-for-op.
    """
    phi, theta, psi = eta[..., 3], eta[..., 4], eta[..., 5]
    u, v, w = nu[..., 0], nu[..., 1], nu[..., 2]
    p, q, r = nu[..., 3], nu[..., 4], nu[..., 5]
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    tth = jnp.tan(theta)

    x_dot = cpsi * cth * u + (-spsi * cphi + cpsi * sth * sphi) * v \
        + (spsi * sphi + cpsi * cphi * sth) * w
    y_dot = spsi * cth * u + (cpsi * cphi + sphi * sth * spsi) * v \
        + (-cpsi * sphi + sth * spsi * cphi) * w
    z_dot = -sth * u + cth * sphi * v + cth * cphi * w
    phi_dot = p + sphi * tth * q + cphi * tth * r
    theta_dot = cphi * q - sphi * r
    psi_dot = (sphi / cth) * q + (cphi / cth) * r
    return jnp.stack([x_dot, y_dot, z_dot, phi_dot, theta_dot, psi_dot],
                     axis=-1)


def skew(a: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix S(a), shape (..., 3, 3).

    Matches reference `geomutils.S_skew` (geomutils.py:106-128).
    """
    a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2]
    zero = jnp.zeros_like(a1)
    rows = jnp.stack(
        [
            jnp.stack([zero, -a3, a2], axis=-1),
            jnp.stack([a3, zero, -a1], axis=-1),
            jnp.stack([-a2, a1, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def _h_offset(r: jnp.ndarray) -> jnp.ndarray:
    """6x6 origin-offset transform H(r) (reference geomutils._H:131-143)."""
    i3 = jnp.eye(3, dtype=r.dtype)
    zero = jnp.zeros((3, 3), dtype=r.dtype)
    st = jnp.swapaxes(skew(r), -1, -2)
    top = jnp.concatenate([i3, st], axis=-1)
    bot = jnp.concatenate([zero, i3], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def move_to_co(a_cg: jnp.ndarray, r_g: jnp.ndarray) -> jnp.ndarray:
    """Transform a CG-origin 6x6 matrix to the CO: H^T A H.

    Matches reference `geomutils.move_to_CO` (geomutils.py:146-157).
    """
    h = _h_offset(r_g)
    return jnp.swapaxes(h, -1, -2) @ a_cg @ h
