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
    """eta_dot = [R(Theta) v; T(Theta) w] without materializing the 6x6 J.

    Cheaper form of J(eta) @ nu used on the hot path (two 3x3 matvecs).
    Equivalent to reference `geom.J(eta).dot(nu)` (auvsim.py:162) and
    `gnc.attitudeEuler`'s RHS (gnc.py:123-137).
    """
    phi, theta, psi = eta[..., 3], eta[..., 4], eta[..., 5]
    r = rzyx(phi, theta, psi)
    t = tzyx(phi, theta)
    p_dot = jnp.einsum("...ij,...j->...i", r, nu[..., 0:3])
    th_dot = jnp.einsum("...ij,...j->...i", t, nu[..., 3:6])
    return jnp.concatenate([p_dot, th_dot], axis=-1)


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
