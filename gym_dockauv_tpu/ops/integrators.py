"""Fixed-step ODE integrators as pure JAX functions.

The reference advances the BlueROV2/LAUV plant with one fixed-step
Runge-Kutta-Fehlberg 4(5) step per 0.1 s control tick (reference:
gym_dockauv/utils/odesolver45.py:5-28, used at auvsim.py:100) and the REMUS
plant with forward-Euler substeps (remus100.py:472-476).  Here both are
expressed as jit/vmap-friendly combinators over an arbitrary RHS; the RHS is
evaluated on whole batched state pytrees so the six RK stages become six
fused XLA kernels regardless of batch size.
"""
from __future__ import annotations

from typing import Callable, Tuple, TypeVar

import jax
import jax.numpy as jnp

Y = TypeVar("Y")

# Classic Fehlberg 4(5) tableau (same coefficients as reference
# odesolver45.py:18-27).
_A21 = 1.0 / 4.0
_A31, _A32 = 3.0 / 32.0, 9.0 / 32.0
_A41, _A42, _A43 = 1932.0 / 2197.0, -7200.0 / 2197.0, 7296.0 / 2197.0
_A51, _A52, _A53, _A54 = 439.0 / 216.0, -8.0, 3680.0 / 513.0, -845.0 / 4104.0
_A61, _A62, _A63, _A64, _A65 = (
    -8.0 / 27.0,
    2.0,
    -3544.0 / 2565.0,
    1859.0 / 4104.0,
    -11.0 / 40.0,
)
_B4 = (25.0 / 216.0, 0.0, 1408.0 / 2565.0, 2197.0 / 4104.0, -1.0 / 5.0)
_B5 = (
    16.0 / 135.0,
    0.0,
    6656.0 / 12825.0,
    28561.0 / 56430.0,
    -9.0 / 50.0,
    2.0 / 55.0,
)


def rkf45_step(
    f: Callable[[jnp.ndarray], jnp.ndarray], y: jnp.ndarray, h: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One Runge-Kutta-Fehlberg step; returns (4th-order, 5th-order) results.

    Operation ordering matches the reference solver exactly so trajectories
    agree bit-for-bit in float64 (odesolver45.py:18-27: stage combinations
    are formed as `y + c1*h*s1/d1 + ...` with h multiplied per term).

    ``f`` is a time-invariant RHS ``f(y) -> dy`` (the reference passes a dummy
    ``t``; all its RHSs ignore it).
    """
    s1 = f(y)
    s2 = f(y + h * s1 / 4.0)
    s3 = f(y + 3.0 * h * s1 / 32.0 + 9.0 * h * s2 / 32.0)
    s4 = f(
        y
        + 1932.0 * h * s1 / 2197.0
        - 7200.0 * h * s2 / 2197.0
        + 7296.0 * h * s3 / 2197.0
    )
    s5 = f(
        y
        + 439.0 * h * s1 / 216.0
        - 8.0 * h * s2
        + 3680.0 * h * s3 / 513.0
        - 845.0 * h * s4 / 4104.0
    )
    s6 = f(
        y
        - 8.0 * h * s1 / 27.0
        + 2.0 * h * s2
        - 3544.0 * h * s3 / 2565.0
        + 1859.0 * h * s4 / 4104.0
        - 11.0 * h * s5 / 40.0
    )
    w = y + h * (
        25.0 * s1 / 216.0
        + 1408.0 * s3 / 2565.0
        + 2197.0 * s4 / 4104.0
        - s5 / 5.0
    )
    q = y + h * (
        16.0 * s1 / 135.0
        + 6656.0 * s3 / 12825.0
        + 28561.0 * s4 / 56430.0
        - 9.0 * s5 / 50.0
        + 2.0 * s6 / 55.0
    )
    return w, q


def euler_substeps(
    f: Callable[[Y], Y],
    y0: Y,
    n_steps: int,
    dt: float,
) -> Y:
    """n fixed forward-Euler substeps of an arbitrary state pytree.

    ``f`` maps state -> state (one Euler update already applied inside, since
    the REMUS plant interleaves saturation/actuator updates with integration;
    see remus100.py:301-308,472-476).  Unrolled via ``lax.scan`` so the
    compiled program is O(1) in ``n_steps``.
    """

    def body(y, _):
        return f(y), None

    yf, _ = jax.lax.scan(body, y0, None, length=n_steps)
    return yf
