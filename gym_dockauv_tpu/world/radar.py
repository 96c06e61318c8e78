"""Radar (ray-fan) sensor: static fan precompute + batched pose update.

Re-design of the reference's `Radar` class (gym_dockauv/objects/sensor.py:
9-145).  The fan geometry is static per configuration, so it is precomputed
once on host into a `RadarFan` pytree; per-step work is a single batched
rotation of the (n_rays, 3) direction block — on TPU this is one fused
(batch, 3, 3) x (3, n_rays) contraction feeding straight into the ray
kernels, with no per-ray Python anywhere.

Default config (env_config.py:91-98): alpha=60deg, beta=80deg, 10deg pitch
-> 7 vertical x 9 horizontal = 63 rays, max-pooled 2x2 -> 20 observation rays.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..ops import geom
from ..ops.rays import maxpool_2x2_pad0


@struct.dataclass
class RadarFan:
    """Static ray-fan description (device constants)."""

    rd_b: jnp.ndarray  # (n_rays, 3) unit directions in body frame
    alpha: jnp.ndarray  # (n_rays,) per-ray vertical angle
    beta: jnp.ndarray  # (n_rays,) per-ray horizontal angle
    alpha_max: jnp.ndarray  # scalar
    beta_max: jnp.ndarray  # scalar
    max_dist: jnp.ndarray  # scalar
    n_vertical: int = struct.field(pytree_node=False)
    n_horizontal: int = struct.field(pytree_node=False)
    blocksize_reduce: int = struct.field(pytree_node=False)

    @property
    def n_rays(self) -> int:
        return self.n_vertical * self.n_horizontal

    @property
    def n_rays_reduced(self) -> int:
        bs = self.blocksize_reduce
        return -(-self.n_vertical // bs) * -(-self.n_horizontal // bs)


def build_radar_fan(
    alpha: float = 60 * np.pi / 180,
    beta: float = 80 * np.pi / 180,
    ray_per_deg: float = 10 * np.pi / 180,
    max_dist: float = 10.0,
    blocksize_reduce: int = 2,
    freq: float = 1.0,  # accepted for config parity; updates are per-step
    dtype=jnp.float32,
) -> RadarFan:
    """Precompute the fan; validates divisibility like sensor.py:49-52.

    Ray directions are [1, sin(beta_i), sin(alpha_i)] normalized
    (sensor.py:66-71); alpha varies slowest (row), beta fastest (column),
    i.e. the (n_vertical, n_horizontal) grid layout of intersec_dist2d.
    """
    del freq
    tol = 10e-8
    if (alpha + tol) % ray_per_deg > 0.001 or (beta + tol) % ray_per_deg > 0.001:
        raise KeyError("ray_per_deg must evenly divide alpha and beta.")
    alphas_1d = np.arange(-alpha / 2, alpha / 2 + tol, ray_per_deg)
    betas_1d = np.arange(-beta / 2, beta / 2 + tol, ray_per_deg)
    n_v, n_h = len(alphas_1d), len(betas_1d)
    alphas = np.repeat(alphas_1d, n_h)
    betas = np.tile(betas_1d, n_v)
    rd = np.stack([np.ones(n_v * n_h), np.sin(betas), np.sin(alphas)], axis=1)
    rd = rd / np.linalg.norm(rd, axis=1, keepdims=True)
    return RadarFan(
        rd_b=jnp.asarray(rd, dtype=dtype),
        alpha=jnp.asarray(alphas, dtype=dtype),
        beta=jnp.asarray(betas, dtype=dtype),
        alpha_max=jnp.asarray(alpha / 2, dtype=dtype),
        beta_max=jnp.asarray(beta / 2, dtype=dtype),
        max_dist=jnp.asarray(max_dist, dtype=dtype),
        n_vertical=n_v,
        n_horizontal=n_h,
        blocksize_reduce=blocksize_reduce,
    )


def ray_directions_ned(fan: RadarFan, attitude: jnp.ndarray) -> jnp.ndarray:
    """Rotate the body-frame fan into NED for a pose batch.

    attitude (..., 3) -> (..., n_rays, 3).  Matches Radar.update
    (sensor.py:90-102) including the (redundant) re-normalization.
    """
    r = geom.rzyx(attitude[..., 0], attitude[..., 1], attitude[..., 2])
    rd_n = jnp.einsum("...ij,rj->...ri", r, fan.rd_b)
    return rd_n / jnp.linalg.norm(rd_n, axis=-1, keepdims=True)


def clamp_intersections(fan: RadarFan, dist: jnp.ndarray) -> jnp.ndarray:
    """Replace negative / beyond-range hits with max_dist (sensor.py:104-118)."""
    bad = (dist < 0.0) | (dist > fan.max_dist)
    return jnp.where(bad, fan.max_dist, dist)


def reduced_observation(fan: RadarFan, dist_clamped: jnp.ndarray) -> jnp.ndarray:
    """2x2 max-pooled ray distances (sensor.py:131-137): (..., n_rays) ->
    (..., n_rays_reduced)."""
    grid = dist_clamped.reshape(
        *dist_clamped.shape[:-1], fan.n_vertical, fan.n_horizontal
    )
    return maxpool_2x2_pad0(grid, fan.blocksize_reduce)
