"""Shard a learner over a device mesh (data-parallel SPMD).

Replaces the reference's SubprocVecEnv process farm + single-device learner
(SURVEY.md §2d): the env batch axis is split over the mesh `data` axis, each
device steps its env shard and computes gradients on its local experience,
and `lax.pmean` (inserted by the learners when `axis_name` is set) reduces
gradients over ICI so every replica applies the identical update.

Minibatch composition note: sharded PPO shuffles within each device's shard
(global batch = concat of per-device sub-batches); gradient pmean makes the
update the exact mean over the global minibatch, and advantage
normalization uses pmean'd GLOBAL moments (PPO._normalize_advantages) —
so the update equals the unsharded one up to the partition of samples into
minibatches (the only remaining deviation from SB3 ppo.py:204-265).
Off-policy logged metrics are also pmean'd (OffPolicyAlgorithm._cycle), so
train/* values are global means, not one device's locals.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh

def _resolve_shard_map():
    """Top-level jax.shard_map when present (kwarg name changed from
    check_rep to check_vma across versions — pick by signature), else the
    jax.experimental fallback."""
    import inspect

    fn = getattr(jax, "shard_map", None)
    if fn is None:
        from jax.experimental.shard_map import shard_map as fn  # type: ignore
    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        params = {}
    kw = "check_vma" if "check_vma" in params else "check_rep"

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return fn(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  **{kw: check_rep})

    return shard_map


shard_map = _resolve_shard_map()


# State fields sharded along the env axis; everything else is replicated.
_ENV_AXIS_FIELDS = ("env_states", "last_obs")
_REPLAY_FIELDS = ("replay",)


def state_partition_specs(state, axis_name: str = "data"):
    """Pytree of PartitionSpecs matching an algorithm state: env-batch
    leaves sharded on their env axis, replay on axis 1, rest replicated."""
    out = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if f.name in _ENV_AXIS_FIELDS:
            spec = jax.tree_util.tree_map(lambda _: P(axis_name), v)
        elif f.name in _REPLAY_FIELDS:
            spec = jax.tree_util.tree_map(
                lambda x: P(None, axis_name) if getattr(x, "ndim", 0) >= 2
                else P(), v)
        else:
            spec = jax.tree_util.tree_map(lambda _: P(), v)
        out[f.name] = spec
    return type(state)(**out)


def shard_algorithm(algo, mesh: Optional[jax.sharding.Mesh] = None,
                    n_devices: Optional[int] = None, axis_name: str = "data"):
    """Turn a constructed learner into a mesh-sharded one, in place.

    After this, `algo.learn(...)` runs every iteration as one SPMD program
    over the mesh.  Requires n_envs and the (PPO/off-policy) batch size to be
    divisible by the data-axis size.
    """
    if mesh is None:
        mesh = make_mesh(n_devices)
    assert axis_name in mesh.axis_names, (axis_name, mesh.axis_names)
    n_data = mesh.shape[axis_name]
    assert algo.n_envs % n_data == 0, (
        f"n_envs={algo.n_envs} not divisible by data axis {n_data}")

    algo.axis_name = axis_name
    specs = state_partition_specs(algo._state, axis_name)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
    algo._state = jax.device_put(algo._state, shardings)

    fn = shard_map(
        algo._iteration, mesh,
        in_specs=(specs, P()),
        # (state, metrics dict, EpisodeStats(T, N_local)) — single-spec
        # prefixes cover the dict/stats subtrees
        out_specs=(specs, P(), P(None, axis_name)),
        check_rep=False)
    algo._iteration_jit = jax.jit(fn)
    algo._mesh = mesh
    return algo
