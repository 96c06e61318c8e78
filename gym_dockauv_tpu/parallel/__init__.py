"""Device-mesh parallelism.

The reference scales by forking one OS process per env
(stable_baselines3/common/vec_env/subproc_vec_env.py:63-123) and keeps the
learner single-device.  Here the env batch is one sharded pytree on a
`jax.sharding.Mesh`: the leading env axis is split over the `data` axis,
learner params are replicated, and gradient reduction is an XLA `pmean`
riding ICI — no pipes, no pickling, no transport code.  A `model` mesh axis
is part of the mesh layout so tensor-parallel layer sharding stays a config
knob (unused by the parity-scale MLPs).
"""
from .mesh import make_mesh
from .sharded import shard_algorithm

__all__ = ["make_mesh", "shard_algorithm"]
