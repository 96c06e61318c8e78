"""Mesh construction helpers."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data", "model"),
              model_parallel: int = 1,
              devices=None) -> jax.sharding.Mesh:
    """Build a (data, model) mesh.

    `model_parallel` defaults to 1: the parity-scale policies are tiny MLPs
    (SURVEY.md §2d), so all devices go to the env/data axis; the model axis
    exists so wide-layer tensor parallelism is a config change, not a
    redesign.  For multi-host, call `jax.distributed.initialize()` first and
    pass `devices=jax.devices()` — the same mesh spans hosts, with XLA
    routing data-axis collectives over ICI and cross-slice traffic over DCN.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    if len(axis_names) == 1:
        assert model_parallel == 1, "model_parallel needs a model axis"
        arr = np.asarray(devices)
    else:
        arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return jax.sharding.Mesh(arr, tuple(axis_names))
