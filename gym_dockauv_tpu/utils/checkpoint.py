"""Full training-state checkpoint / resume.

The reference can only checkpoint the model: `model.save(...)` every
`timesteps_per_save` (train.py:90-100) and explicitly loses the SAC replay
buffer on resume (train.py:87,97 comments).  Here the checkpoint is the
whole learner state pytree — params, optimizer states, the on-device replay
buffer, every env's `EnvState` (incl. per-env PRNG keys) and the iteration
key — so resume is exact: the next iteration computes what the uninterrupted
run would have.

Format: a pickle of the device_get'd pytree (flax struct dataclasses are
picklable).  `save_checkpoint(algo, dir)` keeps `keep` rolling checkpoints.
"""
from __future__ import annotations

import os
import pickle
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    return jax.device_get(tree)


def _to_device(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, (np.ndarray, np.generic)) else x,
        tree)


def save_checkpoint(algo, directory: str, keep: int = 3) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{algo.num_timesteps:012d}.pkl")
    payload = {
        "algo": type(algo).__name__,
        "num_timesteps": algo.num_timesteps,
        "state": _to_host(algo._state),
        "ep_info_buffer": list(algo.ep_info_buffer),
        "key": _to_host(algo.key),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)  # atomic publish
    for old in sorted(_list_checkpoints(directory))[:-keep]:
        os.remove(os.path.join(directory, old))
    return path


def _list_checkpoints(directory: str):
    return [f for f in os.listdir(directory)
            if re.fullmatch(r"ckpt_\d{12}\.pkl", f)]


def latest_checkpoint(directory: str) -> Optional[str]:
    cks = sorted(_list_checkpoints(directory))
    return os.path.join(directory, cks[-1]) if cks else None


def load_checkpoint(algo, path_or_dir: str):
    """Restore a learner (constructed with the same config/env/n_envs) to
    the exact checkpointed state."""
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        path = latest_checkpoint(path_or_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoints in {path_or_dir}")
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload["algo"] != type(algo).__name__:
        raise ValueError(
            f"checkpoint is for {payload['algo']}, not {type(algo).__name__}")
    algo._state = _to_device(payload["state"])
    algo.num_timesteps = int(payload["num_timesteps"])
    algo.ep_info_buffer.clear()
    algo.ep_info_buffer.extend(payload.get("ep_info_buffer", []))
    algo.key = jnp.asarray(payload["key"])
    return algo
