"""Multi-process launch tests: the local proving rig for the multi-host
path (SURVEY.md §2d "distributed comm backend").

Workers are fresh interpreters wired into one CPU cluster through
parallel.launch (Gloo collectives over localhost — the same XLA collective
path that rides DCN on a TPU pod)."""
import json

import numpy as np
import pytest

from gym_dockauv_tpu.parallel.launch import spawn_cpu_workers

_COMMON = """
import sys; sys.path.insert(0, "/root/repo")
import jax
# the image's axon TPU plugin can win platform resolution over the env var:
# pin CPU BEFORE initializing the distributed runtime
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from gym_dockauv_tpu.parallel import launch
assert launch.initialize_distributed(), "expected multi-process init"
"""


def test_multiprocess_psum_across_processes():
    script = _COMMON + """
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P, NamedSharding
from gym_dockauv_tpu.parallel import make_mesh
from gym_dockauv_tpu.parallel.sharded import shard_map

assert jax.process_count() == 2
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2
mesh = make_mesh(axis_names=("data",))
x = jnp.arange(4, dtype=jnp.float32)
fn = jax.jit(shard_map(lambda v: jax.lax.psum(v, "data"), mesh,
                       in_specs=(P("data"),), out_specs=P()))
xs = jax.device_put(x, NamedSharding(mesh, P("data")))
out = np.asarray(jax.device_get(fn(xs)))
print("PSUM_RESULT", float(out[0]), flush=True)
"""
    results = spawn_cpu_workers(script, n_processes=2, devices_per_process=2,
                                timeout=180)
    for r in results:
        assert "PSUM_RESULT 6.0" in r.stdout


def test_multiprocess_sharded_ppo_replicas_agree():
    """Same SPMD program on 2 processes x 2 devices: after 2 train
    iterations every process must hold identical replicated params, and
    per-process episode-stat absorption must see only local lanes."""
    script = _COMMON + """
import numpy as np
from gym_dockauv_tpu.parallel import make_mesh, shard_algorithm
from gym_dockauv_tpu.rl import PPO

m = PPO(env="SimpleDocking3d-v0", n_envs=8, n_steps=8, batch_size=16,
        n_epochs=2, seed=11)
mesh = make_mesh()  # spans both processes: 4 global devices
assert mesh.size == 4
shard_algorithm(m, mesh=mesh)
m.learn(total_timesteps=128)
leaves = jax.tree_util.tree_leaves(m._state.params)
local = [np.asarray(l.addressable_shards[0].data) for l in leaves]
assert all(np.all(np.isfinite(x)) for x in local)
checksum = float(sum(np.abs(x).sum() for x in local))
print("PARAM_CHECKSUM", repr(checksum), flush=True)
print("EP_BUFFER_LANES_OK", all(
    isinstance(e["r"], float) for e in m.ep_info_buffer), flush=True)
"""
    results = spawn_cpu_workers(script, n_processes=2, devices_per_process=2,
                                timeout=300)
    sums = []
    for r in results:
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("PARAM_CHECKSUM")][0]
        sums.append(float(line.split()[1]))
    assert sums[0] == sums[1], f"replica divergence across processes: {sums}"


def test_spawn_worker_failure_is_reported():
    with pytest.raises(RuntimeError, match="worker .* exited"):
        spawn_cpu_workers(_COMMON + "\nraise SystemExit(3)\n",
                          n_processes=2, devices_per_process=1, timeout=120)


def test_weak_scaling_efficiency_two_devices():
    """BASELINE target: >=0.8 weak-scaling efficiency.  Measured on the
    virtual rig at N=2 — the only count where the 4-core host still has
    cores to spare for runtime threads (see SCALING.md).  Gated on the
    MEDIAN of 3 attempts: best-of-N on a noisy timing measure lets a
    marginally-regressed system pass on its luckiest run.  Skipped when
    the host is already loaded (the measurement needs idle cores; under
    concurrent jobs it reports the scheduler, not the framework)."""
    import os
    import types

    import bench_scaling as bs

    load = os.getloadavg()[0]
    if load > os.cpu_count() / 2:
        pytest.skip(f"host loadavg {load:.1f} too high for a timing test")

    args = types.SimpleNamespace(platform="cpu", envs_per_device=64,
                                 n_steps=16, iters=40)
    effs = []
    for attempt in range(3):
        r1 = bs.run_single_process(1, args)
        r2 = bs.run_single_process(2, args)
        effs.append(r2["env_steps_per_s"] / (2 * r1["env_steps_per_s"]))
    median = sorted(effs)[1]
    assert median >= 0.8, f"median weak-scaling efficiency {median:.3f} " \
        f"< 0.8 (attempts: {[round(e, 3) for e in effs]})"
