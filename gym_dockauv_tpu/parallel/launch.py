"""Multi-process / multi-host launch wiring.

This is the TPU-native replacement for the reference's process-farm
scale-out (stable_baselines3/common/vec_env/subproc_vec_env.py:63-123):
instead of N worker processes shipping observations to a single learner
over pipes, every process owns a shard of the env batch and runs the SAME
SPMD training program; XLA collectives (pmean over the mesh `data` axis)
reduce gradients over ICI within a host/slice and DCN across them.  There
is no learner/actor asymmetry and no host-side transport layer to write —
`jax.distributed.initialize` + a global mesh is the whole launch story.

Usage on a TPU pod (one process per host, args auto-detected from the TPU
metadata service):

    from gym_dockauv_tpu.parallel import launch, make_mesh, shard_algorithm
    launch.initialize_distributed()          # no-op on a single process
    algo = PPO(env=..., n_envs=per_host * launch.num_processes(), ...)
    shard_algorithm(algo, mesh=make_mesh())  # mesh spans all hosts
    algo.learn(...)                          # identical SPMD loop everywhere

On a CPU/GPU cluster (or the local multi-process test rig) pass the
coordinator explicitly or set GDT_COORDINATOR / GDT_NUM_PROCESSES /
GDT_PROCESS_ID.  Logging/checkpoint side effects should usually be gated on
`is_coordinator()`; episode stats absorbed by the learn loop are per-process
(each process sees its local env lanes).
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import Dict, List, Optional, Sequence

_ENV_COORD = "GDT_COORDINATOR"
_ENV_NPROC = "GDT_NUM_PROCESSES"
_ENV_PID = "GDT_PROCESS_ID"

_initialized = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids: Optional[Sequence[int]] = None,
                           ) -> bool:
    """Wire this process into the global JAX runtime.

    Resolution order: explicit args > GDT_* env vars > TPU-pod
    auto-detection (bare ``jax.distributed.initialize()``) when running on
    the TPU platform.  Returns True when a multi-process runtime was
    initialized, False for the single-process fallback.  Idempotent.
    """
    global _initialized
    import jax

    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get(_ENV_NPROC):
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and os.environ.get(_ENV_PID):
        process_id = int(os.environ[_ENV_PID])

    if coordinator_address is not None:
        assert num_processes is not None and process_id is not None, (
            "coordinator given but num_processes/process_id missing "
            f"(set {_ENV_NPROC}/{_ENV_PID})")
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            local_device_ids=local_device_ids)
        _initialized = True
        return True

    # TPU pods self-describe through the metadata service: a bare
    # initialize() is the whole launch step there.
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if "tpu" in platforms.split(","):
        jax.distributed.initialize()
        _initialized = True
        return True
    return False


def num_processes() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_coordinator() -> bool:
    """Gate file-writing side effects (logger dirs, checkpoints, plots) on
    this in multi-process runs."""
    return process_index() == 0


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def spawn_cpu_workers(script: str, n_processes: int,
                      devices_per_process: int = 1,
                      port: Optional[int] = None,
                      extra_env: Optional[Dict[str, str]] = None,
                      timeout: float = 600.0,
                      cpu_pin: Optional[List[str]] = None,
                      ) -> List[subprocess.CompletedProcess]:
    """Run `script` (python source text) in n_processes fresh interpreters
    wired into one multi-process CPU cluster (Gloo collectives).

    Each worker gets JAX pinned to CPU with `devices_per_process` virtual
    devices and the GDT_* coordinator env vars set, so the script just
    calls ``launch.initialize_distributed()`` and sees
    n_processes*devices_per_process global devices.  This is the local
    proving rig for the multi-host path: the same collectives that ride
    DCN on a pod run over localhost here.  Returns the completed
    processes (raises on any non-zero exit, with captured output).
    """
    port = port or free_port()
    procs = []
    for pid in range(n_processes):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS":
                f"--xla_force_host_platform_device_count={devices_per_process}",
            _ENV_COORD: f"127.0.0.1:{port}",
            _ENV_NPROC: str(n_processes),
            _ENV_PID: str(pid),
            # each worker compiles its own executable; share the repo cache
            "JAX_COMPILATION_CACHE_DIR":
                os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/repo/.jax_cache"),
        })
        if extra_env:
            env.update(extra_env)
        # optional per-worker core pinning: on a core-limited shared host
        # the XLA CPU runtime's helper threads burn ~2.2 cores/process
        # unconstrained (measured, SCALING.md), so fair weak-scaling
        # measurements must hold the per-process core budget constant —
        # which is the real pod topology (one process per host)
        argv = [sys.executable, "-c", script]
        if cpu_pin is not None:
            argv = ["taskset", "-c", cpu_pin[pid]] + argv
        procs.append(subprocess.Popen(
            argv, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    done = []
    try:
        for pid, p in enumerate(procs):
            out, err = p.communicate(timeout=timeout)
            done.append(subprocess.CompletedProcess(p.args, p.returncode,
                                                    out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, r in enumerate(done):
        if r.returncode != 0:
            raise RuntimeError(
                f"worker {pid} exited {r.returncode}\n--- stdout ---\n"
                f"{r.stdout}\n--- stderr ---\n{r.stderr[-4000:]}")
    return done
