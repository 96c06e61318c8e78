"""Attribute the multi-process (Gloo/DCN-path) weak-scaling loss.

SCALING.md measures 0.26-0.55 efficiency at N=2 processes on the 4-core
host.  This script separates the two candidate causes:

  (a) collective cost — Gloo all-reduces on the gradient/metric pmeans
      (would ALSO hurt real DCN deployments, must be engineered away);
  (b) host oversubscription — N interpreters x (compute + dispatch +
      transport threads) on 4 cores (does NOT transfer to real chips,
      where each process owns its host slice).

Experiments
-----------
1. census     — compile the sharded-PPO iteration at N=2 virtual devices
                and count all-reduce ops + payload bytes in the HLO.
2. latency    — microbench a single Gloo pmean at N=2 processes
                (4 B and 1 MB payloads), plus a fused tree-pmean of the
                policy gradient pytree.
3. control    — run the SAME per-shard workload in 2 *independent*
                single-device processes simultaneously (zero collectives,
                identical interpreter/thread footprint) and compare
                aggregate throughput with the N=2 Gloo measurement: any
                gap Gloo-vs-control is collectives; control-vs-2x-ideal
                is oversubscription.

Usage: python scripts/scaling_attribution.py [census|latency|control|all]
Writes the measured breakdown to stdout; fold results into SCALING.md.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ENVS_PER_DEV = 64
N_STEPS = 16
ITERS = 40

_CPU_XLA = ("--xla_cpu_multi_thread_eigen=false "
            "intra_op_parallelism_threads=1")


# ------------------------------------------------------------------ census
def census():
    """Count collectives in the compiled sharded-PPO iteration (N=2)."""
    script = f"""
import sys, re, json
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
from gym_dockauv_tpu.parallel import make_mesh, shard_algorithm
from gym_dockauv_tpu.rl import PPO

E = {ENVS_PER_DEV} * 2
m = PPO(env="SimpleDocking3d-v0", n_envs=E, n_steps={N_STEPS},
        batch_size=E * {N_STEPS} // 4, n_epochs=1, seed=0)
shard_algorithm(m, mesh=make_mesh())
import jax.numpy as jnp
lowered = m._iteration_jit.lower(m._state, jnp.asarray(1.0, jnp.float32))
hlo = lowered.compile().as_text()
lines = [l for l in hlo.splitlines() if "all-reduce(" in l]
payload = 0
for l in lines:
    for dt, shp in re.findall(r"f(\\d+)\\[([0-9,]*)\\]", l.split("all-reduce(")[0]):
        n = 1
        for d in shp.split(","):
            if d:
                n *= int(d)
        payload += n * int(dt) // 8
# All sites except the standalone advantage-moment psum live in the
# minibatch-scan body and execute once per minibatch; trip count is
# n_epochs * (n_steps * n_envs / batch_size)
trips = m.cfg.n_steps * m.n_envs // m.cfg.batch_size * m.cfg.n_epochs
runtime = (len(lines) - 1) * trips + 1
print("CENSUS " + json.dumps({{"all_reduce_sites": len(lines),
                               "minibatch_trips": trips,
                               "runtime_all_reduces": runtime,
                               "payload_bytes": payload}}))
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2 "
               + _CPU_XLA)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("CENSUS ")][0]
    rec = json.loads(line[len("CENSUS "):])
    print(f"census: {rec['all_reduce_sites']} all-reduce sites "
          f"({rec['runtime_all_reduces']} executions / iteration at "
          f"{rec['minibatch_trips']} minibatch trips), "
          f"{rec['payload_bytes'] / 1024:.1f} KiB payload per pass")
    return rec


# ----------------------------------------------------------------- latency
_LATENCY_WORKER = """
import sys, time, json
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from gym_dockauv_tpu.parallel import launch
launch.initialize_distributed()
from gym_dockauv_tpu.parallel import make_mesh
from gym_dockauv_tpu.parallel.sharded import shard_map
from jax.sharding import PartitionSpec as P

mesh = make_mesh()

def timed(x, n=300):
    f = jax.jit(shard_map(lambda v: jax.lax.pmean(v, "data"), mesh,
                          in_specs=P("data"), out_specs=P()))
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        f(x).block_until_ready()
    return (time.perf_counter() - t0) / n

small = jnp.ones((2,), jnp.float32)          # 4 B/shard
big = jnp.ones((2, 262144), jnp.float32)     # 1 MiB/shard
if jax.process_index() == 0:
    print("LATENCY " + json.dumps(
        {{"small_us": timed(small) * 1e6, "big_us": timed(big) * 1e6}}),
        flush=True)
else:
    timed(small), timed(big)
"""


def latency():
    from gym_dockauv_tpu.parallel.launch import spawn_cpu_workers

    results = spawn_cpu_workers(
        _LATENCY_WORKER.format(repo=REPO), n_processes=2,
        devices_per_process=1, timeout=900,
        extra_env={"XLA_FLAGS":
                   "--xla_force_host_platform_device_count=1 " + _CPU_XLA})
    for r in results:
        for line in r.stdout.splitlines():
            if line.startswith("LATENCY "):
                rec = json.loads(line[len("LATENCY "):])
                print(f"latency: pmean 4B {rec['small_us']:.0f} us, "
                      f"1MiB {rec['big_us']:.0f} us  (N=2 procs, Gloo "
                      "over localhost)")
                return rec
    raise RuntimeError("no LATENCY line")


# ----------------------------------------------------------------- control
def _single_device_script():
    return f"""
import sys, time, json
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {REPO!r} + "/.jax_cache")
from gym_dockauv_tpu.rl import PPO

E = {ENVS_PER_DEV}
m = PPO(env="SimpleDocking3d-v0", n_envs=E, n_steps={N_STEPS},
        batch_size=E * {N_STEPS} // 4, n_epochs=1, seed=0)
spi = m._steps_per_iteration
m.learn(total_timesteps=2 * spi)
t0 = time.perf_counter()
m.learn(total_timesteps={ITERS} * spi, reset_num_timesteps=False)
jax.tree_util.tree_leaves(m._state.params)[0].block_until_ready()
dt = time.perf_counter() - t0
print("CTRL " + json.dumps({{"env_steps_per_s": {ITERS} * spi / dt}}))
"""


def control():
    """2 independent 1-device processes (no cluster, no collectives)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1 "
               + _CPU_XLA)
    script = _single_device_script()
    t0 = time.time()
    procs = [subprocess.Popen([sys.executable, "-c", script], env=env,
                              stdout=subprocess.PIPE, text=True)
             for _ in range(2)]
    rates = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-2000:]
        line = [l for l in out.splitlines() if l.startswith("CTRL ")][0]
        rates.append(json.loads(line[len("CTRL "):])["env_steps_per_s"])
    total = sum(rates)
    print(f"control: 2 independent procs aggregate "
          f"{total:,.0f} env-steps/s (per-proc {rates[0]:,.0f} / "
          f"{rates[1]:,.0f}; wall {time.time() - t0:.0f}s)")
    return {"aggregate_steps_per_s": total, "per_proc": rates}


# ----------------------------------------------------------------- wrapper
def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {}
    if what in ("census", "all"):
        out["census"] = census()
    if what in ("latency", "all"):
        out["latency"] = latency()
    if what in ("control", "all"):
        out["control"] = control()
        # reference points from bench_scaling for the same workload
        import types

        import bench_scaling as bs

        args = types.SimpleNamespace(platform="cpu",
                                     envs_per_device=ENVS_PER_DEV,
                                     n_steps=N_STEPS, iters=ITERS)
        r1 = bs.run_single_process(1, args)
        out["single_1dev"] = r1
        print(f"1-proc 1-dev baseline: {r1['env_steps_per_s']:,.0f}")
        rg = bs.run_multiprocess(2, args)
        out["gloo_2proc"] = rg
        print(f"2-proc Gloo sharded:   {rg['env_steps_per_s']:,.0f}")
        ideal = 2 * r1["env_steps_per_s"]
        ctrl = out["control"]["aggregate_steps_per_s"]
        gloo = rg["env_steps_per_s"]
        print(f"\nbreakdown (ideal = 2 x 1-proc = {ideal:,.0f}):")
        print(f"  oversubscription loss (ideal -> control): "
              f"{(1 - ctrl / ideal) * 100:.0f}%")
        print(f"  collective loss     (control -> gloo):    "
              f"{(1 - gloo / ctrl) * 100:.0f}%")
    print("\nATTRIBUTION_JSON " + json.dumps(out))


if __name__ == "__main__":
    main()
