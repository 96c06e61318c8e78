"""Weak-scaling bench: fixed per-device env batch, growing device count.

Measures sharded-PPO training throughput (env-steps/s, collect + GAE +
minibatch updates in one SPMD program) at device counts 1..N and reports
efficiency(N) = steps_per_s(N) / (N * steps_per_s(1)).  This is the
scale-out proof the reference delegates to its SubprocVecEnv process farm
(stable_baselines3/common/vec_env/subproc_vec_env.py:63-123) — here the
scale axis is mesh devices, not worker processes.

Modes
-----
single-process (default): each measurement runs in a fresh interpreter with
    --xla_force_host_platform_device_count=N virtual CPU devices (or real
    TPU devices with --platform tpu on multi-chip hardware).
--multiprocess: each measurement spawns N one-device worker processes wired
    into one cluster via parallel.launch (Gloo over localhost) — the
    cross-process collective path that rides DCN on a pod.

Usage:  python bench_scaling.py [--devices 1,2,4,8] [--multiprocess]
        [--envs-per-device 64] [--iters 5] [--write-md]
The parent prints one JSON line per measurement plus a summary table.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

_MEASURE = """
import sys, time, json, os
sys.path.insert(0, {repo!r})
import jax
if {pin_cpu!r} == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {repo!r} + "/.jax_cache")
{init}
from gym_dockauv_tpu.parallel import make_mesh, shard_algorithm
from gym_dockauv_tpu.rl import PPO

n_dev = len(jax.devices())
assert n_dev == {devices}, (n_dev, {devices})
E = {envs_per_device} * n_dev
m = PPO(env="SimpleDocking3d-v0", n_envs=E, n_steps={n_steps},
        batch_size=E * {n_steps} // 4, n_epochs=1, seed=0)
shard_algorithm(m, mesh=make_mesh())
spi = m._steps_per_iteration
m.learn(total_timesteps=2 * spi)          # compile + warmup
import os as _os
t0 = time.perf_counter()
c0 = _os.times()
m.learn(total_timesteps={iters} * spi, reset_num_timesteps=False)
jax.tree_util.tree_leaves(m._state.params)[0].block_until_ready()
dt = time.perf_counter() - t0
c1 = _os.times()
# busy cores this process burned during the measurement (compute +
# dispatch + any spinning collective threads) — the attribution signal
# for coupled-vs-independent CPU cost on a core-limited rig
cpu_util = (c1.user - c0.user + c1.system - c0.system) / dt
if jax.process_index() == 0:
    print("BENCH_JSON " + json.dumps(
        {{"devices": n_dev, "env_steps_per_s": {iters} * spi / dt,
          "envs_per_device": {envs_per_device}, "iters": {iters},
          "cpu_util": round(cpu_util, 3),
          "processes": jax.process_count()}}), flush=True)
"""


def _script(devices, envs_per_device, n_steps, iters, platform, init=""):
    return _MEASURE.format(repo=REPO, devices=devices,
                           envs_per_device=envs_per_device, n_steps=n_steps,
                           iters=iters, pin_cpu=platform, init=init)


# One OS thread per virtual CPU device: the default per-device Eigen pools
# oversubscribe the host (N devices x ncpu threads) and swamp the tiny
# per-step ops — measured 4x slower at N=1 and inverted scaling.
_CPU_XLA = ("--xla_cpu_multi_thread_eigen=false "
            "intra_op_parallelism_threads=1")


def run_single_process(n, args):
    env = dict(os.environ)
    if args.platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n} "
                            + _CPU_XLA)
    r = subprocess.run(
        [sys.executable, "-c",
         _script(n, args.envs_per_device, args.n_steps, args.iters,
                 args.platform)],
        env=env, capture_output=True, text=True, timeout=900)
    if r.returncode != 0:
        raise RuntimeError(f"measurement devices={n} failed:\n{r.stderr[-3000:]}")
    return _parse(r.stdout)


def run_multiprocess(n, args):
    from gym_dockauv_tpu.parallel.launch import spawn_cpu_workers

    init = ("from gym_dockauv_tpu.parallel import launch\n"
            "launch.initialize_distributed()")
    script = _script(n, args.envs_per_device, args.n_steps, args.iters,
                     "cpu", init=init)
    cpu_pin = None
    if args.pin_cores:
        # constant per-process core budget across rows (the pod topology:
        # one process per host, each owning its cores).  Unpinned, every
        # XLA CPU process burns ~2.2 cores in runtime helper threads
        # (measured via os.times cpu_util), so 2 coupled processes
        # oversubscribe a 4-core host and the measurement reads as a fake
        # collective-path loss.
        b = args.pin_cores
        cpu_pin = [f"{i * b}-{(i + 1) * b - 1}" for i in range(n)]
    results = spawn_cpu_workers(
        script, n_processes=n, devices_per_process=1, timeout=900,
        cpu_pin=cpu_pin,
        extra_env={"XLA_FLAGS":
                   "--xla_force_host_platform_device_count=1 " + _CPU_XLA})
    for r in results:
        if "BENCH_JSON" in r.stdout:
            return _parse(r.stdout)
    raise RuntimeError("no measurement line from any worker")


def _parse(stdout):
    for line in stdout.splitlines():
        if line.startswith("BENCH_JSON "):
            return json.loads(line[len("BENCH_JSON "):])
    raise RuntimeError(f"no BENCH_JSON in output:\n{stdout[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--multiprocess", action="store_true")
    ap.add_argument("--envs-per-device", type=int, default=64)
    ap.add_argument("--n-steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform", default="cpu", choices=("cpu", "tpu"))
    ap.add_argument("--pin-cores", type=int, default=0,
                    help="multiprocess: taskset each worker to this many "
                    "dedicated cores (constant per-process budget across "
                    "rows — fair weak scaling on a shared host)")
    ap.add_argument("--write-md", action="store_true")
    args = ap.parse_args()

    counts = [int(x) for x in args.devices.split(",")]
    rows = []
    for n in counts:
        rec = (run_multiprocess if args.multiprocess
               else run_single_process)(n, args)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    base = rows[0]["env_steps_per_s"] / rows[0]["devices"]
    ncpu = os.cpu_count()
    print(f"\nweak scaling ({'multi-process' if args.multiprocess else 'single-process'},"
          f" {args.platform}, host cores={ncpu},"
          f" {args.envs_per_device} envs/device):")
    print("| devices | procs | env-steps/s | efficiency |")
    print("|---|---|---|---|")
    lines = []
    for r in rows:
        eff = r["env_steps_per_s"] / (r["devices"] * base)
        note = " (oversubscribed)" if args.platform == "cpu" and \
            r["devices"] > ncpu else ""
        lines.append(f"| {r['devices']} | {r['processes']} | "
                     f"{r['env_steps_per_s']:,.0f} | {eff:.2f}{note} |")
        r["efficiency"] = eff
    print("\n".join(lines))

    if args.write_md:
        mode = "multi-process" if args.multiprocess else "single-process"
        with open(os.path.join(REPO, "SCALING.md"), "a") as f:
            f.write(f"\n## {mode}, {args.platform}, host cores={ncpu}, "
                    f"{args.envs_per_device} envs/device\n\n"
                    "| devices | procs | env-steps/s | efficiency |\n"
                    "|---|---|---|---|\n" + "\n".join(lines) + "\n")
    return rows


if __name__ == "__main__":
    main()
