"""Pod-scale learning demo: 16k vectorized envs sharded over a device mesh.

BASELINE.json configs[4] asks for a "pod-scale PPO+SAC actor-learner: 16k
vectorized envs sharded over N>=2 hosts, learning-curve match vs SB3".  This
script trains PPO (or SAC) on SimpleDocking3d-v0 with the env batch sharded
over the mesh `data` axis (parallel/sharded.py) and records the same
episode-history JSON as scripts/sb3_compare.py, so the report overlays it
against the vendored SB3 1.5.0 curve (docs/sb3/sb3_ppo_Simple_s0.json).

Without real multi-chip hardware the mesh is N virtual CPU devices
(--xla_force_host_platform_device_count); the per-device program and the
psum'd update are identical to what runs on a pod slice, so the learning
trajectory is the transferable part (throughput on 4 CPU cores is not).

Usage:
  python scripts/pod_scale_demo.py --algo ppo --envs 16384 --devices 8 \
      --steps 8000000
The parent re-execs itself with the right XLA flags; results land in
docs/sb3/pod{devices}_{algo}_Simple.json and print a final-vs-SB3 summary.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_DIR = os.path.join(REPO, "docs", "sb3")

# one OS thread per virtual device (see bench_scaling.py: default Eigen
# pools oversubscribe the host and invert scaling)
_CPU_XLA = "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"


def child(args):
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from collections import deque

    from gym_dockauv_tpu.parallel import make_mesh, shard_algorithm
    from gym_dockauv_tpu.rl import PPO, SAC

    n_dev = len(jax.devices())
    assert n_dev == args.devices, (n_dev, args.devices)
    assert args.envs % n_dev == 0
    if args.algo == "ppo":
        # SB3-default loss hyper-params; rollout geometry adapted to the
        # giant batch (16k envs x 16 steps = 262k transitions/iteration)
        model = PPO(env="SimpleDocking3d-v0", n_envs=args.envs, n_steps=16,
                    batch_size=args.envs * 16 // 8, n_epochs=10, seed=0)
    else:
        model = SAC(env="SimpleDocking3d-v0", n_envs=args.envs,
                    buffer_size=1_000_000, learning_starts=100_000,
                    gradient_steps=64, batch_size=256, seed=0)
    shard_algorithm(model, mesh=make_mesh())
    model.ep_info_buffer = deque(maxlen=10 ** 9)
    episodes = []

    class Collector:
        n = 0

        def init_callback(self, algo_):
            pass

        def on_step(self, algo_):
            buf = algo_.ep_info_buffer
            while self.n < len(buf):
                e = buf[self.n]
                episodes.append([algo_.num_timesteps, e["r"], e["l"],
                                 bool(e["goal"])])
                self.n += 1
            return True

    t0 = time.perf_counter()
    model.learn(total_timesteps=args.steps, callback=Collector(),
                log_interval=0)
    wall = time.perf_counter() - t0

    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, f"pod{n_dev}_{args.algo}_Simple.json")
    with open(out, "w") as f:
        json.dump({"impl": f"ours-{args.envs // 1024}k-sharded",
                   "algo": args.algo, "kind": "Simple", "seed": 0,
                   "devices": n_dev, "n_envs": args.envs,
                   "steps": args.steps, "wall_s": wall,
                   "episodes": episodes}, f)

    import numpy as np

    tail = [e for e in episodes[-2000:]]
    suc = float(np.mean([e[3] for e in tail])) if tail else 0.0
    rew = float(np.mean([e[1] for e in tail])) if tail else 0.0
    print(f"POD_DEMO devices={n_dev} envs={args.envs} steps={args.steps} "
          f"episodes={len(episodes)} trail2000 success={suc:.2f} "
          f"reward={rew:.0f} wall={wall:.0f}s", flush=True)
    ref = os.path.join(OUT_DIR, f"sb3_{args.algo}_Simple_s0.json")
    if os.path.exists(ref):
        with open(ref) as f:
            r = json.load(f)
        rt = r["episodes"][-100:]
        print(f"SB3 reference final: success="
              f"{np.mean([e[3] for e in rt]):.2f} "
              f"reward={np.mean([e[1] for e in rt]):.0f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="ppo", choices=("ppo", "sac"))
    ap.add_argument("--envs", type=int, default=16384)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8_000_000)
    ap.add_argument("--platform", default="cpu", choices=("cpu", "tpu"))
    ap.add_argument("--_child", action="store_true")
    args = ap.parse_args()

    if args._child:
        child(args)
        return
    env = dict(os.environ)
    if args.platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.devices} "
            + _CPU_XLA)
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__), "--_child",
               "--algo", args.algo, "--envs", str(args.envs),
               "--devices", str(args.devices), "--steps", str(args.steps),
               "--platform", args.platform], env)


if __name__ == "__main__":
    main()
