"""SB3 1.5.0 learning-curve comparison (BASELINE.md "Learning parity").

Drives the VENDORED reference SB3 (/root/reference/stable_baselines3,
torch-cPU) and our TPU-native learners on the same reference task with the
same hyper-parameters (both sides use the SB3 1.5.0 defaults our configs
mirror), recording every finished episode as
(total_env_steps, ep_reward, ep_len, success).  `report` overlays the
curves and writes docs/sb3_comparison.md.

Usage:
  python scripts/sb3_compare.py sb3  --algo ppo --kind Simple --steps 300000 --seed 0
  python scripts/sb3_compare.py ours --algo sac --kind Capsule --steps 150000 --seed 0
  python scripts/sb3_compare.py report

Histories land in docs/sb3/{impl}_{algo}_{kind}_s{seed}.json.
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

KIND_TO_REF = {
    "Simple": "SimpleDocking3d",
    "SimpleCurrent": "SimpleCurrentDocking3d",
    "Capsule": "CapsuleDocking3d",
    "CapsuleCurrent": "CapsuleCurrentDocking3d",
    "Obstacles": "ObstaclesDocking3d",
    # REMUS family (full nonlinear remus100 dynamics, grid current)
    "SimpleRemus": "SimpleDocking3d_remus",
    "ObstaclesCurrentRemus": "ObstaclesCurrentDocking3d_remus",
}


def _out_path(impl, algo, kind, seed):
    return os.path.join(OUT_DIR, f"{impl}_{algo}_{kind}_s{seed}.json")


def _dump(impl, algo, kind, seed, steps, episodes, wall_s, **extra):
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(_out_path(impl, algo, kind, seed), "w") as f:
        json.dump({"impl": impl, "algo": algo, "kind": kind, "seed": seed,
                   "steps": steps, "wall_s": wall_s, **extra,
                   "episodes": episodes}, f)
    print(f"wrote {_out_path(impl, algo, kind, seed)} "
          f"({len(episodes)} episodes, {wall_s:.0f}s)")


# ---------------------------------------------------------------- SB3 side
def run_sb3(algo, kind, steps, seed):
    os.environ.setdefault("TQDM_DISABLE", "1")  # vendored SB3 hardcodes a bar
    import torch

    torch.set_num_threads(2)
    from scripts.sb3_stub import install

    gym = install()
    from tests.reference_oracle import load_reference

    load_reference()
    import copy

    import numpy as np

    if kind.endswith("Remus"):
        import gym_dockauv.envs.docking3d_remus as ref_dock
        from gym_dockauv.config.env_config import (
            TRAIN_CONFIG_remus as REF_TRAIN,
        )
    else:
        import gym_dockauv.envs.docking3d as ref_dock
        from gym_dockauv.config.env_config import TRAIN_CONFIG as REF_TRAIN

    cfg = copy.deepcopy(REF_TRAIN)
    if kind.endswith("Remus"):
        cfg["vehicle"] = "remus100"  # as main_remus.py:50 does
    cfg["save_path_folder"] = os.path.join("/tmp", "sb3_cmp", f"{algo}_{kind}_{seed}")
    os.makedirs(cfg["save_path_folder"], exist_ok=True)
    cfg["verbose"] = 0
    cfg["log_level"] = 50
    cfg["interval_datastorage"] = 10 ** 9
    env = getattr(ref_dock, KIND_TO_REF[kind])(cfg)

    episodes = []

    class Recorder(gym.Wrapper):
        def __init__(self, env):
            super().__init__(env)
            self.t_total = 0
            self.ep_r = 0.0
            self.ep_l = 0

        def reset(self, **kw):
            self.ep_r, self.ep_l = 0.0, 0
            return self.env.reset(**kw)

        def step(self, a):
            obs, r, done, info = self.env.step(a)
            self.t_total += 1
            self.ep_r += float(r)
            self.ep_l += 1
            if done:
                episodes.append([self.t_total, self.ep_r, self.ep_l,
                                 bool(self.env.unwrapped.goal_reached)])
            return obs, r, done, info

    wrapped = Recorder(env)
    from stable_baselines3 import PPO as SB3PPO
    from stable_baselines3 import SAC as SB3SAC

    np.random.seed(seed)
    if algo == "ppo":
        model = SB3PPO("MlpPolicy", wrapped, seed=seed, device="cpu", verbose=0)
    else:
        model = SB3SAC("MlpPolicy", wrapped, seed=seed, device="cpu", verbose=0)
    t0 = time.perf_counter()
    model.learn(total_timesteps=steps)
    _dump("sb3", algo, kind, seed, steps, episodes, time.perf_counter() - t0)


# ------------------------------------------------- SB3 side, vectorized
def run_sb3_vec(algo, kind, steps, seed, n_envs, det_eval=256,
                ckpt_every=500_000, resume=False, impl="sb3"):
    """Reference-recipe SB3 run: SubprocVecEnv(n_envs) + the reference's
    own *_HYPER_PARAMS_TEST dicts (DRL_hyperparams.py:55-106 — exactly
    what main.py/main_remus.py pass to train.train()), periodic model
    checkpoints, per-worker Monitor csvs merged into the episode history,
    and a final deterministic eval with a Wilson interval.

    This is the harness for (a) the flagship plateau bound — does the
    reference's own 16-worker SAC recipe exceed our 0.515 on
    ObstaclesCurrentDocking3d_remus? — and (b) the full-recipe
    learning-curve comparison (main.py:53-63 scale).
    """
    os.environ.setdefault("TQDM_DISABLE", "1")
    import torch

    torch.set_num_threads(2)
    from scripts.sb3_stub import install

    install()
    from tests.reference_oracle import load_reference

    load_reference()
    import copy

    import numpy as np

    remus = kind.endswith("Remus")
    if remus:
        import gym_dockauv.envs.docking3d_remus as ref_dock
        from gym_dockauv.config.env_config import (
            TRAIN_CONFIG_remus as REF_TRAIN,
        )
    else:
        import gym_dockauv.envs.docking3d as ref_dock
        from gym_dockauv.config.env_config import TRAIN_CONFIG as REF_TRAIN
    from gym_dockauv.config.DRL_hyperparams import (
        PPO_HYPER_PARAMS_TEST,
        SAC_HYPER_PARAMS_TEST,
    )

    # persistent (the /tmp checkpoints died with the round-4 machine
    # restart mid-flagship-run; logs/ survives in the repo checkout)
    run_dir = os.path.join(REPO, "logs", "sb3_vec", f"{algo}_{kind}_s{seed}")
    os.makedirs(run_dir, exist_ok=True)
    env_cls = getattr(ref_dock, KIND_TO_REF[kind])

    def make_factory(i):
        def _make():
            cfg = copy.deepcopy(REF_TRAIN)
            if remus:
                cfg["vehicle"] = "remus100"
            cfg["index"] = i  # per-worker episode-file index (train.py:58-71)
            cfg["save_path_folder"] = os.path.join(run_dir, f"env_{i}")
            os.makedirs(cfg["save_path_folder"], exist_ok=True)
            cfg["verbose"] = 0
            cfg["log_level"] = 50
            cfg["interval_datastorage"] = 10 ** 9
            env = env_cls(cfg)
            from stable_baselines3.common.monitor import Monitor

            return Monitor(env, os.path.join(run_dir, f"mon_{i}"),
                           info_keywords=("goal_reached", "collision"))
        return _make

    from stable_baselines3.common.vec_env import SubprocVecEnv

    # fork: children inherit the installed gym/skimage stubs + reference
    # sys.path (forkserver/spawn re-import a bare interpreter)
    venv = SubprocVecEnv([make_factory(i) for i in range(n_envs)],
                         start_method="fork")

    hyper = copy.deepcopy(
        SAC_HYPER_PARAMS_TEST if algo == "sac" else PPO_HYPER_PARAMS_TEST)
    hyper["device"] = "cpu"
    hyper["tensorboard_log"] = None
    hyper["seed"] = seed
    hyper["verbose"] = 0
    np.random.seed(seed)
    from stable_baselines3 import PPO as SB3PPO
    from stable_baselines3 import SAC as SB3SAC

    cls = SB3SAC if algo == "sac" else SB3PPO
    ckpt = os.path.join(run_dir, "ckpt")
    if resume and os.path.exists(ckpt + ".zip"):
        model = cls.load(ckpt, env=venv, device="cpu")
        print(f"resumed from {ckpt}.zip at {model.num_timesteps} steps",
              flush=True)
    else:
        model = cls("MlpPolicy", venv, **hyper)

    def parse_monitors():
        import csv as _csv

        rows = []
        for i in range(n_envs):
            path = os.path.join(run_dir, f"mon_{i}.monitor.csv")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                rdr = _csv.reader(f)
                header = None
                for row in rdr:
                    if row and row[0].startswith("#"):
                        continue
                    if header is None:
                        header = row
                        continue
                    d = dict(zip(header, row))
                    rows.append((float(d["t"]), float(d["r"]),
                                 int(float(d["l"])),
                                 d.get("goal_reached", "False") == "True"))
        rows.sort()
        episodes, tot = [], 0
        for t, r, l, g in rows:
            tot += l
            episodes.append([tot, r, l, g])
        return episodes

    state = {"last_ckpt": model.num_timesteps, "t0": time.perf_counter()}

    def cb(locals_, globals_):
        n = model.num_timesteps
        if n - state["last_ckpt"] >= ckpt_every:
            state["last_ckpt"] = n
            model.save(ckpt)
            eps = parse_monitors()
            _dump(impl, algo, kind, seed, n, eps,
                  time.perf_counter() - state["t0"])
            trail = [e[3] for e in eps[-100:]]
            print(f"[sb3 {algo} {kind} s{seed}] {n} steps, "
                  f"{len(eps)} eps, trail100 success "
                  f"{np.mean(trail) if trail else 0.0:.3f}", flush=True)
        return True

    t0 = state["t0"]
    model.learn(total_timesteps=steps, callback=cb,
                reset_num_timesteps=not resume)
    model.save(ckpt)
    wall = time.perf_counter() - t0
    episodes = parse_monitors()
    venv.close()

    # ---- deterministic eval on a fresh env (true config) ---------------
    det = None
    if det_eval:
        env = make_factory(999)()
        succ = coll = 0
        for ep in range(det_eval):
            obs = env.reset()
            done = False
            while not done:
                a, _ = model.predict(obs, deterministic=True)
                obs, _, done, info = env.step(a)
            succ += bool(info.get("goal_reached"))
            coll += bool(info.get("collision"))
        p = succ / det_eval
        z = 1.96
        den = 1 + z * z / det_eval
        c = (p + z * z / (2 * det_eval)) / den
        half = z * np.sqrt(p * (1 - p) / det_eval
                           + z * z / (4 * det_eval ** 2)) / den
        det = {"episodes": det_eval, "success": p,
               "wilson95": [c - half, c + half],
               "collision": coll / det_eval}
        print(f"[sb3 {algo} {kind} s{seed}] det eval: {det}", flush=True)

    os.makedirs(OUT_DIR, exist_ok=True)
    with open(_out_path(impl, algo, kind, seed), "w") as f:
        json.dump({"impl": impl, "algo": algo, "kind": kind, "seed": seed,
                   "steps": int(model.num_timesteps), "wall_s": wall,
                   "n_envs": n_envs, "hyper": "reference-test",
                   "det_eval": det, "episodes": episodes}, f)
    print(f"wrote {_out_path(impl, algo, kind, seed)} "
          f"({len(episodes)} episodes, {wall:.0f}s)", flush=True)


# --------------------------------------------------------------- our side
# our-side mirror of the reference's *_HYPER_PARAMS_TEST dicts
# (DRL_hyperparams.py:55-106) — the hyper-params main.py/main_remus.py
# actually train with
OURS_TEST_PPO = dict(learning_rate=3e-4, n_steps=2048, batch_size=8192,
                     n_epochs=10, gamma=0.97, gae_lambda=0.90,
                     clip_range=0.2, ent_coef=0.0, vf_coef=0.5,
                     max_grad_norm=0.5)
OURS_TEST_SAC = dict(learning_rate=1.5e-3, buffer_size=50_000,
                     learning_starts=100, batch_size=100, tau=0.005,
                     gamma=0.99, train_freq=1, gradient_steps=1)


def run_ours(algo, kind, steps, seed, platform="cpu", n_envs=1,
             hyper="default", det_eval=0, impl="ours"):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from collections import deque

    from gym_dockauv_tpu.rl import PPO, SAC

    env_id = f"{KIND_TO_REF[kind]}-v0"
    env = env_id
    if kind.endswith("Remus"):
        # mirror the SB3 side's TRAIN_CONFIG_remus (w_velocity etc.)
        from gym_dockauv_tpu.config.env_config import TRAIN_CONFIG_REMUS
        from gym_dockauv_tpu.train import make_gym

        env = make_gym(env_id, TRAIN_CONFIG_REMUS())
    if algo == "ppo":
        kw = dict(OURS_TEST_PPO) if hyper == "test" else {}
        model = PPO(env=env, n_envs=n_envs, seed=seed, **kw)
    else:
        # jit_iters only fuses host dispatches (semantics per cycle are
        # unchanged); n_envs=1 SAC is dispatch-bound on CPU without it
        kw = (dict(OURS_TEST_SAC) if hyper == "test"
              else dict(buffer_size=min(1_000_000, max(steps, 10_000))))
        model = SAC(env=env, n_envs=n_envs, seed=seed, jit_iters=50, **kw)
    model.ep_info_buffer = deque(maxlen=10 ** 9)  # keep the full history
    episodes = []

    class Collector:
        n = 0
        last_print = 0

        def init_callback(self, algo_):
            pass

        def on_step(self, algo_):
            # periodic progress line: long flagship-scale runs are
            # otherwise silent and the tpu_watchdog's no-log-growth
            # heuristic would kill them mid-flight
            if algo_.num_timesteps - self.last_print >= 200_000:
                self.last_print = algo_.num_timesteps
                print(f"[ours {algo} {kind} s{seed}] "
                      f"{algo_.num_timesteps} steps, "
                      f"{len(episodes)} eps", flush=True)
            buf = algo_.ep_info_buffer
            while self.n < len(buf):
                e = buf[self.n]
                episodes.append([algo_.num_timesteps, e["r"], e["l"],
                                 bool(e["goal"])])
                self.n += 1
            return True

    t0 = time.perf_counter()
    model.learn(total_timesteps=steps, callback=Collector(), log_interval=0)
    wall = time.perf_counter() - t0
    det = None
    if det_eval:
        from scripts.scenario_matrix import true_eval

        det = true_eval(model, env_id, n_episodes=det_eval)
        print(f"[ours {algo} {kind} s{seed}] det eval: {det}", flush=True)
    _dump(impl, algo, kind, seed, steps, episodes, wall,
          n_envs=n_envs, hyper=("reference-test" if hyper == "test"
                                else "sb3-default"), det_eval=det)


# ----------------------------------------------------------------- report
def _smooth(episodes, window=100):
    import numpy as np

    if not episodes:
        return np.zeros((0, 3))
    arr = np.asarray(episodes, dtype=np.float64)
    out = []
    for i in range(len(arr)):
        lo = max(0, i - window + 1)
        out.append([arr[i, 0], arr[lo:i + 1, 1].mean(),
                    arr[lo:i + 1, 3].mean()])
    return np.asarray(out)


def report():
    import numpy as np

    runs = []
    for fn in sorted(os.listdir(OUT_DIR)):
        if fn.endswith(".json"):
            with open(os.path.join(OUT_DIR, fn)) as f:
                runs.append(json.load(f))
    if not runs:
        print("no histories in", OUT_DIR)
        return

    flagship = [r for r in runs if r["kind"] == "ObstaclesCurrentRemus"]
    recipe = [r for r in runs
              if r["impl"].endswith("-recipe")
              and r["kind"] != "ObstaclesCurrentRemus"]
    legacy = [r for r in runs
              if r["impl"] in ("sb3", "ours")
              and r["kind"] != "ObstaclesCurrentRemus"]
    pods = [r for r in runs if r["impl"].startswith("ours-16k")]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    palette = {"sb3": "tab:orange", "ours": "tab:blue",
               "sb3-recipe": "tab:orange", "ours-recipe": "tab:blue",
               "ours-16k-sharded": "tab:green"}

    def curves_png(sel, fname, extra=()):
        keys = sorted({(r["algo"], r["kind"]) for r in sel})
        if not keys:
            return None
        fig, axes = plt.subplots(len(keys), 2,
                                 figsize=(11, 3.2 * len(keys)),
                                 squeeze=False)
        for row, (algo, kind) in enumerate(keys):
            ax_r, ax_s = axes[row]
            impls = sorted({r["impl"] for r in sel
                            if r["algo"] == algo and r["kind"] == kind})
            for impl in impls:
                color = palette.get(impl, "tab:red")
                group = [r for r in sel if r["impl"] == impl
                         and r["algo"] == algo and r["kind"] == kind]
                for i, r in enumerate(group):
                    sm = _smooth(r["episodes"])
                    if not len(sm):
                        continue
                    ax_r.plot(sm[:, 0], sm[:, 1], color=color, alpha=0.8,
                              label=impl if i == 0 else None)
                    ax_s.plot(sm[:, 0], sm[:, 2], color=color, alpha=0.8,
                              label=impl if i == 0 else None)
            ax_r.set_title(f"{algo.upper()} {kind}: episode reward")
            ax_s.set_title(f"{algo.upper()} {kind}: success rate")
            logx = any(r["impl"].startswith("ours-16k") for r in sel
                       if r["algo"] == algo and r["kind"] == kind)
            for ax in (ax_r, ax_s):
                ax.set_xlabel("env steps")
                if logx:
                    ax.set_xscale("log")
                ax.legend()
        fig.tight_layout()
        png = os.path.join(REPO, "docs", fname)
        fig.savefig(png, dpi=110)
        plt.close(fig)
        return png

    def table(sel, det_col=False):
        lines = ["| algo | env | impl | seeds | final reward (trail-100) |"
                 " final success" + (" | det-eval success per seed (1024 eps)"
                                     if det_col else "")
                 + " | episodes | wall s |",
                 "|---|---|---|---|---|---|---|---|"
                 + ("---|" if det_col else "")]
        keys = sorted({(r["algo"], r["kind"]) for r in sel})
        for algo, kind in keys:
            impls = sorted({r["impl"] for r in sel
                            if r["algo"] == algo and r["kind"] == kind})
            for impl in impls:
                group = [r for r in sel if r["impl"] == impl
                         and r["algo"] == algo and r["kind"] == kind]
                finals_r, finals_s, dets = [], [], []
                for r in sorted(group, key=lambda r: r["seed"]):
                    sm = _smooth(r["episodes"])
                    if len(sm):
                        finals_r.append(sm[-1, 1])
                        finals_s.append(sm[-1, 2])
                    de = r.get("det_eval")
                    if de:
                        dets.append(de["success"])
                det_s = ((" " + "/".join(f"{d:.2f}" for d in dets) + " |")
                         if dets else " — |") if det_col else ""
                lines.append(
                    f"| {algo} | {kind} | {impl} | "
                    f"{sorted(r['seed'] for r in group)} | "
                    f"{np.mean(finals_r):,.0f} | {np.mean(finals_s):.2f} |"
                    f"{det_s} "
                    f"{int(np.mean([len(r['episodes']) for r in group]))} | "
                    f"{np.mean([r['wall_s'] for r in group]):,.0f} |")
        return lines

    lines = [
        "# SB3 1.5.0 learning-curve comparison",
        "",
        "Vendored reference SB3 (torch-CPU) vs our TPU-native learners on"
        " the reference task, three tiers of evidence (raw histories in"
        " docs/sb3/; regenerate with `python scripts/sb3_compare.py"
        " report`):",
        "",
        "1. **Full recipe** — the reference's own training scale"
        " (main.py:53-63: 1M steps x 8 parallel envs, reference TEST"
        " hyper-parameters) on Simple/Capsule/Obstacles, multiple seeds,"
        " plus a 1024-episode deterministic true-config eval per run.",
        "2. **Flagship bound** — the reference recipe"
        " (main_remus.py:72-81: 16 envs, TEST hypers) run to multi-M"
        " steps on ObstaclesCurrentDocking3d_remus, against our best"
        " policy's matrix row.",
        "3. **Legacy single-lane** — SB3-default hypers, n_envs=1, small"
        " step budgets (the round-2/3 curves, kept for curve-shape"
        " parity).",
        "",
    ]

    if recipe:
        lines += ["## Full-recipe comparison (1M steps x 8 envs, TEST"
                  " hyper-parameters)", ""]
        lines += table(recipe, det_col=True)
        png = curves_png(recipe, "sb3_comparison_recipe.png")
        lines += [
            "", "![recipe curves](sb3_comparison_recipe.png)", "",
            "### Findings (full-recipe tier)", "",
            "- **Simple**: SAC reaches det-eval 1.00 on every seed in both"
            " frameworks.  PPO shows the same *deterministic gap* on both"
            " sides — trailing stochastic success ~1.0 while the"
            " deterministic mean scores 0.4-1.0 (ours) / ~0.83 (sb3):"
            " at ent_coef=0 the Gaussian dither is load-bearing.",
            "- **Capsule**: SAC is bimodal at this recipe in BOTH"
            " frameworks — seeds either lift off toward ~0.7 det or stay"
            " near 0 (see the per-seed column; ours spans 0.00-0.76, the"
            " reference's draw landed 0.72).  PPO fails on all seeds on"
            " both sides.  The scenario needs curriculum training either"
            " way (docs/scenario_matrix.md reaches 0.93 with it).",
            "- **Obstacles**: both frameworks' PPO and SAC fail at this"
            " recipe on every seed (det <=0.05) — matching failure modes;"
            " the matrix rows crack it with curricula.",
            "- **SimpleRemus** (full nonlinear REMUS dynamics): our SAC"
            " at the reference recipe reaches det 0.98 at 2M steps.",
            ""]

    if flagship:
        lines += [
            "## Flagship bound: ObstaclesCurrentDocking3d_remus",
            "",
            "Reference-SB3 runs at the reference's own recipe"
            " (main_remus.py:72-81; its full budget is 10M steps — these"
            " runs bound the first half of it):",
            "",
            "| impl | algo | seed | steps | episodes | trail-500 success |"
            " det-eval success |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in sorted(flagship, key=lambda r: (r["impl"], r["algo"],
                                                 r["seed"])):
            eps = r["episodes"]
            trail = [e[3] for e in eps[-500:]]
            de = r.get("det_eval")
            de_s = f"{de['success']:.3f}" if de else "—"
            lines.append(f"| {r['impl']} | {r['algo']} | {r['seed']} | "
                         f"{r['steps']:,} | {len(eps):,} | "
                         f"{np.mean(trail) if trail else 0.0:.3f} | "
                         f"{de_s} |")
        row_path = os.path.join(REPO, "logs", "matrix",
                                "ObstaclesCurrentDocking3d_remus-v0.json")
        if os.path.exists(row_path):
            with open(row_path) as f:
                ch = json.load(f)["chosen"]
            te = ch["true_eval"]
            lines += [
                "",
                f"Ours (matrix row, `logs/matrix/`): **{te['success']:.3f}**"
                f" [{te['wilson95'][0]:.3f}, {te['wilson95'][1]:.3f}]"
                f" success / {te['collision']:.3f} collision over"
                f" {te['episodes']} true-config episodes"
                f" ({ch['recipe']}, {ch['total_steps'] / 1e9:.2f}B BPTT"
                " env-steps of differentiable-sim training).",
                "",
                "Every model-free run above — reference SB3 AND our own"
                " PPO/SAC at the identical recipe — sits at **0.000**"
                " success: the scenario is beyond model-free RL at these"
                " budgets in either framework (symmetric"
                " parity-of-failure), while our analytic-gradient"
                " machinery (unavailable to a torch+numpy stack: it"
                " differentiates through the vehicle dynamics) holds the"
                " matrix-row score on the true config.  The"
                " matched-ceiling claim in BASELINE.md rests on this"
                " table.",
            ]
        lines += [""]

    if legacy:
        lines += ["## Legacy single-lane comparison (SB3-default hypers,"
                  " n_envs=1)", ""]
        lines += table(legacy + pods)
        curves_png(legacy + pods, "sb3_comparison.png")
        lines += [
            "", "![curves](sb3_comparison.png)", "",
            "### Findings (legacy tier)", "",
            "- **PPO / Simple**: both implementations reach 1.00 success"
            " within 300k steps with matching final rewards — the"
            " learning curves overlap.",
            "- **Capsule (vanilla)**: BOTH implementations fail the same"
            " way at SB3-default settings (success <0.1, reward ~-800):"
            " the docking goal sits on the collision boundary, so the"
            " scenario needs curriculum training in either framework"
            " (docs/performance.md) — matching failure modes are also"
            " parity evidence.",
            "- **SAC / SimpleRemus**: on the full nonlinear REMUS"
            " dynamics both frameworks lift off and converge within the"
            " 500k-step runs (SB3 0.97 success / ours 1.00) — matching"
            " post-takeoff curves on the vehicle family whose dynamics"
            " differ most.",
            "- Wall-clock: ours trains the same 300k-step PPO run in"
            " ~46 s vs SB3's ~1,800 s on the same CPU (39x); the"
            " full-recipe tier above reports measured wall-clock per"
            " run in its table.", ""]
        if pods:
            lines += [
                "- **Pod scale** (BASELINE.json configs[4]): the green"
                " `ours-16k-sharded` curves train 16,384 vectorized envs"
                " sharded over an 8-device mesh"
                " (scripts/pod_scale_demo.py; log-x axes on those"
                " panels).  Final success/reward matches the single-lane"
                " SB3 run — the giant-batch sharded learner reaches the"
                " same policy quality, it just spends more env steps per"
                " update (histories stride-thinned in docs/sb3/pod*.json).",
                ""]

    with open(os.path.join(REPO, "docs", "sb3_comparison.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote docs/sb3_comparison.md")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=("sb3", "ours", "report"))
    ap.add_argument("--algo", choices=("ppo", "sac"), default="ppo")
    ap.add_argument("--kind", default="Simple", choices=tuple(KIND_TO_REF))
    ap.add_argument("--steps", type=int, default=300_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu", choices=("cpu", "tpu"))
    ap.add_argument("--n-envs", type=int, default=1)
    ap.add_argument("--vec", type=int, default=0,
                    help="SB3 side: SubprocVecEnv worker count (reference "
                    "recipe: 8 bluerov / 16 remus) + reference TEST "
                    "hyper-params; 0 = legacy single-env default-hyper run")
    ap.add_argument("--det-eval", type=int, default=256)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--impl", default=None,
                    help="history label override (e.g. sb3-recipe / "
                    "ours-recipe for full-recipe runs, so default-hyper "
                    "histories are not overwritten)")
    ap.add_argument("--hyper", default="default",
                    choices=("default", "test"),
                    help="ours side: 'test' mirrors the reference's "
                    "*_HYPER_PARAMS_TEST dicts (the main.py recipes)")
    args = ap.parse_args()
    if args.mode == "sb3":
        if args.vec:
            run_sb3_vec(args.algo, args.kind, args.steps, args.seed,
                        args.vec, det_eval=args.det_eval,
                        resume=args.resume, impl=args.impl or "sb3")
        else:
            run_sb3(args.algo, args.kind, args.steps, args.seed)
    elif args.mode == "ours":
        run_ours(args.algo, args.kind, args.steps, args.seed,
                 args.platform, args.n_envs, hyper=args.hyper,
                 det_eval=args.det_eval if args.hyper == "test" else 0,
                 impl=args.impl or "ours")
    else:
        report()


if __name__ == "__main__":
    main()
