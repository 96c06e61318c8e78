"""Generate SB3 1.5.0 .zip fixtures for the sb3_io loader tests.

Saves untrained (seeded) PPO / SAC / TD3 models from the VENDORED reference
SB3 on SimpleDocking3d, with small net_arch so the zips stay tiny, plus an
expected_actions.npz pinning each torch policy's deterministic actions on a
fixed observation batch — the loader test then asserts our flax forward
with the mapped params reproduces SB3's own outputs without needing the
reference at test time.

Usage: python scripts/gen_sb3_fixtures.py
Writes tests/fixtures/sb3_{ppo,sac,td3}_simple.zip + expected_actions.npz.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "tests", "fixtures")


def main():
    os.environ.setdefault("TQDM_DISABLE", "1")
    import numpy as np
    import torch

    torch.set_num_threads(1)
    from scripts.sb3_stub import install

    install()
    from tests.reference_oracle import load_reference

    load_reference()
    import copy

    import gym_dockauv.envs.docking3d as ref_dock
    from gym_dockauv.config.env_config import TRAIN_CONFIG

    cfg = copy.deepcopy(TRAIN_CONFIG)
    cfg["save_path_folder"] = "/tmp/sb3_fixtures"
    os.makedirs(cfg["save_path_folder"], exist_ok=True)
    cfg["verbose"] = 0
    cfg["log_level"] = 50
    cfg["interval_datastorage"] = 10 ** 9

    from stable_baselines3 import PPO, SAC, TD3

    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(7)
    obs = rng.uniform(-1.0, 1.0, (8, 36)).astype(np.float32)
    expected = {"obs": obs}

    specs = [
        ("ppo", PPO, dict(policy_kwargs=dict(net_arch=[dict(pi=[32, 32],
                                                            vf=[32, 32])]))),
        ("sac", SAC, dict(policy_kwargs=dict(net_arch=[32, 32]))),
        ("td3", TD3, dict(policy_kwargs=dict(net_arch=[32, 32]))),
    ]
    for name, cls, kw in specs:
        env = ref_dock.SimpleDocking3d(copy.deepcopy(cfg))
        model = cls("MlpPolicy", env, seed=123, device="cpu", verbose=0,
                    **kw)
        path = os.path.join(OUT, f"sb3_{name}_simple")
        model.save(path)
        acts = np.stack([model.predict(o, deterministic=True)[0]
                         for o in obs])
        expected[f"{name}_actions"] = acts
        import zipfile

        print(name, "->", path + ".zip",
              zipfile.ZipFile(path + ".zip").namelist())
        import io

        sd = torch.load(io.BytesIO(
            zipfile.ZipFile(path + ".zip").read("policy.pth")),
            map_location="cpu")
        print("  keys:", sorted(sd.keys())[:8], "...")
        env.close()

    np.savez(os.path.join(OUT, "expected_actions.npz"), **expected)
    print("wrote", os.path.join(OUT, "expected_actions.npz"))


if __name__ == "__main__":
    main()
