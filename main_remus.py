"""REMUS 100 training entry point (role of reference main_remus.py:50-113):
remus scenario family, 10M steps, 16 vectorized envs, checkpoints every
100k.  Run: python main_remus.py [--steps N] [--envs ...]"""
import argparse
import os

from gym_dockauv_tpu.config.env_config import TRAIN_CONFIG_REMUS
from gym_dockauv_tpu.train import train
from main import MODELS, unique_run_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+", default=["SimpleDocking3d_remus-v0"])
    p.add_argument("--algos", nargs="+", default=["SAC"], choices=list(MODELS))
    p.add_argument("--steps", type=int, default=10_000_000)
    p.add_argument("--save-every", type=int, default=100_000)
    p.add_argument("--vector-env", type=int, default=16)
    p.add_argument("--shard", action="store_true")
    args = p.parse_args()

    for gym_env in args.envs:
        for algo_name in args.algos:
            run_dir = unique_run_dir("logs", f"{gym_env}_{algo_name}")
            train(gym_env=gym_env,
                  total_timesteps=args.steps,
                  MODEL=MODELS[algo_name],
                  model_save_path=os.path.join(run_dir, "model"),
                  env_config=TRAIN_CONFIG_REMUS(),
                  tb_log_name=f"{gym_env}_{algo_name}",
                  timesteps_per_save=args.save_every,
                  vector_env=args.vector_env,
                  shard=args.shard)


if __name__ == "__main__":
    main()
