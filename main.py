"""BlueROV2 training entry point (role of reference main.py:41-113).

Loops GYM_ENV x MODELS with auto-incremented run directories
logs/{env}_{algo}_{n}; 1M steps, checkpoint every 100k, 8 vectorized envs
(the reference's SubprocVecEnv worker count becomes the vmapped env batch).
Run: python main.py [--steps N] [--envs ...] [--algos PPO SAC] [--shard]
"""
import argparse
import os

from gym_dockauv_tpu.rl import PPO, SAC
from gym_dockauv_tpu.train import predict, train

MODELS = {"PPO": PPO, "SAC": SAC}


def unique_run_dir(base: str, name: str) -> str:
    """logs/{env}_{algo}_{n} auto-increment (main.py:41-51)."""
    os.makedirs(base, exist_ok=True)
    n = 1
    while os.path.exists(os.path.join(base, f"{name}_{n}")):
        n += 1
    path = os.path.join(base, f"{name}_{n}")
    os.makedirs(path)
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+", default=["SimpleDocking3d-v0"])
    p.add_argument("--algos", nargs="+", default=["SAC"],
                   choices=list(MODELS))
    p.add_argument("--steps", type=int, default=1_000_000)
    p.add_argument("--save-every", type=int, default=100_000)
    p.add_argument("--vector-env", type=int, default=8)
    p.add_argument("--shard", action="store_true",
                   help="shard the env batch over all visible devices")
    p.add_argument("--predict", metavar="MODEL_PATH",
                   help="rollout a saved model instead of training")
    p.add_argument("--render", action="store_true")
    args = p.parse_args()

    for gym_env in args.envs:
        for algo_name in args.algos:
            if args.predict:
                results = predict(gym_env, args.predict,
                                  MODEL=MODELS[algo_name],
                                  render=args.render, rotate_cam=args.render)
                print(results)
                continue
            run_dir = unique_run_dir("logs", f"{gym_env}_{algo_name}")
            train(gym_env=gym_env,
                  total_timesteps=args.steps,
                  MODEL=MODELS[algo_name],
                  model_save_path=os.path.join(run_dir, "model"),
                  tb_log_name=f"{gym_env}_{algo_name}",
                  timesteps_per_save=args.save_every,
                  vector_env=args.vector_env,
                  shard=args.shard)


if __name__ == "__main__":
    main()
