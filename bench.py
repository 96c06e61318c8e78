"""Headline benchmark: vectorized docking env throughput on one chip.

Measures env-steps/s of the jitted, vmapped, auto-resetting
ObstaclesDocking3d step (full pipeline: GM current, Fossen RK45 dynamics,
63-ray radar vs masked capsule+sphere field, collision, observation, reward,
in-graph reset) with actions from the SAC actor — i.e. the same work one
SubprocVecEnv worker step performs in the reference, times N envs.

Baseline (BASELINE.md, self-defined: the reference publishes none):
1M aggregate env-steps/s on one v5p host = 125k env-steps/s per chip.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

from gym_dockauv_tpu.envs.core import make_env  # noqa: E402
from gym_dockauv_tpu.rl.distributions import squashed_sample_and_log_prob  # noqa: E402
from gym_dockauv_tpu.rl.networks import SACActor  # noqa: E402

PER_CHIP_BASELINE = 125_000.0  # 1M/s per 8-chip v5p host


def build(n_envs: int, chunk: int):
    core = make_env(os.environ.get("BENCH_ENV", "ObstaclesDocking3d-v0"))
    actor = SACActor(core.n_actions)
    key = jax.random.PRNGKey(0)
    params = actor.init(key, jnp.zeros((1, core.n_observations)))
    env_states, obs = jax.jit(jax.vmap(core.reset))(
        jax.random.split(key, n_envs), jnp.zeros((n_envs,), jnp.int32))
    low = jnp.asarray(core.action_low, jnp.float32)
    high = jnp.asarray(core.action_high, jnp.float32)
    step_env = jax.vmap(core.step_autoreset)

    @jax.jit
    def rollout_chunk(params, env_states, obs, key):
        def body(carry, _):
            env_states, obs, key = carry
            key, k = jax.random.split(key)
            mean, log_std = actor.apply(params, obs)
            a, _ = squashed_sample_and_log_prob(k, mean, log_std)
            action = low + 0.5 * (a + 1.0) * (high - low)
            env_states, res = step_env(env_states, action)
            return (env_states, res.obs, key), res.reward

        (env_states, obs, key), rew = jax.lax.scan(
            body, (env_states, obs, key), None, length=chunk)
        return env_states, obs, key, rew.sum()

    return params, env_states, obs, key, rollout_chunk


def main():
    n_envs = int(os.environ.get("BENCH_N_ENVS", 8192))
    chunk = int(os.environ.get("BENCH_CHUNK", 100))
    reps = int(os.environ.get("BENCH_REPS", 5))

    params, env_states, obs, key, rollout = build(n_envs, chunk)
    # warmup/compile
    env_states, obs, key, r = rollout(params, env_states, obs, key)
    r.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(reps):
        env_states, obs, key, r = rollout(params, env_states, obs, key)
    r.block_until_ready()
    dt = time.perf_counter() - t0

    steps_per_s = n_envs * chunk * reps / dt
    print(json.dumps({
        "metric": "env_steps_per_s_per_chip",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / PER_CHIP_BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
