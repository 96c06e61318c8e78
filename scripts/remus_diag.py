"""Instrumented failure analysis for ObstaclesCurrentDocking3d_remus-v0.

Trains scaled-action PPO at a 3 m tolerance (the stage every curriculum
variant plateaus on at ~0.2-0.35 success), then rolls out stochastic AND
deterministic episodes recording per-episode: terminal condition, min
distance-to-goal ever reached, terminal position, and which obstacle the
collision happened on.  The numbers say WHERE the policy fails instead of
guessing the next shaping variant.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gym_dockauv_tpu.config.env_config import TRAIN_CONFIG_REMUS
from gym_dockauv_tpu.ops.rays import dist_segment_point
from gym_dockauv_tpu.rl import PPO
from gym_dockauv_tpu.train import make_gym

ENV_ID = "ObstaclesCurrentDocking3d_remus-v0"
TOL = 3.0
STEPS = 12_000_000


def diagnose(model, core, n_episodes=512, deterministic=True, seed=99):
    max_t = core.config.max_timesteps + 1
    params = model._inference_params()

    def rollout(params, key):
        keys = jax.random.split(key, n_episodes)
        states, obs = jax.vmap(core.reset)(
            keys, jnp.zeros((n_episodes,), jnp.int32))
        step_env = jax.vmap(core.step)

        def body(carry, _):
            states, obs, alive, mind, goal, cond_at_end, end_pos, key = carry
            key, k = jax.random.split(key)
            action = model._predict_fn(params, obs, deterministic, k)
            nstates, res = step_env(states, action)
            d = res.info.delta_d
            mind = jnp.minimum(mind, jnp.where(alive, d, jnp.inf))
            goal = goal | (res.info.goal_reached & alive)
            just_done = res.done & alive
            cond_at_end = jnp.where(just_done[:, None],
                                    res.info.conditions, cond_at_end)
            end_pos = jnp.where(just_done[:, None], res.info.position,
                                end_pos)
            alive = alive & ~res.done
            return (nstates, res.obs, alive, mind, goal, cond_at_end,
                    end_pos, key), None

        init = (states, obs, jnp.ones((n_episodes,), bool),
                jnp.full((n_episodes,), jnp.inf),
                jnp.zeros((n_episodes,), bool),
                jnp.zeros((n_episodes, 5), bool),
                jnp.zeros((n_episodes, 3)), key)
        (states, _, alive, mind, goal, conds, end_pos, _), _ = \
            jax.lax.scan(body, init, None, length=max_t)
        return states, mind, goal, conds, end_pos

    states, mind, goal, conds, end_pos = jax.jit(rollout)(
        params, jax.random.PRNGKey(seed))
    mind = np.asarray(mind)
    goal = np.asarray(goal)
    conds = np.asarray(conds)
    end_pos = np.asarray(end_pos)
    cap_a = np.asarray(states.cap_a)  # (N, K, 3)
    cap_b = np.asarray(states.cap_b)
    cap_r = np.asarray(states.cap_r)
    goal_pos = np.asarray(states.goal)

    # which obstacle is nearest at the terminal position of collisions
    d_obs = np.stack([
        np.asarray(jax.vmap(jax.vmap(dist_segment_point, (None, 0, 0, )),
                            (0, 0, 0))(jnp.asarray(end_pos),
                                       jnp.asarray(cap_a),
                                       jnp.asarray(cap_b)))])[0] \
        - cap_r  # (N, K) surface distance
    collided = conds[:, 4]
    center_hit = collided & (np.argmin(d_obs, axis=1) == 0)
    ring_hit = collided & (np.argmin(d_obs, axis=1) > 0)
    out = {
        "n": int(len(mind)),
        "deterministic": deterministic,
        "success": float(goal.mean()),
        "end_goal": float(conds[:, 0].mean()),
        "end_bounds": float(conds[:, 1].mean()),
        "end_timeout": float(conds[:, 3].mean()),
        "end_collision": float(collided.mean()),
        "collision_center_capsule": float(center_hit.mean()),
        "collision_ring": float(ring_hit.mean()),
        "min_dist_median": float(np.median(mind)),
        "min_dist_p25": float(np.percentile(mind, 25)),
        "min_dist_p75": float(np.percentile(mind, 75)),
        "got_within_3m": float((mind < 3.0).mean()),
        "got_within_1m": float((mind < 1.0).mean()),
        "dist_goal_from_axis": float(np.linalg.norm(goal_pos[0, :2])),
    }
    return out


if __name__ == "__main__":
    t0 = time.time()
    cfg = TRAIN_CONFIG_REMUS().replace(dist_goal_reached_tol=TOL)
    env = make_gym(ENV_ID, cfg)
    model = PPO(env=env, n_envs=256, n_steps=64, batch_size=8192,
                n_epochs=4, learning_rate=3e-4, scale_actions=True, seed=0)
    chunk = 4_000_000
    while model.num_timesteps < STEPS:
        model.learn(total_timesteps=chunk, reset_num_timesteps=False)
        suc = (float(np.mean([e["goal"] for e in model.ep_info_buffer]))
               if model.ep_info_buffer else 0.0)
        print(f"train {model.num_timesteps/1e6:.0f}M: success={suc:.2f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    model.save("logs/remus_crack/diag_tol3_model")
    for det in (True, False):
        res = diagnose(model, env.core, deterministic=det)
        print(json.dumps(res, indent=1), flush=True)
        with open(f"logs/remus_crack/diag_tol3_{'det' if det else 'sto'}.json",
                  "w") as f:
            json.dump(res, f, indent=1)
