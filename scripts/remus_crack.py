"""Curriculum experiments to crack ObstaclesCurrentDocking3d_remus-v0.

Round-1 result: plain tolerance annealing (the recipe that takes the
BlueROV ObstaclesCurrent scenario to 0.92 success) leaves the REMUS variant
at 0.00 — the torpedo can't hover, and its reward's planar-velocity bonus
(reference docking3d_remus.py:650-653) fights terminal precision.  Each
variant here trains a staged curriculum (overriding tolerance and/or
shaping weights per stage) and is then evaluated on the TRUE unmodified
env config (success = goal_reached fraction of done-latched deterministic
rollouts), so shaping can't inflate the reported number.

Usage: python scripts/remus_crack.py [variant ...] (default: all)
Results -> logs/remus_crack/<variant>.json (+ model zip).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gym_dockauv_tpu.config.env_config import TRAIN_CONFIG_REMUS
from gym_dockauv_tpu.envs.core import make_env
from gym_dockauv_tpu.rl import PPO, SAC
from gym_dockauv_tpu.rl.her import HerSAC
from gym_dockauv_tpu.train import make_gym

ENV_ID = "ObstaclesCurrentDocking3d_remus-v0"
OUT = "logs/remus_crack"


def true_eval(model, n_episodes=256, seed=1234, core=None):
    """Deterministic rollout on the TRUE config (or `core` if given);
    returns success/collision/reward over n done-latched episodes."""
    if core is None:
        core = make_env(ENV_ID)
    max_t = core.config.max_timesteps + 1
    params = model._inference_params()

    def rollout(params, key):
        keys = jax.random.split(key, n_episodes)
        states, obs = jax.vmap(core.reset)(
            keys, jnp.zeros((n_episodes,), jnp.int32))
        step_env = jax.vmap(core.step)

        def body(carry, _):
            states, obs, alive, racc, goal, col, key = carry
            key, k = jax.random.split(key)
            action = model._predict_fn(params, obs, True, k)
            states, res = step_env(states, action)
            racc = racc + res.reward * alive
            goal = goal | (res.info.goal_reached & alive)
            col = col | (res.info.collision & alive)
            alive = alive & ~res.done
            return (states, res.obs, alive, racc, goal, col, key), None

        init = (states, obs, jnp.ones((n_episodes,), bool),
                jnp.zeros((n_episodes,)), jnp.zeros((n_episodes,), bool),
                jnp.zeros((n_episodes,), bool), key)
        (_, _, _, racc, goal, col, _), _ = jax.lax.scan(
            body, init, None, length=max_t)
        return racc, goal, col

    racc, goal, col = jax.jit(rollout)(params, jax.random.PRNGKey(seed))
    return {"success": float(np.mean(np.asarray(goal))),
            "collision": float(np.mean(np.asarray(col))),
            "reward": float(np.mean(np.asarray(racc)))}


def _train_success(model):
    return (float(np.mean([e["goal"] for e in model.ep_info_buffer]))
            if model.ep_info_buffer else 0.0)


def run_variant(name, stages, algo="ppo", hyper=None, vector_env=256,
                seed=0, gate=0.6, budget_mult=3, det_gate=False):
    """stages: list of ({config override kwargs incl. optional
    'w_velocity'/'w_goal'... and optional 'env_id'}, steps).

    Mastery-gated annealing: a stage trains in chunks and only advances
    when trailing-100-episode success >= `gate` (or its budget is
    exhausted at budget_mult x the nominal steps).  The ungated ladder
    regresses — run4 measured 0.20 -> 0.02 -> 0.01 when the tolerance
    tightened on schedule over an unmastered policy.

    det_gate=True gates on a DETERMINISTIC rollout of the stage env
    instead of the stochastic trailing train success — diag_tol3 measured
    deterministic success at 2x the stochastic number (0.55 vs 0.26), so
    the stochastic gate stalls ladders the policy has actually mastered."""
    os.makedirs(OUT, exist_ok=True)
    hyper = dict(hyper or {})
    t0 = time.time()
    model = None
    stage_log = []
    for i, (ov, steps) in enumerate(stages):
        ov = dict(ov)
        env_id = ov.pop("env_id", ENV_ID)
        rf_over = {k: ov.pop(k) for k in list(ov)
                   if k.startswith("w_")}
        cfg = TRAIN_CONFIG_REMUS()
        if rf_over:
            cfg = cfg.replace(reward_factors=cfg.reward_factors.replace(
                **rf_over))
        if ov:
            cfg = cfg.replace(**ov)
        env = make_gym(env_id, cfg)
        if model is None:
            if algo == "ppo":
                model = PPO(env=env, n_envs=vector_env, seed=seed, **hyper)
            elif algo == "hersac":
                model = HerSAC(env=env, n_envs=vector_env, seed=seed,
                               **hyper)
            else:
                model = SAC(env=env, n_envs=vector_env, seed=seed, **hyper)
        else:
            model.set_env(env)
        chunk = max(steps // 4, 1)
        spent = 0
        suc = det = 0.0
        while spent < steps * budget_mult:
            model.learn(total_timesteps=chunk, reset_num_timesteps=False)
            spent += chunk
            suc = _train_success(model)
            col = (float(np.mean([e["collision"] for e in
                                  model.ep_info_buffer]))
                   if model.ep_info_buffer else 0.0)
            line = (f"[{name}] stage {i} +{spent / 1e6:.0f}M: "
                    f"success={suc:.2f} collision={col:.2f}")
            if spent >= steps:
                if det_gate:
                    det = true_eval(model, n_episodes=128, core=env.core,
                                    seed=4321 + i)["success"]
                    line += f" det={det:.2f}"
                if (det if det_gate else suc) >= gate:
                    print(f"{line} ({time.time()-t0:.0f}s)", flush=True)
                    break
            print(f"{line} ({time.time()-t0:.0f}s)", flush=True)
        stage_log.append({"stage": i, "env_id": env_id,
                          "overrides": {**ov, **rf_over},
                          "steps": model.num_timesteps,
                          "train_success": suc, "det_success": det,
                          "wall_s": time.time() - t0})
        print(f"[{name}] stage {i} {ov} {rf_over}: train_success={suc:.2f} "
              f"({model.num_timesteps} steps, {time.time()-t0:.0f}s)",
              flush=True)
    ev = true_eval(model)
    result = {"variant": name, "algo": algo, "hyper": hyper,
              "vector_env": vector_env, "seed": seed, "stages": stage_log,
              "true_eval": ev, "total_steps": model.num_timesteps,
              "wall_s": time.time() - t0}
    with open(f"{OUT}/{name}.json", "w") as f:
        json.dump(result, f, indent=1)
    model.save(f"{OUT}/{name}_model")
    print(f"[{name}] TRUE-CONFIG EVAL: {ev} ({time.time()-t0:.0f}s)",
          flush=True)
    return result


# Key finding (run1): raw-unit PPO (SB3 ActorCriticPolicy semantics) CANNOT
# train any REMUS env — the zero-centered initial Gaussian over the rpm
# bound [0, 1500] never spins the propeller (train_success 0.00 even at a
# 3 m tolerance).  scale_actions=True maps the policy to [-1, 1].
# 256 envs x 64 steps: larger env batches (512/1024) make the tunneled
# chip's remote compile hang sporadically (RPC never returns); 256
# compiles reliably in ~1 min and trains at ~38k steps/s.
PPO_HYPER = dict(n_steps=64, batch_size=8192, n_epochs=4,
                 learning_rate=3e-4, ent_coef=0.0, scale_actions=True)
SAC_HYPER = dict(learning_starts=20_000, buffer_size=1_000_000,
                 batch_size=256, gradient_steps=4, jit_iters=64)

M = 1_000_000
TOL_LADDER = [
    ({"dist_goal_reached_tol": 3.0}, 8 * M),
    ({"dist_goal_reached_tol": 2.0}, 8 * M),
    ({"dist_goal_reached_tol": 1.4}, 8 * M),
    ({"dist_goal_reached_tol": 1.0}, 10 * M),
    ({"dist_goal_reached_tol": 0.7}, 10 * M),
    ({}, 16 * M)]

SAFE = {"w_velocity": 0.0, "w_col": -1000.0, "w_oa": 1.0}
SAFE2 = {"w_velocity": 0.0, "w_col": -600.0, "w_oa": 0.5}
# run9 post-mortem: zeroing w_velocity kills learning outright (0.00 at
# tol 3.0) — the cruise bonus is what keeps exploration energetic.  The
# deeper conflict: at w_velocity=1 a cruising policy collects ~+2/step for
# up to 1000 steps, so ENDING the episode by docking (w_goal=+400) is
# worse than never docking.  bigoal keeps the cruise bonus but makes the
# dock terminal worth more than the forfeited cruise income.
BG = {"w_goal": 3000.0}

VARIANTS = {
    # run6 post-mortem: tolerance-only annealing caps at 0.35 train
    # success even at a 3 m tolerance, with ~0.5 of episodes ending in
    # collision at every stage — the velocity bonus drives cruising into
    # the obstacle ring / center capsule.  safe_first teaches crash-free
    # navigation (no cruise bonus, heavy collision penalty, strong
    # avoidance shaping) before tightening precision, then restores the
    # true weights.
    "safe_first": dict(stages=[
        ({"dist_goal_reached_tol": 3.0, **SAFE}, 12 * M),
        ({"dist_goal_reached_tol": 1.8, **SAFE}, 10 * M),
        ({"dist_goal_reached_tol": 1.0, **SAFE2}, 10 * M),
        ({"dist_goal_reached_tol": 0.7, **SAFE2}, 10 * M),
        ({"w_velocity": 0.0}, 10 * M),
        ({}, 10 * M)], algo="ppo", hyper=PPO_HYPER, gate=0.6,
        budget_mult=2.5),
    # run10 post-mortem: w_goal=3000 raises collisions (0.75+) without
    # lifting success (caps 0.18) — charging the boundary goal head-on.
    # short_ep fixes the dock-vs-cruise economics structurally: a 300-step
    # episode caps cruise income at ~600 (comparable to w_goal) and
    # triples episode turnover, without touching any reward weight.
    "short_ep": dict(stages=[
        ({"dist_goal_reached_tol": 3.0, "max_timesteps": 300}, 8 * M),
        ({"dist_goal_reached_tol": 2.0, "max_timesteps": 300}, 8 * M),
        ({"dist_goal_reached_tol": 1.2, "max_timesteps": 300}, 8 * M),
        ({"dist_goal_reached_tol": 0.8, "max_timesteps": 400}, 10 * M),
        ({"dist_goal_reached_tol": 0.6, "max_timesteps": 600}, 10 * M),
        ({}, 12 * M)], algo="ppo", hyper=PPO_HYPER, gate=0.6,
        budget_mult=3),
    "bigoal": dict(stages=[
        ({"dist_goal_reached_tol": 3.0, **BG}, 8 * M),
        ({"dist_goal_reached_tol": 2.0, **BG}, 8 * M),
        ({"dist_goal_reached_tol": 1.2, **BG}, 8 * M),
        ({"dist_goal_reached_tol": 0.8, **BG}, 10 * M),
        ({"dist_goal_reached_tol": 0.6, **BG}, 10 * M),
        ({**BG}, 12 * M),
        ({}, 6 * M)], algo="ppo", hyper=PPO_HYPER, gate=0.6,
        budget_mult=3),
    # finer tolerance ladder than round 1, scaled-action PPO
    "sc_fine_tol": dict(stages=TOL_LADDER, algo="ppo", hyper=PPO_HYPER),
    # same ladder with the velocity bonus removed during shaping stages
    "sc_tol_novel": dict(stages=[
        ({**ov, "w_velocity": 0.0}, s) for ov, s in TOL_LADDER[:-1]] + [
        ({"w_velocity": 0.0}, 10 * M),
        ({}, 8 * M)], algo="ppo", hyper=PPO_HYPER),
    # off-policy fallback (SAC cracked SimpleDocking3d_remus in round 1);
    # det-gated so the ladder advances on actual capability
    "sac_tol": dict(stages=[
        ({"dist_goal_reached_tol": 3.0}, 3 * M),
        ({"dist_goal_reached_tol": 2.0}, 3 * M),
        ({"dist_goal_reached_tol": 1.4}, 3 * M),
        ({"dist_goal_reached_tol": 1.0}, 3 * M),
        ({"dist_goal_reached_tol": 0.7}, 3 * M),
        ({}, 4 * M)], algo="sac", hyper=SAC_HYPER, vector_env=64,
        gate=0.55, det_gate=True, budget_mult=2.5),
    # diag_tol3 post-mortem: stochastic success (0.26) is HALF the
    # deterministic capability (0.55) — PPO's log_std_init=0.0 means
    # std 1.0 over the scaled [-1,1] action space, i.e. near-bang-bang
    # random fin deflections that steer cruise paths into the obstacle
    # ring (sto collision 0.47 vs det 0.40).  lowstd starts exploration
    # at std~0.37 and gates the ladder on deterministic eval.
    # shrinkwrap: anneal the two ACTUAL blockers directly, not just the
    # success tolerance.  (a) ring_radius_scale grows the 4 ring capsules
    # 0.2 -> 1.0 (full-rudder turn radius is ~2.6 m vs the 2 m collision
    # shell — navigation is genuinely tight, so learn the route with thin
    # fences first); (b) goal_radius_margin starts the goal 1.5 m OFF the
    # center-capsule collision boundary (the reference puts it exactly ON
    # it) and anneals back to the true 0.  Final stage is the exact
    # reference config.
    # fin_bound_scale=0.1 rides along in EVERY stage (incl. the last): it
    # maps the policy's +/-1 to +/-1 rad instead of the reference's +/-10
    # rad fin bound, of which only the +/-0.52 rad actuator-saturation band
    # does anything — with the raw bound, a scaled policy's fin channels
    # are bang-bang (std 1.0 -> 96% of samples saturate) which both blinds
    # exploration and caps terminal precision.  The trained policy's
    # commands are a strict subset of the true action space, so the final
    # true-config eval is exact.
    "shrinkwrap": dict(stages=[
        ({"dist_goal_reached_tol": 3.0, "ring_radius_scale": 0.2,
          "goal_radius_margin": 1.5, "fin_bound_scale": 0.1}, 6 * M),
        ({"dist_goal_reached_tol": 2.0, "ring_radius_scale": 0.5,
          "goal_radius_margin": 1.0, "fin_bound_scale": 0.1}, 6 * M),
        ({"dist_goal_reached_tol": 1.2, "ring_radius_scale": 0.8,
          "goal_radius_margin": 0.5, "fin_bound_scale": 0.1}, 8 * M),
        ({"dist_goal_reached_tol": 0.8, "ring_radius_scale": 1.0,
          "goal_radius_margin": 0.2, "fin_bound_scale": 0.1}, 8 * M),
        ({"dist_goal_reached_tol": 0.65, "fin_bound_scale": 0.1}, 8 * M),
        # NOTE target_kl=0.05 was tried as a collapse guard and REMOVED:
        # at the initial std 1.0 it truncates most PPO epochs (det success
        # 0.16 @ 12M vs 0.55 @ 12M for the same stage without it)
        ({"fin_bound_scale": 0.1}, 12 * M)], algo="ppo", hyper=PPO_HYPER,
        gate=0.55, det_gate=True, budget_mult=2.5),
    # ladder2 supersedes shrinkwrap: a random-policy probe on shrinkwrap's
    # stage 0 showed 91% of collisions at the SCALED-DOWN ring — capsules
    # at r=0.2 are nearly invisible to the 63-ray radar while their
    # collision shell is still 1.2 m (0.2 + safety 1.0), i.e. the "easy"
    # ring was an invisible wall belt and trained policies collided MORE
    # than random (0.5-0.6 vs 0.27).  So: learn the precision task on
    # CapsuleCurrent (no ring; goal-margin + tolerance annealing with the
    # fin fix), then introduce the ring at FULL radar-visible size with a
    # brief precision relaxation.
    "ladder2": dict(stages=[
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "dist_goal_reached_tol": 3.0, "goal_radius_margin": 1.5,
          "fin_bound_scale": 0.1}, 5 * M),
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "dist_goal_reached_tol": 1.5, "goal_radius_margin": 0.8,
          "fin_bound_scale": 0.1}, 5 * M),
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "dist_goal_reached_tol": 0.8, "goal_radius_margin": 0.3,
          "fin_bound_scale": 0.1}, 6 * M),
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "fin_bound_scale": 0.1}, 6 * M),
        ({"dist_goal_reached_tol": 1.5, "goal_radius_margin": 0.5,
          "fin_bound_scale": 0.1}, 8 * M),
        ({"dist_goal_reached_tol": 0.8, "fin_bound_scale": 0.1}, 8 * M),
        ({"fin_bound_scale": 0.1}, 12 * M)], algo="ppo", hyper=PPO_HYPER,
        gate=0.55, det_gate=True, budget_mult=2.5),
    # SAC on the ladder2 stage geometry.  PPO collapsed mid-stage twice on
    # this task family (lowstd stage 3: 0.32 -> 0.08; ladder2 stage 1:
    # 0.29 -> 0.05, budget exhausted) while SAC trained SimpleRemus to 1.00
    # in round 1 without incident — off-policy replay + entropy temperature
    # don't share PPO's unlearning failure mode here.
    "sac_ladder": dict(stages=[
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "dist_goal_reached_tol": 3.0, "goal_radius_margin": 1.5,
          "fin_bound_scale": 0.1}, int(1.5 * M)),
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "dist_goal_reached_tol": 1.5, "goal_radius_margin": 0.8,
          "fin_bound_scale": 0.1}, int(1.5 * M)),
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "dist_goal_reached_tol": 0.8, "goal_radius_margin": 0.3,
          "fin_bound_scale": 0.1}, 2 * M),
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "fin_bound_scale": 0.1}, 2 * M),
        ({"dist_goal_reached_tol": 1.5, "goal_radius_margin": 0.5,
          "fin_bound_scale": 0.1}, int(2.5 * M)),
        ({"dist_goal_reached_tol": 0.8, "fin_bound_scale": 0.1},
         int(2.5 * M)),
        ({"fin_bound_scale": 0.1}, 3 * M)], algo="sac", hyper=SAC_HYPER,
        vector_env=64, gate=0.55, det_gate=True, budget_mult=2.5),
    # sac_ladder post-mortem: the capsule-only stages trained fine (det
    # 0.69 at true tolerance) but the policy collapsed when the ring
    # geometry appeared (stage 4 peaked 0.46 then fell to ~0.05) — the
    # capsule stages' replay taught "the radius-6 region is free space",
    # and that stale data keeps training the critic after the switch.
    # sac_spawn fixes the ROOT cause: every stage is the TRUE env (ring
    # present, radar-visible, collisions terminal, true reward, true
    # tolerance) and only the spawn anneals, spawn' = goal + lam*(spawn -
    # goal) with lam ~ U(spawn_lerp_min, 1).  All replay transitions come
    # from the true MDP at every stage — off-policy value learning is
    # exactly valid across the whole ladder, and each stage's
    # distribution is a superset reaching the true spawn.
    "sac_spawn": dict(stages=[
        ({"spawn_lerp_min": 0.05, "fin_bound_scale": 0.1}, int(1.5 * M)),
        ({"spawn_lerp_min": 0.2, "fin_bound_scale": 0.1}, int(1.5 * M)),
        ({"spawn_lerp_min": 0.4, "fin_bound_scale": 0.1}, 2 * M),
        ({"spawn_lerp_min": 0.6, "fin_bound_scale": 0.1}, 2 * M),
        ({"spawn_lerp_min": 0.8, "fin_bound_scale": 0.1}, int(2.5 * M)),
        ({"fin_bound_scale": 0.1}, 4 * M)], algo="sac", hyper=SAC_HYPER,
        vector_env=64, gate=0.55, det_gate=True, budget_mult=2.5),
    # sac_spawn post-mortem: success stayed AT the auto-success floor
    # (the ~3% of lerped spawns that land inside tolerance) for 3M steps
    # — det 0.02 flat.  Spawn proximity solves navigation, but the
    # blocker is terminal precision: at the TRUE tol 0.5 m with the goal
    # ON the capsule collision boundary, even 0.5 m-away starts collide
    # (collision 0.3-0.5) before docking.  sac_full keeps sac_spawn's
    # sound part (FULL obstacle field from stage 0, so replay never
    # learns false free space — the geometry switch is what collapsed
    # sac_ladder) and anneals the precision knobs (tolerance +
    # goal_radius_margin, which sac_ladder's capsule stages tolerated
    # fine across anneals) alongside the spawn lerp.
    "sac_full": dict(stages=[
        ({"dist_goal_reached_tol": 3.0, "goal_radius_margin": 1.5,
          "spawn_lerp_min": 0.05, "fin_bound_scale": 0.1}, 2 * M),
        ({"dist_goal_reached_tol": 1.5, "goal_radius_margin": 0.8,
          "spawn_lerp_min": 0.2, "fin_bound_scale": 0.1}, 2 * M),
        ({"dist_goal_reached_tol": 0.8, "goal_radius_margin": 0.3,
          "spawn_lerp_min": 0.4, "fin_bound_scale": 0.1}, int(2.5 * M)),
        ({"spawn_lerp_min": 0.6, "fin_bound_scale": 0.1}, int(2.5 * M)),
        ({"spawn_lerp_min": 0.8, "fin_bound_scale": 0.1}, 3 * M),
        ({"fin_bound_scale": 0.1}, 4 * M)], algo="sac", hyper=SAC_HYPER,
        vector_env=64, gate=0.55, det_gate=True, budget_mult=2.5),
    # sac_full post-mortem: stage 0 passed its det gate but stage 1 peaked
    # det 0.41 then declined — with lam ~ U(min, 1) HALF the episodes in
    # every "near" stage still spawn beyond the obstacle ring (median
    # lerped distance 5.8 m vs ring at 6 m), so ring-crossing collisions
    # (0.4-0.5 of episodes) dominate replay in the precision stages, and
    # the tol anneal and the spawn-out anneal landed together at stage 3.
    # sac_full2 decouples them with a spawn WINDOW (spawn_lerp_min/max):
    # precision is mastered to the TRUE tolerance entirely inside a
    # near-goal window (ring still present + radar-visible the whole
    # time, so replay never learns false free space), and only then does
    # the window slide out to the true spawn at fixed true precision.
    "sac_full2": dict(stages=[
        ({"dist_goal_reached_tol": 3.0, "goal_radius_margin": 1.5,
          "spawn_lerp_min": 0.05, "spawn_lerp_max": 0.35,
          "fin_bound_scale": 0.1}, int(1.5 * M)),
        ({"dist_goal_reached_tol": 1.5, "goal_radius_margin": 0.8,
          "spawn_lerp_min": 0.05, "spawn_lerp_max": 0.35,
          "fin_bound_scale": 0.1}, int(1.5 * M)),
        ({"dist_goal_reached_tol": 0.8, "goal_radius_margin": 0.3,
          "spawn_lerp_min": 0.05, "spawn_lerp_max": 0.35,
          "fin_bound_scale": 0.1}, 2 * M),
        ({"spawn_lerp_min": 0.05, "spawn_lerp_max": 0.35,
          "fin_bound_scale": 0.1}, int(2.5 * M)),
        ({"spawn_lerp_min": 0.2, "spawn_lerp_max": 0.6,
          "fin_bound_scale": 0.1}, int(2.5 * M)),
        ({"spawn_lerp_min": 0.5, "fin_bound_scale": 0.1}, 3 * M),
        ({"fin_bound_scale": 0.1}, 4 * M)], algo="sac", hyper=SAC_HYPER,
        vector_env=64, gate=0.55, det_gate=True, budget_mult=2.5),
    # HER attacks the precision wall directly: sac_full2's tolerance
    # ladder stalled at det ~0.30 once tol hit 0.8 (stable plateau, not a
    # collapse) — at the true 0.5 m tolerance success is too sparse for
    # the critic to shape the terminal approach.  HerSAC relabels in
    # hindsight (achieved position as goal, exact in-graph reward
    # counterfactual, rl/her.py), so every near-miss trains docking at
    # SOME point — the precision gradient is dense at the TRUE tolerance
    # from stage 0, and only the spawn window anneals.
    "her_window": dict(stages=[
        ({"spawn_lerp_min": 0.05, "spawn_lerp_max": 0.35,
          "fin_bound_scale": 0.1}, 3 * M),
        ({"spawn_lerp_min": 0.2, "spawn_lerp_max": 0.6,
          "fin_bound_scale": 0.1}, 3 * M),
        ({"spawn_lerp_min": 0.5, "fin_bound_scale": 0.1}, 3 * M),
        ({"fin_bound_scale": 0.1}, 4 * M)], algo="hersac",
        hyper={**SAC_HYPER, "n_sampled_goal": 4}, vector_env=64,
        gate=0.55, det_gate=True, budget_mult=2.5),
    # her_window post-mortem context: HER alone rose slowly (0.10 -> 0.15
    # at 2.5M) with collisions pinned at 0.35-0.40 — near-goal spawns
    # start AT REST with a 1 s actuator lag next to the capsule shell,
    # so the 0.5-1 m/s grid current drifts them into collision before
    # the prop spins up (a floor HER cannot relabel away), and
    # docking-from-rest is a different maneuver from the true task's
    # arrive-at-speed approach.  her_cruise fixes the spawn KINEMATICS:
    # cruise-speed aimed starts with a MODEST shell clearance (the goal
    # sits 1 m off the capsule surface, so clearance > ~1 would erase the
    # near window entirely), window annealing out to the exact reference
    # spawn (rest, random attitude) last.
    "her_cruise": dict(stages=[
        ({"spawn_lerp_min": 0.05, "spawn_lerp_max": 0.35,
          "spawn_clearance": 0.5, "spawn_speed": 1.5, "spawn_aim": True,
          "fin_bound_scale": 0.1}, 3 * M),
        ({"spawn_lerp_min": 0.2, "spawn_lerp_max": 0.6,
          "spawn_clearance": 0.5, "spawn_speed": 1.5, "spawn_aim": True,
          "fin_bound_scale": 0.1}, 3 * M),
        ({"spawn_lerp_min": 0.5, "spawn_clearance": 0.5,
          "spawn_speed": 1.5, "spawn_aim": True,
          "fin_bound_scale": 0.1}, 3 * M),
        ({"spawn_speed": 1.5, "spawn_aim": True,
          "fin_bound_scale": 0.1}, 3 * M),
        ({"fin_bound_scale": 0.1}, 4 * M)], algo="hersac",
        hyper={**SAC_HYPER, "n_sampled_goal": 4}, vector_env=64,
        gate=0.55, det_gate=True, budget_mult=2.5),
    # off-policy version of shrinkwrap (SAC cracked SimpleDocking3d_remus
    # to 1.00 in round 1; entropy-regularized exploration is gentler than
    # PPO's initial std-1.0 bang-bang on this collision-dominated task)
    "sac_shrink": dict(stages=[
        ({"dist_goal_reached_tol": 3.0, "ring_radius_scale": 0.2,
          "goal_radius_margin": 1.5, "fin_bound_scale": 0.1}, 2 * M),
        ({"dist_goal_reached_tol": 2.0, "ring_radius_scale": 0.5,
          "goal_radius_margin": 1.0, "fin_bound_scale": 0.1}, 2 * M),
        ({"dist_goal_reached_tol": 1.2, "ring_radius_scale": 0.8,
          "goal_radius_margin": 0.5, "fin_bound_scale": 0.1}, 3 * M),
        ({"dist_goal_reached_tol": 0.8, "ring_radius_scale": 1.0,
          "goal_radius_margin": 0.2, "fin_bound_scale": 0.1}, 3 * M),
        ({"dist_goal_reached_tol": 0.65, "fin_bound_scale": 0.1}, 3 * M),
        ({"fin_bound_scale": 0.1}, 4 * M)], algo="sac", hyper=SAC_HYPER,
        vector_env=64, gate=0.55, det_gate=True, budget_mult=2.5),
    # geometry ladder: collisions dominate every tolerance ladder (0.6-0.7
    # of episodes end on the ring or center capsule), so learn PRECISION
    # first on CapsuleCurrent (same goal-on-the-capsule-shaft task, same
    # current, no ring) and only then introduce the ring.  The ring is a
    # navigation problem (thread a 6 m-radius 4-capsule fence from the
    # fixed [-8,0,0] spawn); the capsule shaft is the precision problem —
    # staging them separately avoids exploring both at once.
    "geo_ladder": dict(stages=[
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "dist_goal_reached_tol": 3.0}, 5 * M),
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "dist_goal_reached_tol": 1.5}, 5 * M),
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0",
          "dist_goal_reached_tol": 0.8}, 6 * M),
        ({"env_id": "CapsuleCurrentDocking3d_remus-v0"}, 6 * M),
        ({"dist_goal_reached_tol": 1.0}, 8 * M),
        ({}, 12 * M)], algo="ppo",
        hyper={**PPO_HYPER, "log_std_init": -1.0},
        gate=0.55, det_gate=True, budget_mult=2.5),
    "lowstd": dict(stages=[
        ({"dist_goal_reached_tol": 3.0}, 6 * M),
        ({"dist_goal_reached_tol": 2.0}, 6 * M),
        ({"dist_goal_reached_tol": 1.4}, 6 * M),
        ({"dist_goal_reached_tol": 1.0}, 8 * M),
        ({"dist_goal_reached_tol": 0.7}, 8 * M),
        ({}, 10 * M)], algo="ppo",
        hyper={**PPO_HYPER, "log_std_init": -1.0},
        gate=0.55, det_gate=True, budget_mult=2.5),
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        if os.path.exists(f"{OUT}/{n}.json") and not os.environ.get("FORCE"):
            print(f"[{n}] result exists, skipping (FORCE=1 to redo)",
                  flush=True)
            continue
        run_variant(n, **VARIANTS[n])
