"""Docking environment core: pure reset/step functions over EnvState.

This is the TPU-native replacement for the reference env layer
(gym_dockauv/envs/docking3d.py:31-716, docking3d_remus.py:31-887): one
`DockingEnv` object holds only static configuration + device constants; all
per-episode state lives in the `EnvState` pytree.  `reset` and `step` are
pure, jit-able, vmap-able functions; auto-reset happens in-graph (replacing
SubprocVecEnv's worker-side auto-reset, subproc_vec_env.py:28-34, including
the terminal-observation hand-off).

Step ordering matches the reference exactly (docking3d.py:351-410):
current GM update -> body-frame current (old attitude/position) -> vehicle
tick -> radar -> collision -> navigation errors -> observation -> done ->
reward -> counters.  Quirks preserved on purpose: initial observation is
zeros (docking3d.py:327), the action penalty is multiplied by 0
(docking3d.py:596-597), collision uses safety_radius=1 rather than the
config "radius" knob (auvsim.py:43), REMUS disables the attitude done
condition (docking3d_remus.py:684-685) and adds the planar-velocity bonus
outside the reward array sum (docking3d_remus.py:650-653).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.env_config import EnvConfig
from ..dynamics import remus as remus_dyn
from ..dynamics.statespace import FossenParams, fossen_vehicle_step
from ..dynamics.vehicles import REMUS_U_BOUND, make_vehicle
from ..ops import geom, rays
from ..world import current as cur
from ..world import radar as rad
from .scenarios import Scenario, sample_scenario
from .types import EnvState, StepInfo, StepResult

N_REWARDS = 13
N_CONT_REWARDS = 8
N_OBS_WITHOUT_RADAR = 16

# Observation/reward meta data (docking3d.py:128-135, :160-178)
META_DATA_OBSERVATION = [
    ["delta_d", "delta_theta", "delta_psi"],
    ["u", "v", "w"],
    ["phi", "theta", "psi_sin", "psi_cos"],
    ["p", "q", "r"],
    ["u_c", "v_c", "w_c"],
    None,  # filled with ray names at runtime
]
META_DATA_REWARD = [
    "Nav_delta_d",
    "Nav_delta_theta",
    "Nav_delta_psi",
    "Att_phi",
    "Att_theta",
    "Thetadot",
    "obstacle_avoid",
    "action",
    "Done-Goal_reached",
    "Done-out_pos",
    "Done-out_att",
    "Done-max_t",
    "Done-collision",
]
META_DATA_DONE = META_DATA_REWARD[N_CONT_REWARDS:]


def log_precision(x, x_goal, x_max):
    """Log-scaled 0..1 precision measure (docking3d.py:723-735)."""
    eps = 0.001
    ratio = jnp.log(jnp.maximum(x, eps) / x_max) / jnp.log(
        jnp.maximum(x_goal, eps) / x_max
    )
    return 1.0 - jnp.clip(ratio, 0.0, 1.0)


def disc_goal_constraints(x, x_des, perc=0.2):
    """Discrete goal-constraint bonus (docking3d.py:738-752).  Unused by the
    active reward path — kept (like the reference keeps it) as part of the
    reward library surface; covered by a unit test."""
    x_des = x_des - x_des * perc
    return x_des / jnp.maximum(x_des, x) + (x < x_des)


def cont_goal_constraints(
    x, delta_d, x_des, delta_d_des, x_max, delta_d_max,
    x_exp=1.0, delta_d_exp=1.0, x_rev=False, delta_d_rev=False,
):
    """Distance-modulated constraint reward (docking3d.py:754-776)."""
    r_x = jnp.abs(float(x_rev) - log_precision(x, x_des, x_max)) ** x_exp
    r_d = jnp.abs(float(delta_d_rev) - log_precision(delta_d, delta_d_des, delta_d_max)) ** delta_d_exp
    return r_x * r_d


class DockingEnv:
    """One registered docking scenario as a functional env.

    All attributes are static config or device constants; instances are
    closed over by jit so each (family, kind, config) compiles once.
    """

    def __init__(
        self,
        config: EnvConfig | None = None,
        family: str = "bluerov",
        kind: str = "Simple",
        dtype=jnp.float32,
    ):
        self.config = config or EnvConfig()
        cfg = self.config
        self.family = family
        self.kind = kind
        self.dtype = dtype

        if family == "bluerov":
            self.vehicle = make_vehicle(cfg.vehicle if cfg.vehicle != "remus100" else "BlueROV2", dtype=dtype)
            self.n_actions = int(self.vehicle.u_bound.shape[0])
            self.u_bound = np.asarray(self.vehicle.u_bound)
            self.remus = None
        elif family == "remus":
            self.remus = remus_dyn.build_remus_params(dtype=dtype)
            self.vehicle = None
            self.u_bound = REMUS_U_BOUND.copy()
            # training-only knob (see EnvConfig.fin_bound_scale); 1.0 = parity
            self.u_bound[0:2, :] *= cfg.fin_bound_scale
            self.n_actions = 3
        else:
            raise KeyError(f"Unknown family {family!r}")

        r = cfg.radar
        self.fan = rad.build_radar_fan(
            alpha=r.alpha, beta=r.beta, ray_per_deg=r.ray_per_deg,
            max_dist=r.max_dist, blocksize_reduce=r.blocksize_reduce, dtype=dtype,
        )
        self.n_observations = N_OBS_WITHOUT_RADAR + self.fan.n_rays_reduced

        # Obstacle-avoidance angular importance weights, constant per fan
        # (docking3d.py:798-800 with epsilon_oa=0.01).
        self.beta_oa = (
            (1.0 - jnp.abs(self.fan.alpha) / self.fan.alpha_max)
            * (1.0 - jnp.abs(self.fan.beta) / self.fan.beta_max)
            + 0.01
        )

        w = cfg.reward_factors
        self.w_done = jnp.asarray(
            [w.w_goal, w.w_deltad_max, w.w_theta_max, w.w_t_max, w.w_col],
            dtype=dtype,
        )
        # GM process constants are shared by every scenario
        # (docking3d.py:832-834 etc.): mu=0.005, no noise.
        self.cur_mu = 0.005
        self.cur_noise_std = 0.0
        self.current_scale = 1.0  # grid-field scale in remus steps (current.py:58)

        self.meta_data_observation = [
            m if m is not None else [f"ray_{i}" for i in range(self.fan.n_rays_reduced)]
            for m in META_DATA_OBSERVATION
        ]
        self.meta_data_reward = list(META_DATA_REWARD)
        self.meta_data_done = list(META_DATA_DONE)

    # -- spaces ----------------------------------------------------------
    @property
    def action_low(self) -> np.ndarray:
        return self.u_bound[:, 0]

    @property
    def action_high(self) -> np.ndarray:
        return self.u_bound[:, 1]

    def observation_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        """(low, high) of the observation box (docking3d.py:119-125)."""
        low = -np.ones(self.n_observations)
        low[0] = 0.0
        low[N_OBS_WITHOUT_RADAR:] = 0.0
        return low, np.ones(self.n_observations)

    # -- reset -----------------------------------------------------------
    def reset(self, key: jax.Array, episode: jnp.ndarray | int = 0) -> Tuple[EnvState, jnp.ndarray]:
        """Fresh episode.  Returns (state, zeros-observation)
        (docking3d.py:222-327; initial obs is zeros by reference design)."""
        key, k_scen = jax.random.split(key)
        scen = sample_scenario(self.config, self.family, self.kind, k_scen, self.dtype)
        state = self._state_from_scenario(scen, key, jnp.asarray(episode, jnp.int32) + 1)
        return state, jnp.zeros((self.n_observations,), dtype=self.dtype)

    def _state_from_scenario(self, scen: Scenario, key: jax.Array, episode) -> EnvState:
        dt = self.dtype
        nu0 = jnp.zeros(6, dtype=dt)
        u_actual0 = jnp.zeros((3,), dtype=dt)
        if self.config.spawn_speed:
            # training-only cruise-speed start (config.spawn_speed doc):
            # surge velocity + pre-spun prop (linear rpm map from the
            # 1525 rpm = 2.5 m/s REMUS spec, remus100.py:9-10)
            nu0 = nu0.at[0].set(jnp.asarray(self.config.spawn_speed, dt))
            if self.family == "remus":
                u_actual0 = u_actual0.at[2].set(
                    jnp.asarray(self.config.spawn_speed / 2.5 * 1525.0, dt))
        vehicle = jnp.concatenate([scen.spawn_pos, scen.spawn_att, nu0])
        nu_c0 = self._nu_c(scen.v_c_init, scen.cur_alpha, scen.cur_beta,
                           scen.spawn_att, scen.spawn_pos)
        return EnvState(
            vehicle=vehicle,
            u=jnp.zeros((self.n_actions,), dtype=dt),
            u_actual=u_actual0,
            state_dot=jnp.zeros((12,), dtype=dt),
            last_attitude=jnp.zeros((3,), dtype=dt),
            last_position=jnp.zeros((3,), dtype=dt),
            v_c=scen.v_c_init,
            cur_v_min=scen.cur_v_min,
            cur_v_max=scen.cur_v_max,
            cur_alpha=scen.cur_alpha,
            cur_beta=scen.cur_beta,
            nu_c=nu_c0,
            goal=scen.goal,
            heading_goal=scen.heading_goal,
            cap_a=scen.cap_a,
            cap_b=scen.cap_b,
            cap_r=scen.cap_r,
            cap_valid=scen.cap_valid,
            sph_c=scen.sph_c,
            sph_r=scen.sph_r,
            sph_valid=scen.sph_valid,
            t_steps=jnp.zeros((), jnp.int32),
            episode=jnp.asarray(episode, jnp.int32),
            cum_reward=jnp.zeros((), dt),
            cum_reward_arr=jnp.zeros((N_REWARDS,), dt),
            key=key,
        )

    # -- internals ---------------------------------------------------------
    def _nu_c(self, v_c, alpha, beta, attitude, position) -> jnp.ndarray:
        """Body-frame current: GM point model for the BlueROV2 family,
        position-indexed grid field for REMUS (docking3d_remus.py:360-365)."""
        if self.family == "remus":
            p = cur.CurrentParams(
                mu=jnp.asarray(self.cur_mu, self.dtype),
                v_min=jnp.asarray(0.0, self.dtype),
                v_max=jnp.asarray(0.0, self.dtype),
                alpha=alpha, beta=beta,
                white_noise_std=jnp.asarray(self.cur_noise_std, self.dtype),
                current_scale=jnp.asarray(self.current_scale, self.dtype),
            )
            return cur.nu_c_from_position(p, attitude, position)
        gm = cur.CurrentParams(
            mu=jnp.asarray(self.cur_mu, self.dtype),
            v_min=jnp.asarray(0.0, self.dtype),
            v_max=jnp.asarray(0.0, self.dtype),
            alpha=alpha, beta=beta,
            white_noise_std=jnp.asarray(self.cur_noise_std, self.dtype),
            current_scale=jnp.asarray(self.current_scale, self.dtype),
        )
        return cur.nu_c_body(attitude, cur.current_ned(gm, v_c))

    def _cast_rays(self, state: EnvState, eta: jnp.ndarray):
        """Shared hit pipeline: (NED ray dirs (R,3), clamped distances (R,)).

        fused min-positive + clamp (== min_positive then clamp_intersections;
        the gather-free form is ~26x faster on TPU, see ops/rays.py)."""
        rd_n = rad.ray_directions_ned(self.fan, eta[3:6])
        origin = jnp.broadcast_to(eta[0:3], rd_n.shape)
        d_caps = rays.ray_capsule(
            origin, rd_n, state.cap_a, state.cap_b, state.cap_r, valid=state.cap_valid
        )  # (R, K)
        d_sph = rays.ray_sphere(
            origin, rd_n, state.sph_c, state.sph_r, valid=state.sph_valid
        )  # (R, S)
        dist = rays.nearest_hit_clamped(
            jnp.concatenate([d_caps, d_sph], axis=-1), self.fan.max_dist)
        return rd_n, dist

    def _radar_distances(self, state: EnvState, eta: jnp.ndarray) -> jnp.ndarray:
        """Clamped per-ray hit distances (docking3d.py:360-362, :427-454)."""
        return self._cast_rays(state, eta)[1]

    def _collision(self, state: EnvState, position: jnp.ndarray) -> jnp.ndarray:
        safety = jnp.asarray(self.config.safety_radius, self.dtype)
        col_s = rays.collide_sphere_spheres(
            position, safety, state.sph_c, state.sph_r, state.sph_valid
        )
        col_c = rays.collide_capsules_sphere(
            state.cap_a, state.cap_b, state.cap_r, state.cap_valid, position, safety
        )
        return col_s | col_c

    def _nav_errors(self, position, attitude, goal):
        diff = goal - position
        delta_d = jnp.linalg.norm(diff)
        delta_theta = attitude[1] + geom.ssa(
            jnp.arctan2(diff[2], jnp.linalg.norm(diff[:2]))
        )
        delta_psi = geom.ssa(jnp.arctan2(diff[1], diff[0]) - attitude[2])
        return delta_d, delta_theta, delta_psi

    def _observe(self, state_vec, nu_c, delta_d, delta_theta, delta_psi, rays_reduced):
        """36-dim observation (docking3d.py:474-500)."""
        cfg = self.config
        att = state_vec[3:6]
        nu = state_vec[6:12]
        obs_head = jnp.stack(
            [
                jnp.clip(
                    1.0
                    - jnp.log(delta_d / cfg.max_dist_from_goal)
                    / jnp.log(cfg.dist_goal_reached_tol / cfg.max_dist_from_goal),
                    0.0,
                    1.0,
                ),
                jnp.clip(delta_theta / (jnp.pi / 2), -1.0, 1.0),
                jnp.clip(delta_psi / jnp.pi, -1.0, 1.0),
                jnp.clip(nu[0] / cfg.u_max, -1.0, 1.0),
                jnp.clip(nu[1] / cfg.v_max, -1.0, 1.0),
                jnp.clip(nu[2] / cfg.w_max, -1.0, 1.0),
                jnp.clip(att[0] / cfg.max_attitude, -1.0, 1.0),
                jnp.clip(att[1] / cfg.max_attitude, -1.0, 1.0),
                jnp.clip(jnp.sin(att[2]), -1.0, 1.0),
                jnp.clip(jnp.cos(att[2]), -1.0, 1.0),
                jnp.clip(nu[3] / cfg.p_max, -1.0, 1.0),
                jnp.clip(nu[4] / cfg.q_max, -1.0, 1.0),
                jnp.clip(nu[5] / cfg.r_max, -1.0, 1.0),
                jnp.clip(nu_c[0] / 2.0, -1.0, 1.0),
                jnp.clip(nu_c[1] / 2.0, -1.0, 1.0),
                jnp.clip(nu_c[2] / 2.0, -1.0, 1.0),
            ]
        )
        obs_rays = jnp.clip(rays_reduced / self.fan.max_dist, 0.0, 1.0)
        return jnp.concatenate([obs_head, obs_rays]).astype(self.dtype)

    def _obstacle_avoidance(self, intersec_dist):
        """Havenstrom-style OA penalty (docking3d.py:778-804)."""
        c = jnp.clip(1.0 - intersec_dist / self.fan.max_dist, 0.0, 1.0)
        denom = jnp.maximum((1.0 - c) ** 2, 0.001) @ self.beta_oa
        return jnp.sum(self.beta_oa) / denom - 1.0

    def _reward(
        self, cfg, conditions, delta_d, delta_theta, delta_psi, attitude,
        euler_dot, intersec_dist, action, ned_velocity,
    ):
        """13-slot reward vector + scalar (docking3d.py:502-607 and remus
        deltas docking3d_remus.py:560-655)."""
        w = cfg.reward_factors
        half_pi = jnp.pi / 2

        r0 = -w.w_d * log_precision(delta_d, cfg.dist_goal_reached_tol, cfg.max_dist_from_goal)
        if cfg.reward_set == 1:
            r1 = -w.w_delta_theta * (delta_theta / half_pi) ** 2
            r2 = -w.w_delta_psi * (delta_psi / jnp.pi) ** 2
        else:
            r1 = -w.w_delta_theta * cont_goal_constraints(
                jnp.abs(delta_theta), delta_d, 0.0, cfg.dist_goal_reached_tol,
                half_pi, cfg.max_dist_from_goal, 4.0, 4.0,
            )
            r2 = -w.w_delta_psi * cont_goal_constraints(
                jnp.abs(delta_psi), delta_d, 0.0, cfg.dist_goal_reached_tol,
                jnp.pi, cfg.max_dist_from_goal, 4.0, 4.0,
            )
        r3 = -w.w_phi * (attitude[0] / half_pi) ** 2
        if self.family == "remus":
            # pitch term hard-zeroed in the remus env (docking3d_remus.py:607-608)
            r4 = jnp.zeros((), self.dtype)
        else:
            r4 = -w.w_theta * (attitude[1] / half_pi) ** 2
        r5 = -w.w_thetadot * (jnp.linalg.norm(euler_dot) / cfg.p_max) ** 2
        roa = self._obstacle_avoidance(intersec_dist)
        if cfg.reward_set == 1:
            r6 = -w.w_oa * roa
        else:
            r6 = -w.w_oa * cont_goal_constraints(
                jnp.abs(roa), delta_d, 0.0, cfg.dist_goal_reached_tol,
                1.0, cfg.max_dist_from_goal, 4.0, 4.0,
            )
        # action penalty multiplied by 0 in the reference (docking3d.py:596)
        r7 = -jnp.sum((jnp.abs(action) / self.n_actions) ** 2 * cfg.action_reward_factors * 0.0)

        cont = jnp.stack([r0, r1, r2, r3, r4, r5, r6, r7]).astype(self.dtype)
        done_part = conditions.astype(self.dtype) * self.w_done
        reward_arr = jnp.concatenate([cont, done_part])
        reward = jnp.sum(reward_arr)
        if self.family == "remus":
            # planar NED velocity bonus, added outside the array sum
            # (docking3d_remus.py:650-653)
            reward = reward + w.w_velocity * jnp.linalg.norm(ned_velocity[0:2])
        return reward_arr, reward

    # -- step --------------------------------------------------------------
    def step(self, state: EnvState, action: jnp.ndarray) -> Tuple[EnvState, StepResult]:
        """One env tick, no auto-reset."""
        cfg = self.config
        key, k_noise = jax.random.split(state.key)

        # 1) current GM update + body-frame current at OLD pose
        gm = cur.CurrentParams(
            mu=jnp.asarray(self.cur_mu, self.dtype),
            v_min=state.cur_v_min, v_max=state.cur_v_max,
            alpha=state.cur_alpha, beta=state.cur_beta,
            white_noise_std=jnp.asarray(self.cur_noise_std, self.dtype),
            current_scale=jnp.asarray(self.current_scale, self.dtype),
        )
        v_c = cur.gauss_markov_step(gm, state.v_c, k_noise, cfg.t_step_size)
        nu_c = self._nu_c(v_c, state.cur_alpha, state.cur_beta,
                          state.attitude, state.position)

        # 2) vehicle tick
        action = jnp.asarray(action, self.dtype)
        if self.family == "remus":
            new_vehicle, u_new, state_dot = remus_dyn.remus_vehicle_step(
                self.remus, state.vehicle, state.u_actual, action, nu_c
            )
            u_actual = u_new
            u_applied = action
        else:
            new_vehicle, u_applied, state_dot = fossen_vehicle_step(
                self.vehicle, state.vehicle, state.u, action, nu_c, cfg.t_step_size
            )
            u_actual = state.u_actual

        eta = new_vehicle[0:6]
        position, attitude = eta[0:3], eta[3:6]

        # 3) radar + collision
        intersec = self._radar_distances(state, eta)
        collision = self._collision(state, position)

        # 4) navigation errors + observation (nu_c from OLD pose, per ref)
        delta_d, delta_theta, delta_psi = self._nav_errors(position, attitude, state.goal)
        rays_reduced = rad.reduced_observation(self.fan, intersec)
        obs = self._observe(new_vehicle, nu_c, delta_d, delta_theta, delta_psi, rays_reduced)

        # 5) done conditions (docking3d.py:609-643; remus disables attitude)
        if self.family == "remus":
            att_out = jnp.zeros((), bool)
        else:
            att_out = jnp.any(jnp.abs(attitude[0:2]) > cfg.max_attitude)
        conditions = jnp.stack(
            [
                delta_d < cfg.dist_goal_reached_tol,
                delta_d > cfg.max_dist_from_goal,
                att_out,
                state.t_steps >= cfg.max_timesteps,
                collision,
            ]
        )
        done = jnp.any(conditions)

        # 6) reward
        ned_velocity = jnp.einsum(
            "ij,j->i",
            geom.rzyx(attitude[0], attitude[1], attitude[2]),
            new_vehicle[6:9],
        )
        reward_arr, reward = self._reward(
            cfg, conditions, delta_d, delta_theta, delta_psi, attitude,
            state_dot[3:6], intersec, action, ned_velocity,
        )

        new_state = state.replace(
            vehicle=new_vehicle,
            u=u_applied,
            u_actual=u_actual,
            state_dot=state_dot,
            last_attitude=attitude,
            last_position=position,
            v_c=v_c,
            nu_c=nu_c,
            t_steps=state.t_steps + 1,
            cum_reward=state.cum_reward + reward,
            cum_reward_arr=state.cum_reward_arr + reward_arr,
            key=key,
        )
        info = StepInfo(
            episode_number=state.episode,
            t_step=new_state.t_steps,
            cumulative_reward=new_state.cum_reward,
            conditions=conditions,
            collision=collision,
            goal_reached=conditions[0],
            delta_d=delta_d,
            reward_arr=reward_arr,
            cum_reward_arr=new_state.cum_reward_arr,
            position=position,
            attitude=attitude,
            terminal_observation=obs,
        )
        return new_state, StepResult(obs=obs, reward=reward, done=done, info=info)

    def radar_snapshot(self, state: EnvState):
        """(origin (3,), ray end points (R,3)) in NED for the current state —
        recomputed on demand for rendering/storage (the hot step path never
        materializes end points; reference keeps them live, sensor.py:104-120)."""
        eta = state.vehicle[0:6]
        rd_n, dist = self._cast_rays(state, eta)
        return eta[0:3], eta[0:3] + rd_n * dist[:, None]

    def step_autoreset(self, state: EnvState, action: jnp.ndarray) -> Tuple[EnvState, StepResult]:
        """Step with in-graph auto-reset on done: the returned obs is the
        fresh episode's reset observation (zeros, matching the reference's
        reset semantics through SubprocVecEnv); the terminal observation
        stays available in info (SB3 convention, subproc_vec_env.py:30-34)."""
        stepped, res = self.step(state, action)
        fresh, fresh_obs = self.reset(stepped.key, episode=stepped.episode)
        # Scalar done broadcasts against every leaf (batching is applied by
        # vmapping this whole function, so done is always scalar here).
        new_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(res.done, a, b), fresh, stepped
        )
        obs = jnp.where(res.done, fresh_obs, res.obs)
        return new_state, res.replace(obs=obs)


def make_env(env_id: str, config: EnvConfig | None = None, dtype=jnp.float32) -> DockingEnv:
    """Factory by registration string (train.py:269-282 equivalent)."""
    from ..config.env_config import REGISTRATION_DICT, TRAIN_CONFIG, TRAIN_CONFIG_REMUS

    if env_id not in REGISTRATION_DICT:
        raise KeyError(
            f"Not a valid env registration string; options: {list(REGISTRATION_DICT)}"
        )
    family, kind = REGISTRATION_DICT[env_id]
    if config is None:
        config = TRAIN_CONFIG_REMUS() if family == "remus" else TRAIN_CONFIG()
    return DockingEnv(config=config, family=family, kind=kind, dtype=dtype)
