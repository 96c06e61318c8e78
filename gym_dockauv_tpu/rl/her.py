"""Hindsight Experience Replay — TPU-native, docking-aware.

Role of stable_baselines3/her/her_replay_buffer.py:41 ('future' strategy,
n_sampled_goal=4).  Note the reference ships HER but its docking envs are
not GoalEnvs, so HER was never actually runnable there; here HER is wired
directly to the docking task: the desired goal is the docking point
(EnvState.goal), the achieved goal is the vehicle position, and relabeling
is exact — the stored reward is adjusted by swapping the goal-dependent
terms (distance r0, pitch-error r1, bearing-error r2, goal-reach and
out-of-bounds terminal slots; docking3d.py:560-607, reward_set=1 path)
recomputed for the hindsight goal from the stored pose.  Obs entries 0..2
(the goal-relative features, docking3d.py:474-480) are recomputed the same
way.

In-graph 'future' sampling: relabel goals come from a uniformly drawn later
slot in the same env lane, masked to the same episode via the per-env
episode counter; cross-episode (or ring-wrapped) draws keep the original
goal.  Relabeling happens at sample time inside the jitted train step — the
buffer never leaves the device.

Usage: ``HerSAC(env=..., n_sampled_goal=4, ...)`` — same surface as SAC;
``HerTD3``/``HerDDPG`` likewise.  ``her_horizon=None`` (default) samples
future goals up to the episode cap like SB3's 'future' strategy; pass an
int to bias toward nearer goals.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .buffers import ReplayState, replay_add, replay_init
from .ddpg import DDPG
from .sac import SAC
from .td3 import TD3


@struct.dataclass
class HerReplayState(ReplayState):
    veh_pos: jnp.ndarray = None  # (C, N, 3) pre-step position
    veh_att: jnp.ndarray = None  # (C, N, 3) pre-step attitude
    veh_pos_next: jnp.ndarray = None  # (C, N, 3) post-step (pre-reset)
    veh_att_next: jnp.ndarray = None  # (C, N, 3)
    goal: jnp.ndarray = None  # (C, N, 3) desired goal at storage time
    episode_id: jnp.ndarray = None  # (C, N) int32 per-env episode counter


def her_replay_init(capacity: int, n_envs: int, obs_dim: int, act_dim: int,
                    dtype=jnp.float32) -> HerReplayState:
    base = replay_init(capacity, n_envs, obs_dim, act_dim, dtype)
    z3 = jnp.zeros((capacity, n_envs, 3), dtype)
    return HerReplayState(
        obs=base.obs, next_obs=base.next_obs, actions=base.actions,
        rewards=base.rewards, dones=base.dones, pos=base.pos, full=base.full,
        veh_pos=z3, veh_att=z3, veh_pos_next=z3, veh_att_next=z3, goal=z3,
        episode_id=jnp.zeros((capacity, n_envs), jnp.int32))


class _HerMixin:
    """Overrides the off-policy replay hooks with goal-aware storage and
    hindsight relabeling.  Knobs: n_sampled_goal (SB3 default 4, sets the
    relabel probability k/(k+1)), her_horizon (max future-goal offset;
    None = the episode cap `max_timesteps`, matching SB3's 'future'
    strategy which samples to episode end, her_replay_buffer.py:41 —
    same-episode masking truncates at the actual episode boundary either
    way, so a finite horizon only biases sampling toward nearer goals)."""

    n_sampled_goal: int = 4
    her_horizon: int | None = None

    @property
    def _her_offset_cap(self) -> int:
        if self.her_horizon is not None:
            return self.her_horizon
        return int(self.core.config.max_timesteps)

    def _init_replay(self, n_act=None):
        assert self.core.config.reward_set == 1, (
            "HER's reward counterfactual implements the reward_set=1 goal "
            "terms only (docking3d.py:560-607); reward_set=2 is unsupported")
        return her_replay_init(self.cfg.buffer_size // self.n_envs,
                               self.n_envs, self.core.n_observations,
                               n_act if n_act is not None else self.core.n_actions)

    # -- persistence of the HER knobs (not config fields) -----------------
    def _save_payload(self):
        d = super()._save_payload()
        d["her"] = {"n_sampled_goal": self.n_sampled_goal,
                    "her_horizon": self.her_horizon}
        return d

    def _pre_load(self, payload):
        super()._pre_load(payload)
        her = payload.get("her", {})
        self.n_sampled_goal = her.get("n_sampled_goal",
                                      type(self).n_sampled_goal)
        self.her_horizon = her.get("her_horizon", type(self).her_horizon)

    def _consume_ctor_kwargs(self, kwargs):
        if "n_sampled_goal" in kwargs:
            self.n_sampled_goal = kwargs.pop("n_sampled_goal")
        if "her_horizon" in kwargs:
            self.her_horizon = kwargs.pop("her_horizon")
        return super()._consume_ctor_kwargs(kwargs)

    def _replay_record(self, st, res, next_obs, scaled):
        rb: HerReplayState = st.replay
        p = rb.pos  # capture before replay_add advances the ring
        base = replay_add(rb, st.last_obs, next_obs, scaled, res.reward,
                          res.done.astype(jnp.float32))
        return base.replace(
            veh_pos=rb.veh_pos.at[p].set(st.env_states.vehicle[:, 0:3]),
            veh_att=rb.veh_att.at[p].set(st.env_states.vehicle[:, 3:6]),
            veh_pos_next=rb.veh_pos_next.at[p].set(res.info.position),
            veh_att_next=rb.veh_att_next.at[p].set(res.info.attitude),
            goal=rb.goal.at[p].set(st.env_states.goal),
            episode_id=rb.episode_id.at[p].set(st.env_states.episode),
        )

    # -- goal-dependent reward/obs pieces ------------------------------------
    def _goal_terms(self, position, attitude, goal):
        """Goal-dependent reward terms + nav errors for a pose batch."""
        cfg = self.core.config
        w = cfg.reward_factors
        from ..envs.core import log_precision
        from ..ops import geom

        diff = goal - position
        delta_d = jnp.linalg.norm(diff, axis=-1)
        delta_theta = attitude[..., 1] + geom.ssa(
            jnp.arctan2(diff[..., 2], jnp.linalg.norm(diff[..., :2], axis=-1)))
        delta_psi = geom.ssa(
            jnp.arctan2(diff[..., 1], diff[..., 0]) - attitude[..., 2])
        half_pi = jnp.pi / 2
        r = (-w.w_d * log_precision(delta_d, cfg.dist_goal_reached_tol,
                                    cfg.max_dist_from_goal)
             - w.w_delta_theta * (delta_theta / half_pi) ** 2
             - w.w_delta_psi * (delta_psi / jnp.pi) ** 2)
        reached = delta_d < cfg.dist_goal_reached_tol
        out = delta_d > cfg.max_dist_from_goal
        r = r + reached * w.w_goal + out * w.w_deltad_max
        return r, delta_d, delta_theta, delta_psi, reached, out

    def _relabel_obs(self, obs, position, attitude, goal):
        """Swap the goal-relative obs features 0..2 (docking3d.py:474-480)."""
        cfg = self.core.config
        _, dd, dth, dpsi, _, _ = self._goal_terms(position, attitude, goal)
        o0 = jnp.clip(
            1.0 - jnp.log(dd / cfg.max_dist_from_goal)
            / jnp.log(cfg.dist_goal_reached_tol / cfg.max_dist_from_goal),
            0.0, 1.0)
        o1 = jnp.clip(dth / (jnp.pi / 2), -1.0, 1.0)
        o2 = jnp.clip(dpsi / jnp.pi, -1.0, 1.0)
        return obs.at[..., 0].set(o0).at[..., 1].set(o1).at[..., 2].set(o2)

    def _sample_replay(self, rb: HerReplayState, key, batch_size):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        n_envs = rb.obs.shape[1]
        step_idx = jax.random.randint(k1, (batch_size,), 0, rb.size)
        env_idx = jax.random.randint(k2, (batch_size,), 0, n_envs)

        obs = rb.obs[step_idx, env_idx]
        actions = rb.actions[step_idx, env_idx]
        next_obs = rb.next_obs[step_idx, env_idx]
        rewards = rb.rewards[step_idx, env_idx]
        dones = rb.dones[step_idx, env_idx]

        # 'future' goals: a later slot in the same lane & episode
        offset = jax.random.randint(k3, (batch_size,), 1,
                                    self._her_offset_cap + 1)
        fut = step_idx + offset
        in_ring = fut < rb.size  # no wrap: wrapped slots are other episodes
        fut = jnp.clip(fut, 0, rb.capacity - 1)
        same_ep = rb.episode_id[fut, env_idx] == rb.episode_id[step_idx, env_idx]
        # same-lap guard: when one episode spans the whole ring, slots at or
        # past the write head belong to the PREVIOUS lap of the same episode
        # (older data) — a 'future' goal must come from the same lap
        same_lap = ~((step_idx < rb.pos) & (fut >= rb.pos))
        relabel = (jax.random.uniform(k4, (batch_size,))
                   < self.n_sampled_goal / (self.n_sampled_goal + 1.0))
        use_new = relabel & same_ep & in_ring & same_lap

        old_goal = rb.goal[step_idx, env_idx]
        new_goal = jnp.where(use_new[:, None],
                             rb.veh_pos_next[fut, env_idx], old_goal)

        pos_n = rb.veh_pos_next[step_idx, env_idx]
        att_n = rb.veh_att_next[step_idx, env_idx]
        # exact reward counterfactual: swap the goal-dependent terms
        r_old, *_ = self._goal_terms(pos_n, att_n, old_goal)
        r_new, _, _, _, reached_new, out_new = self._goal_terms(
            pos_n, att_n, new_goal)
        rewards = jnp.where(use_new, rewards - r_old + r_new, rewards)
        dones = jnp.where(use_new,
                          jnp.maximum(dones,
                                      (reached_new | out_new).astype(dones.dtype)),
                          dones)
        next_obs = jnp.where(
            use_new[:, None],
            self._relabel_obs(next_obs, pos_n, att_n, new_goal), next_obs)
        # the reset observation is all-zeros regardless of goal (reference
        # quirk, docking3d.py:327): relabeling its goal features would put it
        # off the observation manifold, so leave zero observations untouched
        nonzero_obs = jnp.any(obs != 0.0, axis=-1)
        obs = jnp.where(
            (use_new & nonzero_obs)[:, None],
            self._relabel_obs(obs, rb.veh_pos[step_idx, env_idx],
                              rb.veh_att[step_idx, env_idx], new_goal), obs)
        return obs, actions, next_obs, rewards, dones


class HerSAC(_HerMixin, SAC):
    def __init__(self, *args, n_sampled_goal: int = 4,
                 her_horizon: int | None = None,
                 **kwargs):
        self.n_sampled_goal = n_sampled_goal
        self.her_horizon = her_horizon
        super().__init__(*args, **kwargs)


class HerTD3(_HerMixin, TD3):
    def __init__(self, *args, n_sampled_goal: int = 4,
                 her_horizon: int | None = None,
                 **kwargs):
        self.n_sampled_goal = n_sampled_goal
        self.her_horizon = her_horizon
        super().__init__(*args, **kwargs)


class HerDDPG(_HerMixin, DDPG):
    def __init__(self, *args, n_sampled_goal: int = 4,
                 her_horizon: int | None = None,
                 **kwargs):
        self.n_sampled_goal = n_sampled_goal
        self.her_horizon = her_horizon
        super().__init__(*args, **kwargs)
