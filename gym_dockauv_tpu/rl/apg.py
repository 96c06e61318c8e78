"""APG — Analytic Policy Gradients through the differentiable environment.

A TPU-native capability with NO reference counterpart: the reference stack
(gym_dockauv + vendored SB3, torch) treats the simulator as a black box,
while here every env step is a differentiable JAX program, so a policy can
be trained by backpropagation-through-time over full rollouts (pathwise /
first-order gradients, in the BPTT-for-control tradition of difftaichi /
Brax's APG trainers).  On the REMUS obstacle scenarios this solves
precision-docking regimes where the model-free learners plateau
(docs/performance.md "ObstaclesCurrent remus" study).

Design notes, each a measured failure mode of the naive setup
(scripts/remus_apg.py chronicles the experiments):

- Per-instance gradients (`vmap(value_and_grad)`), non-finite-instance
  masking, and per-instance norm clipping: with a few hundred BPTT steps,
  at least one instance per batch hits a gradient-singular geometry event
  (inf gradient with a finite loss).  A grad-of-mean would go non-finite
  every iteration; sanitize-to-zero would then freeze Adam permanently.
- Masked rows are sanitized BEFORE the batch contraction (0*inf = NaN).
- Observations are detached by default (`obs_grad="none"`): gradients flow
  through the state chain only.  Differentiating through the observation
  head NaNs past ~150 steps (a `_nav_errors` singularity); detached-obs
  pathwise gradients are NaN-free at any horizon and still train feedback.
- Pre-tanh L2 (`act_reg`) keeps the policy head out of saturation; without
  it the head drifts to |pre|~13, tanh' = 0, and learning freezes.
- The default cost is a smooth first-passage objective with episode
  semantics: softmin over time of (distance + pen_weight * dead), where
  `dead` is a sigmoid of the RUNNING MINIMUM of the obstacle-shell SDF —
  "did you ever cross" — lagged one step because `goal_reached` and
  `collision` latch on the same env step (envs/core.py conditions).
  A per-step survival product instead punishes the sustained shell
  proximity that docking on these scenarios IS.
- Adam b2=0.99 and a pre-Adam global clip: one gradient spike at b2=0.999
  poisons the second moment for thousands of iterations.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import rays
from .base import BaseAlgorithm
from .common import EpisodeStats


class APGRollout(NamedTuple):
    """Per-step signals handed to the cost function (leading axis = time)."""

    delta_d: jnp.ndarray    # (H,) distance to goal
    sdf: jnp.ndarray        # (H,) min signed distance to all shells
    position: jnp.ndarray   # (H, 3) NED position
    reward: jnp.ndarray     # (H,) env reward (reporting; not in the cost)
    goal: jnp.ndarray       # (3,) goal position (broadcast convenience)


FAR_SDF = 1e3  # finite "no obstacle" sentinel: an inf sentinel makes the
# sigmoid/cummin backward pass produce NaN (0*inf) on obstacle-free
# scenarios, silently zeroing every batch gradient


def shell_sdf(state, position, safety_radius):
    """Min signed distance to every obstacle collision shell (capsules and
    spheres, shell = obstacle radius + vehicle safety radius) — 0 exactly
    where envs/core.py _collision fires."""
    # de-degenerate INVALID capsule slots (a == b == 0): the point-to-
    # segment backward pass divides by the segment length, and although
    # the validity mask zeroes the value, 0 * (NaN local derivative) = NaN
    # poisons the whole gradient (measured: every instance's grad NaN on
    # obstacle-free scenarios)
    valid = state.cap_valid[..., None]
    cap_b = jnp.where(valid, state.cap_b, state.cap_a + 1.0)
    dcap = rays.dist_segment_point(
        position[..., None, :], state.cap_a, cap_b)
    scap = dcap - state.cap_r - safety_radius
    scap = jnp.min(jnp.where(state.cap_valid, scap, FAR_SDF), axis=-1)
    dsph = jnp.linalg.norm(position[..., None, :] - state.sph_c, axis=-1)
    ssph = dsph - state.sph_r - safety_radius
    ssph = jnp.min(jnp.where(state.sph_valid, ssph, FAR_SDF), axis=-1)
    return jnp.minimum(jnp.minimum(scap, ssph), FAR_SDF)


@dataclasses.dataclass(frozen=True)
class APGConfig:
    horizon: int = 300            # BPTT rollout length (env steps)
    batch_size: int = 128         # fresh scenario instances per iteration
    learning_rate: float = 1e-3
    net_arch: tuple = (256, 256)
    act_reg: float = 1e-3         # pre-tanh L2 (anti-saturation)
    pen_weight: float = 20.0      # dead-penalty scale in the default cost
    sdf_scale: float = 0.1        # sigmoid sharpness of the dead penalty
    mean_d: float = 0.1           # dense mean-distance shaping weight
    tau: float = 0.3              # softmin temperature
    grad_clip: float = 1.0        # global clip before Adam
    instance_clip: float = 10.0   # per-instance grad-norm clip
    b2: float = 0.99
    obs_grad: str = "none"        # "none" | "full"
    lr_schedule: str = "constant"  # "constant" | "cosine"
    total_iters: int = 10000      # cosine schedule length (iterations)
    seed: Optional[int] = None
    tensorboard_log: Optional[str] = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class APGState(NamedTuple):
    params: list
    opt_state: tuple
    key: jnp.ndarray


class APG(BaseAlgorithm):
    """BPTT policy trainer over the differentiable env (module docstring).

    Extra constructor kwargs (not config fields):
      cost_fn: Callable[[APGRollout], (H,) cost]  — overrides the default
        first-passage cost; the surrounding loss (softmin + shaping +
        act_reg) is shared.
      action_low / action_high: override the trained action band (e.g. the
        REMUS fins' effective +/-0.52 rad actuator band: the in-dynamics
        saturation clip is gradient-dead outside it).
    """

    config_cls = APGConfig

    def __init__(self, policy="MlpPolicy", env=None, *, cost_fn=None,
                 action_low=None, action_high=None, **kw):
        self._cost_fn: Optional[Callable] = cost_fn
        self._low_override = action_low
        self._high_override = action_high
        super().__init__(policy, env, **kw)

    # -- model ---------------------------------------------------------------
    def _setup_model(self) -> None:
        cfg = self.cfg
        core = self.core
        low = jnp.asarray(self._low_override if self._low_override is not None
                          else core.action_low, jnp.float32)
        high = jnp.asarray(self._high_override
                           if self._high_override is not None
                           else core.action_high, jnp.float32)
        self._low, self._high = low, high
        obs_dim = int(core.n_observations)
        act_dim = int(low.shape[0])

        self.key, k_init = jax.random.split(self.key)
        sizes = (obs_dim, *cfg.net_arch, act_dim)
        params = []
        for i, (m, n) in enumerate(zip(sizes[:-1], sizes[1:])):
            k_init, k = jax.random.split(k_init)
            scale = 0.01 if i == len(sizes) - 2 else float(np.sqrt(2.0 / m))
            params.append((jax.random.normal(k, (m, n)) * scale,
                           jnp.zeros(n)))

        if cfg.lr_schedule == "cosine":
            lr = optax.cosine_decay_schedule(
                cfg.learning_rate, cfg.total_iters, alpha=0.1)
        else:
            lr = cfg.learning_rate
        self._opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                                optax.adam(lr, b2=cfg.b2))
        self.key, k_state = jax.random.split(self.key)
        self._state = APGState(params, self._opt.init(params), k_state)

    def _refresh_env_states(self) -> None:
        pass  # APG samples fresh instances every iteration; no env state

    # -- policy --------------------------------------------------------------
    def _mlp_pre(self, params, obs):
        x = obs
        for w, b in params[:-1]:
            x = jnp.tanh(x @ w + b)
        w, b = params[-1]
        return x @ w + b

    def _act(self, params, obs):
        raw = jnp.tanh(self._mlp_pre(params, obs))
        return self._low + (raw + 1.0) * 0.5 * (self._high - self._low)

    def _predict_fn(self, params, obs, deterministic, key):
        return jax.vmap(lambda o: self._act(params, o))(obs)

    def _inference_params(self):
        return self._state.params

    # -- loss ----------------------------------------------------------------
    def _default_cost(self, roll: APGRollout) -> jnp.ndarray:
        cfg = self.cfg
        dead = jax.nn.sigmoid(-jax.lax.cummin(roll.sdf) / cfg.sdf_scale)
        dead = jnp.concatenate([jnp.zeros((1,), dead.dtype), dead[:-1]])
        return roll.delta_d + cfg.pen_weight * dead

    def _instance_loss(self, params, state0, obs0):
        cfg = self.cfg
        core = self.core
        safety = jnp.asarray(core.config.safety_radius, jnp.float32)

        def body(carry, _):
            state, obs = carry
            if cfg.obs_grad == "none":
                obs_in = jax.lax.stop_gradient(obs)
            else:
                obs_in = obs
            pre = self._mlp_pre(params, obs_in)
            a = self._low + (jnp.tanh(pre) + 1.0) * 0.5 * (
                self._high - self._low)
            state, res = core.step(state, a)
            sdf = shell_sdf(state, res.info.position, safety)
            out = (res.info.delta_d, sdf, res.info.position, res.reward,
                   jnp.mean(pre ** 2), res.info.goal_reached,
                   res.info.collision, res.done,
                   res.info.cumulative_reward, res.info.cum_reward_arr)
            return (state, res.obs), out

        (_, _), (d, sdf, pos, rew, pre2, goal_hit, col_hit, done, cumr,
                 cum_arr) = \
            jax.lax.scan(body, (state0, obs0), None, length=cfg.horizon)
        roll = APGRollout(d, sdf, pos, rew, state0.goal)
        cost = (self._cost_fn or self._default_cost)(roll)
        soft_min = -cfg.tau * jax.nn.logsumexp(-cost / cfg.tau)
        loss = (soft_min + cfg.mean_d * jnp.mean(d)
                + cfg.act_reg * jnp.mean(pre2))
        # episode bookkeeping with latched done semantics (first done wins)
        ever_done = jnp.cumsum(done) > 0
        first = done & ~jnp.concatenate(
            [jnp.zeros((1,), bool), ever_done[:-1]])
        t_end = jnp.argmax(first)
        ended = jnp.any(first)
        stats = (ended,
                 cumr[t_end],
                 t_end + 1,
                 goal_hit[t_end] & ended,
                 col_hit[t_end] & ended,
                 cum_arr[t_end])
        return loss, stats

    # -- iteration -------------------------------------------------------------
    def _iteration(self, state: APGState, progress_remaining):
        cfg = self.cfg
        params, opt_state, key = state
        key, k_env = jax.random.split(key)
        keys = jax.random.split(k_env, cfg.batch_size)
        states0, obs0 = jax.vmap(self.core.reset)(
            keys, jnp.zeros((cfg.batch_size,), jnp.int32))

        (losses, stats), grads = jax.vmap(
            lambda s0, o0: jax.value_and_grad(
                self._instance_loss, has_aux=True)(params, s0, o0)
        )(states0, obs0)

        gnorm = jnp.sqrt(jax.tree_util.tree_reduce(
            jnp.add, jax.tree_util.tree_map(
                lambda x: jnp.sum(x ** 2, axis=tuple(range(1, x.ndim))),
                grads)))
        leaf_ok = jax.tree_util.tree_reduce(
            jnp.logical_and,
            jax.tree_util.tree_map(
                lambda x: jnp.all(jnp.isfinite(x),
                                  axis=tuple(range(1, x.ndim))), grads))
        ok = jnp.isfinite(losses) & leaf_ok
        n = jnp.maximum(jnp.sum(ok), 1)
        scale = jnp.where(
            ok, jnp.minimum(1.0, cfg.instance_clip / (gnorm + 1e-8)),
            0.0) / n
        g = jax.tree_util.tree_map(
            lambda x: jnp.tensordot(
                scale, jnp.where(jnp.isfinite(x), x, 0.0), axes=1), grads)
        g = self._pmean(g)
        loss = jnp.sum(jnp.where(ok, losses, 0.0)) / n
        updates, opt_state = self._opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)

        ended, rets, lens, goals, cols, cum = stats
        ep_stats = EpisodeStats(
            dones=ended[None, :], returns=rets[None, :],
            lengths=lens[None, :].astype(jnp.int32),
            goal_reached=goals[None, :], collision=cols[None, :],
            cum_reward_arr=cum[None, :, :])
        metrics = self._pmean({
            "loss": loss,
            "bad_grad_instances": jnp.sum(~ok).astype(jnp.float32),
            "grad_norm_median": jnp.median(jnp.where(ok, gnorm, jnp.nan)),
        })
        return APGState(params, opt_state, key), metrics, ep_stats

    @property
    def _steps_per_iteration(self) -> int:
        return self.cfg.horizon * self.cfg.batch_size

    # -- persistence -----------------------------------------------------------
    def _save_payload(self):
        return {
            "config": dataclasses.asdict(self.cfg),
            "params": self._state.params,
            "opt_state": self._state.opt_state,
            "action_low": np.asarray(self._low),
            "action_high": np.asarray(self._high),
        }

    def _pre_load(self, payload) -> None:
        # load() calls BaseAlgorithm.__init__ directly, bypassing
        # APG.__init__ — seed the ctor-only attributes first
        self._cost_fn = None
        self._low_override = payload.get("action_low")
        self._high_override = payload.get("action_high")

    def _consume_ctor_kwargs(self, kwargs):
        if "cost_fn" in kwargs:
            self._cost_fn = kwargs.pop("cost_fn")
        if "action_low" in kwargs:
            self._low_override = kwargs.pop("action_low")
        if "action_high" in kwargs:
            self._high_override = kwargs.pop("action_high")
        return kwargs

    def _load_payload(self, payload) -> None:
        self._low = jnp.asarray(payload["action_low"])
        self._high = jnp.asarray(payload["action_high"])
        params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        opt_state = payload.get("opt_state")
        if opt_state is None:
            opt_state = self._opt.init(params)
        else:
            opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
        self.key, k_state = jax.random.split(self.key)
        self._state = APGState(params, opt_state, k_state)
