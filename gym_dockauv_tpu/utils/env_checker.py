"""Environment conformance checker.

Role of stable_baselines3/common/env_checker.py:291 `check_env`: validate
spaces, reset/step signatures, dtypes/bounds/finiteness — plus JAX-specific
checks the reference never needed: jit/vmap consistency (a vmapped batch of
identical envs must reproduce the single-env step bit-for-bit) and in-graph
auto-reset semantics (terminal observation surfaced, state re-sampled).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_env(env, skip_render_check: bool = True) -> None:
    """Raises AssertionError on any conformance violation.  Accepts a
    GymDockingEnv adapter or a DockingEnv core."""
    from ..envs.adapter import GymDockingEnv
    from ..envs.core import DockingEnv

    if isinstance(env, DockingEnv):
        _check_core(env)
        return
    assert isinstance(env, GymDockingEnv), f"unsupported env {type(env)}"

    # spaces
    assert env.observation_space.shape == (env.core.n_observations,)
    assert env.action_space.shape == (env.core.n_actions,)
    assert np.all(env.action_space.low < env.action_space.high)

    # reset contract (old-gym 0.21 API like the reference, docking3d.py:222)
    obs = env.reset(seed=0)
    assert isinstance(obs, np.ndarray) and obs.shape == env.observation_space.shape
    np.testing.assert_allclose(obs, 0.0, err_msg="initial obs must be zeros")
    obs2, info = env.reset(seed=0, return_info=True)
    assert isinstance(info, dict)

    # step contract
    action = env.action_space.sample()
    out = env.step(action)
    assert len(out) == 4, "step must return (obs, reward, done, info)"
    obs, reward, done, info = out
    assert obs.shape == env.observation_space.shape
    assert np.all(np.isfinite(obs)), "non-finite observation"
    assert isinstance(reward, float) and np.isfinite(reward)
    assert isinstance(done, bool)
    assert isinstance(info, dict)
    for key in ("episode_number", "t_step", "cumulative_reward",
                "conditions_true", "collision", "goal_reached", "delta_d"):
        assert key in info, f"info missing {key!r}"

    # obs bounds (lows: index 0 and rays >= 0; docking3d.py:119-125)
    low, high = env.core.observation_bounds()
    for _ in range(10):
        obs, *_ = env.step(env.action_space.sample())
        assert np.all(obs >= low - 1e-5) and np.all(obs <= high + 1e-5)

    _check_core(env.core)
    if not skip_render_check:
        env.render()


def _check_core(core) -> None:
    """jit/vmap consistency + auto-reset semantics on the functional core."""
    key = jax.random.PRNGKey(7)
    state, obs0 = core.reset(key, 0)
    action = jnp.zeros((core.n_actions,))

    s1, r1 = jax.jit(core.step)(state, action)
    n = 4
    batch_state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), state)
    sb, rb = jax.jit(jax.vmap(core.step))(
        batch_state, jnp.broadcast_to(action, (n, core.n_actions)))
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(rb.obs[i]), np.asarray(r1.obs), rtol=1e-6,
            err_msg="vmapped step diverges from single-env step")

    # auto-reset: force a terminal state (teleport out of bounds)
    far = state.replace(vehicle=state.vehicle.at[0].set(1e3))
    s2, r2 = jax.jit(core.step_autoreset)(far, action)
    assert bool(r2.done), "teleported env must terminate"
    np.testing.assert_allclose(np.asarray(r2.obs), 0.0,
                               err_msg="post-reset obs must be zeros")
    term = np.asarray(r2.info.terminal_observation)
    assert np.any(np.abs(term) > 0), "terminal_observation lost by auto-reset"
    assert int(s2.t_steps) == 0, "episode counter not reset"
