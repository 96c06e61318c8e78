"""env_checker + profiling utility tests."""
import numpy as np
import pytest

import jax.numpy as jnp

import gym_dockauv_tpu as gdt
from gym_dockauv_tpu.utils.env_checker import check_env
from gym_dockauv_tpu.utils.profiling import StepsPerSecond, checkify_step


@pytest.mark.parametrize("env_id", ["SimpleDocking3d-v0",
                                    "ObstaclesDocking3d-v0",
                                    "SimpleDocking3d_remus-v0"])
def test_check_env_passes(env_id):
    check_env(gdt.make(env_id))


def test_check_env_core_only():
    from gym_dockauv_tpu.envs.core import make_env

    check_env(make_env("CapsuleDocking3d-v0"))


def test_checkify_step_clean_and_poisoned():
    import jax

    core = gdt.make("SimpleDocking3d-v0").core
    state, _ = core.reset(jax.random.PRNGKey(0), 0)
    fn = checkify_step(core)
    err, (_, res) = fn(state, jnp.zeros(6))
    err.throw()  # clean step: no error
    assert np.all(np.isfinite(np.asarray(res.obs)))

    bad = state.replace(vehicle=state.vehicle.at[6].set(jnp.nan))
    err, _ = fn(bad, jnp.zeros(6))
    with pytest.raises(Exception):
        err.throw()


def test_steps_per_second():
    m = StepsPerSecond()
    import time

    time.sleep(0.01)
    rate = m.update(1000)
    assert rate > 0
