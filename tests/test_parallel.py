"""Mesh data-parallelism tests (8 virtual CPU devices from conftest)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_dockauv_tpu.parallel import make_mesh, shard_algorithm
from gym_dockauv_tpu.parallel.sharded import state_partition_specs
from gym_dockauv_tpu.rl import PPO, SAC

ENV = "SimpleDocking3d-v0"


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.size == 8
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh2 = make_mesh(8, model_parallel=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        make_mesh(6, model_parallel=4)


def test_partition_specs_structure():
    m = PPO(env=ENV, n_envs=8, n_steps=8, batch_size=8, seed=0)
    specs = state_partition_specs(m._state, "data")
    P = jax.sharding.PartitionSpec
    # env leaves sharded, param leaves replicated
    assert specs.last_obs == P("data")
    assert all(s == P("data") for s in jax.tree_util.tree_leaves(
        specs.env_states, is_leaf=lambda x: isinstance(x, P)))
    assert all(s == P() for s in jax.tree_util.tree_leaves(
        specs.params, is_leaf=lambda x: isinstance(x, P)))


def test_sharded_ppo_trains_and_is_deterministic():
    def run():
        m = PPO(env=ENV, n_envs=8, n_steps=16, batch_size=32, n_epochs=2,
                seed=5)
        shard_algorithm(m, n_devices=8)
        m.learn(total_timesteps=256)
        return jax.device_get(m._state.params)

    p1, p2 = run(), run()
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b)
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(p1))


def test_sharded_ppo_params_replicated_consistently():
    m = PPO(env=ENV, n_envs=8, n_steps=16, batch_size=32, n_epochs=1, seed=1)
    shard_algorithm(m, n_devices=4)
    m.learn(total_timesteps=128)
    leaf = jax.tree_util.tree_leaves(m._state.params)[0]
    # replicated output: every device shard holds the identical full array
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_allclose(s, shards[0])


def test_sharded_env_states_actually_sharded():
    m = SAC(env=ENV, n_envs=8, learning_starts=8, buffer_size=256,
            batch_size=32, seed=0)
    shard_algorithm(m, n_devices=8)
    vehicle = m._state.env_states.vehicle  # (8, 12)
    assert len(vehicle.addressable_shards) == 8
    assert vehicle.addressable_shards[0].data.shape == (1, 12)
    m.learn(total_timesteps=64)
    assert int(m._state.n_updates) > 0
    # replay sharded along env axis (axis 1)
    obs_shard = m._state.replay.obs.addressable_shards[0].data
    assert obs_shard.shape[1] == 1


def test_sharded_divisibility_guard():
    m = PPO(env=ENV, n_envs=6, n_steps=8, batch_size=8, seed=0)
    with pytest.raises(AssertionError):
        shard_algorithm(m, n_devices=4)


def test_jit_iters_step_accounting():
    m = SAC(env=ENV, n_envs=2, learning_starts=4, buffer_size=256,
            batch_size=8, jit_iters=4, seed=0)
    assert m._steps_per_iteration == 8  # train_freq(1) * n_envs(2) * 4
    m.learn(total_timesteps=16)
    assert m.num_timesteps == 16
    assert int(m._state.num_ts) == 16  # device counter agrees


def test_sharded_advantage_normalization_is_global():
    """Sharded PPO normalizes advantages with GLOBAL minibatch moments
    (pmean of moments), matching the unsharded torch-unbiased formula."""
    from jax.sharding import PartitionSpec as P

    from gym_dockauv_tpu.parallel.sharded import shard_map

    m = PPO(env=ENV, n_envs=8, n_steps=8, batch_size=16, seed=0)
    adv = jax.random.normal(jax.random.PRNGKey(3), (32,)) * 2.5 + 1.0
    expected = (adv - adv.mean()) / (adv.std(ddof=1) + 1e-8)

    m.axis_name = "data"
    mesh = make_mesh(4)
    fn = shard_map(m._normalize_advantages, mesh,
                   in_specs=(P("data"),), out_specs=P("data"))
    got = jax.jit(fn)(adv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-6, atol=1e-9)


def test_set_env_preserves_sharding():
    """set_env on a sharded learner must rebuild the shard_map'd iteration
    and re-place state on the mesh (ADVICE r1: a bare re-jit would hit an
    unbound pmean axis)."""
    from gym_dockauv_tpu.envs.core import make_env

    m = PPO(env=ENV, n_envs=8, n_steps=8, batch_size=16, n_epochs=1, seed=2)
    shard_algorithm(m, n_devices=8)
    m.learn(total_timesteps=64)
    m.set_env(make_env(ENV))
    assert m._iteration_jit is not None and m.axis_name == "data"
    # env states re-placed on the mesh
    assert len(m._state.env_states.vehicle.addressable_shards) == 8
    m.learn(total_timesteps=64, reset_num_timesteps=False)
    leaf = jax.tree_util.tree_leaves(m._state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_allclose(s, shards[0])
    assert all(np.all(np.isfinite(x))
               for x in jax.tree_util.tree_leaves(jax.device_get(m._state.params)))
