"""Step-level parity: our functional env vs the actual reference env.

Strategy per SURVEY.md section 7: the reference consumes the global numpy RNG
during scenario generation, so instead of reproducing its RNG stream we let
the reference reset itself, read the sampled scenario back out of its
attributes, inject it into an EnvState, then drive both envs with identical
action sequences and compare observation / reward / done / delta_d at every
step.
"""
import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gym_dockauv_tpu as gdt
from gym_dockauv_tpu.envs.core import DockingEnv
from gym_dockauv_tpu.envs.scenarios import Scenario
from gym_dockauv_tpu.config.env_config import TRAIN_CONFIG, TRAIN_CONFIG_REMUS
from .reference_oracle import load_reference

load_reference()

import gym_dockauv.envs.docking3d as ref_dock  # noqa: E402
import gym_dockauv.envs.docking3d_remus as ref_dock_remus  # noqa: E402
from gym_dockauv.config.env_config import BASE_CONFIG as REF_BASE  # noqa: E402


def _ref_env(cls, tmp_path):
    cfg = copy.deepcopy(REF_BASE)
    cfg["save_path_folder"] = str(tmp_path)
    cfg["verbose"] = 0
    cfg["interval_datastorage"] = 10**9  # episode 1 still records in-memory
    return cls(cfg)


def _scenario_from_ref(env: DockingEnv, ref) -> Scenario:
    """Read the reference env's sampled scenario back into our schema."""
    K, S = env.config.max_capsules, env.config.max_spheres
    cap_a = np.zeros((K, 3))
    cap_b = np.zeros((K, 3))
    cap_r = np.ones(K)
    cap_valid = np.zeros(K, bool)
    for i, cap in enumerate(ref.capsules):
        cap_a[i] = cap.vec_bot
        cap_b[i] = cap.vec_top
        cap_r[i] = cap.radius
        cap_valid[i] = True
    dt = env.dtype
    j = lambda x: jnp.asarray(np.asarray(x), dtype=dt)
    return Scenario(
        goal=j(ref.goal_location),
        heading_goal=j(ref.heading_goal_reached),
        spawn_pos=j(ref.auv.position),
        spawn_att=j(ref.auv.attitude),
        v_c_init=j(ref.current.V_c),
        cur_v_min=j(ref.current.V_min),
        cur_v_max=j(ref.current.V_max),
        cur_alpha=j(ref.current.alpha),
        cur_beta=j(ref.current.beta),
        cap_a=j(cap_a),
        cap_b=j(cap_b),
        cap_r=j(cap_r),
        cap_valid=jnp.asarray(cap_valid),
        sph_c=jnp.zeros((S, 3), dt),
        sph_r=jnp.ones((S,), dt),
        sph_valid=jnp.zeros((S,), bool),
    )


def _drive_parity(ref, env: DockingEnv, n_steps, action_fn, obs_atol, rtol_note=""):
    scen = _scenario_from_ref(env, ref)
    state = env._state_from_scenario(scen, jax.random.PRNGKey(0), episode=1)
    step = jax.jit(env.step)
    rng = np.random.default_rng(123)
    for t in range(n_steps):
        a = action_fn(rng)
        obs_r, rew_r, done_r, info_r = ref.step(a.copy())
        state, res = step(state, jnp.asarray(a))
        np.testing.assert_allclose(
            np.asarray(res.obs), obs_r, atol=obs_atol,
            err_msg=f"obs mismatch t={t} {rtol_note}",
        )
        np.testing.assert_allclose(
            float(res.reward), rew_r, rtol=1e-7, atol=1e-8, err_msg=f"reward t={t}"
        )
        assert bool(res.done) == bool(done_r), f"done t={t}"
        np.testing.assert_allclose(
            float(res.info.delta_d), info_r["delta_d"], rtol=1e-7, atol=1e-9
        )
        assert [i for i in range(5) if np.asarray(res.info.conditions)[i]] == info_r["conditions_true"]
        if done_r:
            break


BLUEROV_CASES = [
    (ref_dock.SimpleDocking3d, "Simple"),
    (ref_dock.SimpleCurrentDocking3d, "SimpleCurrent"),
    (ref_dock.CapsuleDocking3d, "Capsule"),
    (ref_dock.CapsuleCurrentDocking3d, "CapsuleCurrent"),
    (ref_dock.ObstaclesDocking3d, "Obstacles"),
    (ref_dock.ObstaclesCurrentDocking3d, "ObstaclesCurrent"),
    (ref_dock.ObstaclesNoCapDocking3d, "ObstaclesNoCap"),
]


@pytest.mark.parametrize("ref_cls,kind", BLUEROV_CASES, ids=[k for _, k in BLUEROV_CASES])
def test_bluerov_env_step_parity(ref_cls, kind, tmp_path):
    ref = _ref_env(ref_cls, tmp_path)
    ref.reset(seed=42)
    env = DockingEnv(TRAIN_CONFIG(), family="bluerov", kind=kind, dtype=jnp.float64)
    # reference obs is float32-cast; compare at f32 resolution
    _drive_parity(
        ref, env, 120,
        lambda rng: rng.uniform(-1, 1, 6),
        obs_atol=2e-6,
    )


REMUS_CASES = [
    (ref_dock_remus.SimpleDocking3d_remus, "Simple"),
    (ref_dock_remus.SimpleCurrentDocking3d_remus, "SimpleCurrent"),
    (ref_dock_remus.CapsuleDocking3d_remus, "Capsule"),
    (ref_dock_remus.CapsuleCurrentDocking3d_remus, "CapsuleCurrent"),
    (ref_dock_remus.ObstaclesDocking3d_remus, "Obstacles"),
    (ref_dock_remus.ObstaclesCurrentDocking3d_remus, "ObstaclesCurrent"),
    (ref_dock_remus.ObstaclesNoCapDocking3d_remus, "ObstaclesNoCap"),
]


def _remus_ref_env(cls, tmp_path):
    cfg = copy.deepcopy(REF_BASE)
    cfg["save_path_folder"] = str(tmp_path)
    cfg["verbose"] = 0
    cfg["interval_datastorage"] = 10**9
    cfg["vehicle"] = "remus100"
    import gym_dockauv.config.env_config as ref_cfg_mod

    cfg["reward_factors"] = copy.deepcopy(ref_cfg_mod.TRAIN_CONFIG_remus["reward_factors"])
    return cls(cfg)


@pytest.mark.parametrize("ref_cls,kind", REMUS_CASES, ids=[k for _, k in REMUS_CASES])
def test_remus_env_step_parity(ref_cls, kind, tmp_path):
    ref = _remus_ref_env(ref_cls, tmp_path)
    ref.reset(seed=7)
    env = DockingEnv(TRAIN_CONFIG_REMUS(), family="remus", kind=kind, dtype=jnp.float64)

    def action(rng):
        return np.array(
            [rng.uniform(-10, 10), rng.uniform(-10, 10), rng.uniform(0, 1500)]
        )

    _drive_parity(ref, env, 80, action, obs_atol=2e-6)


def test_autoreset_and_vec_env():
    vec = gdt.make_vec("SimpleDocking3d-v0", num_envs=8, seed=3)
    obs = vec.reset()
    assert obs.shape == (8, 36) and np.all(obs == 0)
    saw_done = False
    rng = np.random.default_rng(0)
    for _ in range(60):
        acts = rng.uniform(-1, 1, size=(8, 6))
        obs, rews, dones, infos = vec.step(acts)
        assert obs.shape == (8, 36) and rews.shape == (8,)
        for i, d in enumerate(dones):
            if d:
                saw_done = True
                assert "terminal_observation" in infos[i]
                assert "episode" in infos[i]
                # post-reset obs is the reference's zero reset observation
                assert np.all(obs[i] == 0)
    # with random actions on a 20m boundary some env usually terminates;
    # if not, force one by checking t_steps growth instead
    assert saw_done or int(np.asarray(vec.states.t_steps).max()) == 60


def test_episode_counter_increments_on_autoreset():
    env = DockingEnv(TRAIN_CONFIG(), family="bluerov", kind="Simple", dtype=jnp.float64)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert int(state.episode) == 1
    # Drive the vehicle out of bounds fast to trigger done
    state = state.replace(vehicle=state.vehicle.at[0:3].set(jnp.asarray([100.0, 0, 0])))
    state, res = env.step_autoreset(state, jnp.zeros(6))
    assert bool(res.done)
    assert int(state.episode) == 2
    assert int(state.t_steps) == 0
    assert np.all(np.asarray(res.obs) == 0)
    assert np.asarray(res.info.terminal_observation).shape == (36,)


def test_disc_goal_constraints_matches_reference():
    """Parity for the (inactive) discrete goal-constraint bonus
    (docking3d.py:738-752)."""
    import numpy as np
    import jax.numpy as jnp

    from gym_dockauv_tpu.envs.core import disc_goal_constraints
    from .reference_oracle import load_reference

    load_reference()
    from gym_dockauv.envs.docking3d import Reward

    for x, x_des in [(0.1, 0.5), (0.5, 0.5), (2.0, 0.5), (0.39, 0.5)]:
        ours = float(disc_goal_constraints(jnp.asarray(x), jnp.asarray(x_des)))
        ref = float(Reward.disc_goal_constraints(np.asarray([x]),
                                                np.asarray([x_des]))[0])
        np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_reward_set2_env_parity(tmp_path):
    """The cont_goal_constraints reward path (reward_set=2,
    docking3d.py:560-607 alternate branch)."""
    cfg = copy.deepcopy(REF_BASE)
    cfg["save_path_folder"] = str(tmp_path)
    cfg["verbose"] = 0
    cfg["interval_datastorage"] = 10**9
    cfg["reward_set"] = 2
    ref = ref_dock.CapsuleDocking3d(cfg)
    ref.reset(seed=11)
    env = DockingEnv(TRAIN_CONFIG().replace(reward_set=2),
                     family="bluerov", kind="Capsule", dtype=jnp.float64)
    _drive_parity(ref, env, 80, lambda rng: rng.uniform(-1, 1, 6),
                  obs_atol=2e-6)


def test_lauv_env_parity(tmp_path):
    """LAUV as the configured vehicle (env_config.py:54 vehicle knob;
    LAUV.py fin-steered dynamics inside the full env loop)."""
    cfg = copy.deepcopy(REF_BASE)
    cfg["save_path_folder"] = str(tmp_path)
    cfg["verbose"] = 0
    cfg["interval_datastorage"] = 10**9
    cfg["vehicle"] = "LAUV"
    ref = ref_dock.SimpleDocking3d(cfg)
    ref.reset(seed=5)
    env = DockingEnv(TRAIN_CONFIG().replace(vehicle="LAUV"),
                     family="bluerov", kind="Simple", dtype=jnp.float64)
    assert env.n_actions == 3

    def action(rng):
        return rng.uniform(-1, -0.6, 3)

    # The LAUV model as parameterized in the reference is numerically
    # unstable from the env's random spawn attitudes: by the 3rd step BOTH
    # implementations overflow with bit-identical kinetics (presumably why
    # the reference registers no LAUV env).  Env-wiring parity is checked on
    # the finite prefix; deep dynamics parity lives in
    # test_trajectory_parity_lauv.
    _drive_parity(ref, env, 2, action, obs_atol=2e-6)


def test_bluerov2_direct_mode_b_matrix():
    """8-thruster mixing matrix parity (BlueROV2.py:53-72 'direct' mode)."""
    from gym_dockauv_tpu.dynamics.vehicles import build_bluerov2
    from gym_dockauv.objects.vehicles.BlueROV2 import BlueROV2 as RefBlueROV2

    ours = build_bluerov2(control_mode="direct", dtype=jnp.float64)
    ref = RefBlueROV2(control_mode="direct")
    np.testing.assert_allclose(np.asarray(ours.b0),
                               np.asarray(ref.B(np.zeros(6))), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.u_bound),
                               np.asarray(ref.u_bound), rtol=1e-12)


def test_timeout_boundary_parity(tmp_path):
    """Full-length episode: the t_steps >= max_timesteps done condition
    (docking3d.py:390,628 pre-increment check) must fire on the same step in
    both implementations.  max_timesteps is shrunk to 120 in BOTH configs so
    zero-thrust drift can't trip the bounds condition first — the
    pre-increment ordering under test is identical at any horizon."""
    ref = _ref_env(ref_dock.SimpleDocking3d, tmp_path)
    ref.reset(seed=21)
    ref.max_timesteps = 120  # reference reads self.max_timesteps (line 142)
    env = DockingEnv(TRAIN_CONFIG().replace(max_timesteps=120),
                     family="bluerov", kind="Simple", dtype=jnp.float64)
    scen = _scenario_from_ref(env, ref)
    state = env._state_from_scenario(scen, jax.random.PRNGKey(0), episode=1)
    step = jax.jit(env.step)
    a = np.zeros(6)
    done_at = None
    for t in range(env.config.max_timesteps + 5):
        obs_r, rew_r, done_r, info_r = ref.step(a.copy())
        state, res = step(state, jnp.asarray(a))
        assert bool(res.done) == bool(done_r), f"done mismatch t={t}"
        if done_r:
            done_at = t
            # both must flag the timeout condition (index 3: max
            # timesteps, docking3d.py:627-628)
            assert 3 in info_r["conditions_true"]
            assert bool(np.asarray(res.info.conditions)[3])
            np.testing.assert_allclose(float(res.reward), rew_r,
                                       rtol=1e-7, atol=1e-8)
            break
    # pre-increment check semantics: the episode runs max_timesteps+1 steps
    # (t_steps is incremented AFTER the done evaluation on the step where
    # the counter reaches the cap) — both implementations agree
    assert done_at == env.config.max_timesteps


def test_spawn_lerp_curriculum_knob():
    """spawn_lerp_min: default 1.0 reproduces the reference spawn exactly;
    <1.0 places the spawn on the goal->spawn segment with lam in
    [spawn_lerp_min, 1), never inside an obstacle's collision shell
    (training-only knob; docking3d_remus.py:908-914 is the true spawn)."""
    from gym_dockauv_tpu.envs.scenarios import sample_scenario
    from gym_dockauv_tpu.ops.rays import dist_segment_point

    true_spawn = np.array([-8.0, 0.0, 0.0])
    cfg = TRAIN_CONFIG_REMUS()
    for kind in ("Simple", "ObstaclesCurrent"):
        scen = sample_scenario(cfg, "remus", kind, jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(scen.spawn_pos), true_spawn)

    cfg_lerp = cfg.replace(spawn_lerp_min=0.2, spawn_lerp_max=0.7)
    for seed in range(24):
        scen = sample_scenario(
            cfg_lerp, "remus", "ObstaclesCurrent", jax.random.PRNGKey(seed)
        )
        goal = np.asarray(scen.goal)
        sp = np.asarray(scen.spawn_pos)
        # colinear: sp = goal + lam * (true_spawn - goal), same lam per axis
        denom = true_spawn - goal
        lam = (sp - goal) / denom
        np.testing.assert_allclose(lam, lam[0], rtol=1e-5)
        # lam inside the window, or pushed outward along the chord (up to
        # the reference spawn at lam=1) by the collision-shell fallback
        assert 0.2 - 1e-6 <= lam[0] <= 1.0 + 1e-6
        # never inside a capsule collision shell
        d = np.asarray(
            dist_segment_point(
                jnp.asarray(sp)[None, :], scen.cap_a, scen.cap_b
            )
        )
        shell = np.asarray(scen.cap_r) + cfg.safety_radius
        assert np.all(d[np.asarray(scen.cap_valid)] >
                      shell[np.asarray(scen.cap_valid)])


def test_spawn_kinematics_knobs():
    """spawn_speed / spawn_aim / spawn_clearance: defaults reproduce the
    reference rest-start exactly; set, they give a cruise-speed aimed
    start with shell clearance (training-only knobs, docs/parity.md)."""
    from gym_dockauv_tpu.envs.core import make_env
    from gym_dockauv_tpu.envs.scenarios import sample_scenario
    from gym_dockauv_tpu.ops.rays import dist_segment_point

    env0 = make_env("ObstaclesCurrentDocking3d_remus-v0")
    s0, _ = env0.reset(jax.random.PRNGKey(0))
    assert float(jnp.abs(s0.vehicle[6:12]).max()) == 0.0
    assert float(jnp.abs(s0.u_actual).max()) == 0.0

    cfg = TRAIN_CONFIG_REMUS().replace(
        spawn_lerp_min=0.05, spawn_lerp_max=0.35, spawn_clearance=0.5,
        spawn_speed=1.5, spawn_aim=True)
    env = DockingEnv(cfg, family="remus", kind="ObstaclesCurrent")
    for seed in range(8):
        st, _ = env.reset(jax.random.PRNGKey(seed))
        np.testing.assert_allclose(float(st.vehicle[6]), 1.5, rtol=1e-6)
        np.testing.assert_allclose(float(st.u_actual[2]), 1.5 / 2.5 * 1525,
                                   rtol=1e-6)
        # aimed: nav errors vanish at spawn (yaw = bearing, pitch cancels
        # elevation)
        pos, att = st.vehicle[:3], st.vehicle[3:6]
        diff = st.goal - pos
        import gym_dockauv_tpu.ops.geom as geom
        d_psi = float(geom.ssa(jnp.arctan2(diff[1], diff[0]) - att[2]))
        d_theta = float(att[1] + geom.ssa(
            jnp.arctan2(diff[2], jnp.linalg.norm(diff[:2]))))
        assert abs(d_psi) < 1e-5
        assert abs(d_theta) < 0.6  # exact unless the pitch clip engaged
        assert float(att[0]) == 0.0
        # clearance respected, unless the chord walk exhausted and fell
        # back to the (always reference-legal) true spawn
        d = np.asarray(dist_segment_point(pos[None, :], st.cap_a, st.cap_b))
        shell = np.asarray(st.cap_r) + cfg.safety_radius + 0.5
        valid = np.asarray(st.cap_valid)
        clear = np.all(d[valid] > shell[valid] - 1e-5)
        at_true_spawn = np.allclose(np.asarray(pos), [-8.0, 0.0, 0.0])
        assert clear or at_true_spawn


def test_center_radius_scale_knob():
    """center_radius_scale: default 1.0 reproduces the reference center
    capsule exactly; <1.0 shrinks ONLY the capsule radius — the goal's
    radial placement (capsule_r + safety_radius, docking3d.py:884-888)
    and the ring capsules are untouched (training-only knob)."""
    from gym_dockauv_tpu.envs.scenarios import (
        sample_scenario, _CAPSULE_RADIUS)

    cfg = TRAIN_CONFIG_REMUS()
    for seed in range(4):
        base = sample_scenario(
            cfg, "remus", "ObstaclesCurrent", jax.random.PRNGKey(seed))
        small = sample_scenario(
            cfg.replace(center_radius_scale=0.5), "remus",
            "ObstaclesCurrent", jax.random.PRNGKey(seed))
        assert float(base.cap_r[0]) == _CAPSULE_RADIUS
        assert float(small.cap_r[0]) == 0.5 * _CAPSULE_RADIUS
        # goal placement and everything else identical
        np.testing.assert_array_equal(np.asarray(base.goal),
                                      np.asarray(small.goal))
        np.testing.assert_array_equal(np.asarray(base.cap_r[1:]),
                                      np.asarray(small.cap_r[1:]))
        np.testing.assert_array_equal(np.asarray(base.cap_a),
                                      np.asarray(small.cap_a))
        # goal radius still on the TRUE shell: |goal_xy| = cap_r + safety
        assert abs(np.linalg.norm(np.asarray(small.goal)[:2])
                   - (_CAPSULE_RADIUS + cfg.safety_radius)) < 1e-5
