"""Environment state & step-result pytrees.

The reference keeps episode state as mutable attributes spread across
`BaseDocking3d`, `AUVSim`, `Current`, `Radar` and Python lists of obstacle
objects (docking3d.py:48-218).  Here it is one flat `EnvState` pytree:
vmap-able, shardable over a device mesh, and checkpointable as a whole.
Obstacles use a fixed-capacity masked SoA encoding so all 14 scenarios
compile to the same program shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    # Vehicle
    vehicle: jnp.ndarray  # (12,) [eta, nu_r]
    u: jnp.ndarray  # (A,) last applied input (LPF state for Fossen family)
    u_actual: jnp.ndarray  # (3,) REMUS actuator state (zeros otherwise)
    state_dot: jnp.ndarray  # (12,) cached post-step derivative
    last_attitude: jnp.ndarray  # (3,)
    last_position: jnp.ndarray  # (3,)

    # Current (per-episode draw + GM process state)
    v_c: jnp.ndarray  # () Gauss-Markov speed state
    cur_v_min: jnp.ndarray  # ()
    cur_v_max: jnp.ndarray  # ()
    cur_alpha: jnp.ndarray  # ()
    cur_beta: jnp.ndarray  # ()
    nu_c: jnp.ndarray  # (6,) body-frame current used by the last step's obs

    # Goal
    goal: jnp.ndarray  # (3,)
    heading_goal: jnp.ndarray  # ()

    # Obstacles (masked SoA)
    cap_a: jnp.ndarray  # (K, 3) capsule bottom ends (vec_bot)
    cap_b: jnp.ndarray  # (K, 3) capsule top ends (vec_top)
    cap_r: jnp.ndarray  # (K,)
    cap_valid: jnp.ndarray  # (K,) bool
    sph_c: jnp.ndarray  # (S, 3)
    sph_r: jnp.ndarray  # (S,)
    sph_valid: jnp.ndarray  # (S,) bool

    # Bookkeeping
    t_steps: jnp.ndarray  # () int32, steps taken this episode
    episode: jnp.ndarray  # () int32
    cum_reward: jnp.ndarray  # ()
    cum_reward_arr: jnp.ndarray  # (13,)
    key: jax.Array  # PRNG key

    @property
    def position(self) -> jnp.ndarray:
        return self.vehicle[..., 0:3]

    @property
    def attitude(self) -> jnp.ndarray:
        return self.vehicle[..., 3:6]

    @property
    def eta(self) -> jnp.ndarray:
        return self.vehicle[..., 0:6]

    @property
    def relative_velocity(self) -> jnp.ndarray:
        return self.vehicle[..., 6:9]

    @property
    def angular_velocity(self) -> jnp.ndarray:
        return self.vehicle[..., 9:12]


@struct.dataclass
class StepInfo:
    """Array-typed equivalent of the reference step info dict
    (docking3d.py:396-408)."""

    episode_number: jnp.ndarray  # () int32
    t_step: jnp.ndarray  # () int32
    cumulative_reward: jnp.ndarray  # ()
    conditions: jnp.ndarray  # (5,) bool [goal, out_pos, out_att, max_t, collision]
    collision: jnp.ndarray  # () bool
    goal_reached: jnp.ndarray  # () bool
    delta_d: jnp.ndarray  # ()
    reward_arr: jnp.ndarray  # (13,) decomposed reward vector
    cum_reward_arr: jnp.ndarray  # (13,) episode-cumulative decomposition
    position: jnp.ndarray  # (3,) post-step position (pre-autoreset)
    attitude: jnp.ndarray  # (3,) post-step attitude (pre-autoreset)
    terminal_observation: jnp.ndarray  # (n_obs,) obs at the terminal state


@struct.dataclass
class StepResult:
    obs: jnp.ndarray  # (n_obs,) next observation (post-autoreset if enabled)
    reward: jnp.ndarray  # ()
    done: jnp.ndarray  # () bool
    info: StepInfo
