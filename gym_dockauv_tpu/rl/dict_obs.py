"""Dict-observation support: DictReplay/DictRollout buffers + MultiInput nets.

Role of the reference's dict-observation machinery — ``DictReplayBuffer``
(stable_baselines3/common/buffers.py:478), ``DictRolloutBuffer``
(buffers.py:634) and the ``MultiInputPolicy`` / ``CombinedExtractor`` pair
(common/torch_layers.py:241-282, registered as "MultiInputPolicy" on every
algorithm) — which the reference ships but never exercises: the docking envs
emit flat 36-dim Boxes (docking3d.py:114-126), so no vendored code path ever
constructs a dict buffer.

TPU-native design: an observation *is* a pytree.  A dict observation is a
dict-of-arrays leaf layout, and every buffer operation is a
``jax.tree_util.tree_map`` — the same compiled scatter/gather the flat ring
buffer uses, once per leaf.  There is no special "dict" storage class the
way torch needs one; ``DictReplayState`` below is the flat ``ReplayState``
with pytree obs leaves, and XLA fuses the per-leaf ops.

The ``CombinedExtractor`` semantics match the reference: every subspace is
flattened and concatenated (torch_layers.py:269-278 — non-image Boxes get
``nn.Flatten``), in sorted-key order for determinism (torch dict iteration
order is insertion order; we normalise to sorted so save/load is stable).

``ObsSplit`` maps the docking env's flat native observation into a dict view
(e.g. ``{"nav": obs[0:16], "rays": obs[16:36]}`` — the boundary is the
reference's own proprio/radar split, docking3d.py:474-500) so the dict
pipeline runs on the real task: ``DictSAC``/``DictPPO`` store genuine dict
transitions and feed MultiInput networks, while the env scan keeps its
native flat observation.  ``goal_view`` builds the GoalEnv-style triple
(observation / achieved_goal / desired_goal) from an env state batch, the
surface SB3's HER wants (her/her_replay_buffer.py:41); our HER itself
relabels natively (rl/her.py) and does not need the dict detour.
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .buffers import ReplayState, replay_init
from .networks import MLP, SACActor, TwinQCritic, ActorCritic
from .ppo import PPO
from .sac import SAC


# ---------------------------------------------------------------------------
# flat <-> dict views
# ---------------------------------------------------------------------------
class ObsSplit:
    """Ordered slices of a flat observation vector, by key.

    ``spec`` maps key -> (start, stop) into the flat axis.  Keys are
    normalised to sorted order (the CombinedExtractor contract), and
    ``to_flat(to_dict(x)) == x`` holds whenever the slices partition
    [0, n) in sorted-key order.
    """

    def __init__(self, spec: Mapping[str, Tuple[int, int]]):
        self.spec: Dict[str, Tuple[int, int]] = {
            k: (int(a), int(b)) for k, (a, b) in sorted(spec.items())}

    def keys(self):
        return self.spec.keys()

    @property
    def sizes(self) -> Dict[str, int]:
        return {k: b - a for k, (a, b) in self.spec.items()}

    def to_dict(self, flat: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {k: flat[..., a:b] for k, (a, b) in self.spec.items()}

    def to_flat(self, d: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        return jnp.concatenate([d[k] for k in self.spec], axis=-1)

    def zeros(self, *batch) -> Dict[str, jnp.ndarray]:
        return {k: jnp.zeros(batch + (b - a,)) for k, (a, b) in self.spec.items()}


def docking_split(core) -> ObsSplit:
    """The natural dict view of the docking observation: proprio/nav block
    (docking3d.py:474-493, 16 features) + reduced radar rays (:494-500)."""
    from ..envs.core import N_OBS_WITHOUT_RADAR

    return ObsSplit({"nav": (0, N_OBS_WITHOUT_RADAR),
                     "rays": (N_OBS_WITHOUT_RADAR, core.n_observations)})


def goal_view(obs: jnp.ndarray, env_states) -> Dict[str, jnp.ndarray]:
    """GoalEnv-style dict (gym.GoalEnv, the surface HER consumes in SB3):
    achieved_goal = vehicle position, desired_goal = the docking point."""
    return {"observation": obs,
            "achieved_goal": env_states.vehicle[..., 0:3],
            "desired_goal": env_states.goal}


# ---------------------------------------------------------------------------
# MultiInput networks (CombinedExtractor -> standard heads)
# ---------------------------------------------------------------------------
class CombinedExtractor(nn.Module):
    """Concat feature extractor for 1-D Box subspaces (torch_layers.py:241-282).

    Accepts a dict observation whose entries are 1-D feature vectors
    (under arbitrary shared leading batch axes) and concatenates them in
    sorted-key order — the exact shape family ``ObsSplit`` produces.
    Multi-dim subspaces would need a per-key flatten against a known
    space spec (SB3 keys it off the Space), which no env in this task
    family has; ``cnn_keys`` / image handling is likewise deliberately
    absent — the reference's envs have no image subspaces, and the
    NatureCNN branch is dead code there.
    """

    @nn.compact
    def __call__(self, obs: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        # every subspace here is a 1-D Box feature vector (possibly under
        # arbitrary leading batch axes); concat along the feature axis
        return jnp.concatenate([obs[k] for k in sorted(obs.keys())], axis=-1)


def _as_dict(obs, split: ObsSplit):
    """Accept either the native flat observation or an already-split dict —
    the MultiInput nets sit behind hooks that see both."""
    return obs if isinstance(obs, Mapping) else split.to_dict(obs)


class MultiInputSACActor(nn.Module):
    """SAC "MultiInputPolicy" actor: CombinedExtractor + the standard
    squashed-Gaussian heads (sac/policies.py:26-120 with CombinedExtractor)."""

    n_actions: int
    split: ObsSplit
    net_arch: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        feat = CombinedExtractor(name="extractor")(_as_dict(obs, self.split))
        return SACActor(self.n_actions, self.net_arch, name="head")(feat)


class MultiInputTwinQCritic(nn.Module):
    n_actions: int  # unused; kept for symmetric construction
    split: ObsSplit = None
    net_arch: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, obs, action):
        feat = CombinedExtractor(name="extractor")(_as_dict(obs, self.split))
        return TwinQCritic(self.net_arch, name="head")(feat, action)


class MultiInputActorCritic(nn.Module):
    """PPO/A2C "MultiInputPolicy": CombinedExtractor + ActorCritic heads."""

    n_actions: int
    split: ObsSplit
    net_arch: Tuple[int, ...] = (64, 64)
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs):
        feat = CombinedExtractor(name="extractor")(_as_dict(obs, self.split))
        return ActorCritic(self.n_actions, self.net_arch, self.log_std_init,
                           name="head")(feat)

    def value(self, obs):
        return self(obs)[2]


# ---------------------------------------------------------------------------
# Dict replay buffer (DictReplayBuffer role, buffers.py:478)
# ---------------------------------------------------------------------------
@struct.dataclass
class DictReplayState(ReplayState):
    """ReplayState whose obs/next_obs leaves are dict pytrees.  All base
    helpers that touch only actions/rewards/dones/pos keep working; the
    capacity/size properties read the first obs leaf."""

    @property
    def capacity(self) -> int:  # first leaf of the obs pytree
        return jax.tree_util.tree_leaves(self.obs)[0].shape[0]


def dict_replay_init(capacity: int, n_envs: int, split: ObsSplit,
                     act_dim: int, dtype=jnp.float32) -> DictReplayState:
    base = replay_init(capacity, n_envs, 1, act_dim, dtype)
    obs0 = {k: jnp.zeros((int(capacity), n_envs, d), dtype)
            for k, d in split.sizes.items()}
    return DictReplayState(
        obs=obs0, next_obs=jax.tree_util.tree_map(jnp.copy, obs0),
        actions=base.actions, rewards=base.rewards, dones=base.dones,
        pos=base.pos, full=base.full)


def dict_replay_add(rb: DictReplayState, obs, next_obs, action, reward,
                    done) -> DictReplayState:
    p = rb.pos
    set_at = lambda buf, x: buf.at[p].set(x)  # noqa: E731
    return rb.replace(
        obs=jax.tree_util.tree_map(set_at, rb.obs, obs),
        next_obs=jax.tree_util.tree_map(set_at, rb.next_obs, next_obs),
        actions=rb.actions.at[p].set(action),
        rewards=rb.rewards.at[p].set(reward),
        dones=rb.dones.at[p].set(done),
        pos=(p + 1) % rb.capacity,
        full=rb.full | (p + 1 >= rb.capacity),
    )


def dict_replay_sample(rb: DictReplayState, key: jax.Array, batch_size: int):
    """Uniform (step, env) sample; obs legs come back as dicts."""
    k1, k2 = jax.random.split(key)
    n_envs = rb.actions.shape[1]
    step_idx = jax.random.randint(k1, (batch_size,), 0, rb.size)
    env_idx = jax.random.randint(k2, (batch_size,), 0, n_envs)
    gather = lambda buf: buf[step_idx, env_idx]  # noqa: E731
    return (
        jax.tree_util.tree_map(gather, rb.obs),
        rb.actions[step_idx, env_idx],
        jax.tree_util.tree_map(gather, rb.next_obs),
        rb.rewards[step_idx, env_idx],
        rb.dones[step_idx, env_idx],
    )


# ---------------------------------------------------------------------------
# Dict rollout storage (DictRolloutBuffer role, buffers.py:634)
# ---------------------------------------------------------------------------
def dict_rollout_init(n_steps: int, n_envs: int, split: ObsSplit,
                      act_dim: int, dtype=jnp.float32):
    """(T, N, .) rollout legs with dict obs — the on-policy counterpart.
    GAE and minibatching operate on the non-obs legs and tree_map over the
    obs leaves, exactly like the replay path above."""
    return {
        "obs": {k: jnp.zeros((n_steps, n_envs, d), dtype)
                for k, d in split.sizes.items()},
        "actions": jnp.zeros((n_steps, n_envs, act_dim), dtype),
        "rewards": jnp.zeros((n_steps, n_envs), dtype),
        "dones": jnp.zeros((n_steps, n_envs), dtype),
        "values": jnp.zeros((n_steps, n_envs), dtype),
        "log_probs": jnp.zeros((n_steps, n_envs), dtype),
    }


def dict_rollout_add(roll, t, obs, action, reward, done, value, log_prob):
    set_t = lambda buf, x: buf.at[t].set(x)  # noqa: E731
    return {
        "obs": jax.tree_util.tree_map(set_t, roll["obs"], obs),
        "actions": roll["actions"].at[t].set(action),
        "rewards": roll["rewards"].at[t].set(reward),
        "dones": roll["dones"].at[t].set(done),
        "values": roll["values"].at[t].set(value),
        "log_probs": roll["log_probs"].at[t].set(log_prob),
    }


# ---------------------------------------------------------------------------
# Dict-obs algorithms
# ---------------------------------------------------------------------------
class _DictPredictMixin:
    """Accept dict observations on the SB3 predict surface
    (base_class.py:601-648 with MultiInputPolicy): a dict obs is flattened
    through the split before the standard path.  Also persists the split
    spec through save()/load() — load() rebuilds via BaseAlgorithm.__init__
    (skipping the Dict* __init__), so without the payload round-trip a
    custom split would silently fall back to ``docking_split`` and slice
    features differently than the net was trained with."""

    def predict(self, observation, state=None, episode_start=None,
                deterministic: bool = False):
        if isinstance(observation, Mapping):
            observation = self._obs_split.to_flat(
                {k: jnp.asarray(v) for k, v in observation.items()})
        return super().predict(observation, state, episode_start,
                               deterministic)

    def _save_payload(self):
        payload = super()._save_payload()
        payload["obs_split_spec"] = dict(self._obs_split.spec)
        return payload

    def _pre_load(self, payload) -> None:
        super()._pre_load(payload)
        spec = payload.get("obs_split_spec")
        if spec is not None:
            self._obs_split = ObsSplit(spec)


class DictSAC(_DictPredictMixin, SAC):
    """SAC with MultiInputPolicy + DictReplayBuffer semantics.

    The env scan keeps the native flat observation (the docking envs are
    flat-Box, docking3d.py:114-126); transitions are split into the dict
    view at record time, the replay genuinely stores dict pytrees on
    device, samples come back as dicts, and the MultiInput networks
    consume them through the CombinedExtractor.  With the default
    ``docking_split`` the extractor's concat reproduces the flat vector,
    so learning dynamics match flat SAC exactly — the point is the code
    path, which a truly-dict env would use as-is.
    """

    _obs_split: ObsSplit | None = None  # class default: load() skips __init__

    def __init__(self, *args, obs_split: ObsSplit | None = None, **kwargs):
        self._obs_split = obs_split
        super().__init__(*args, **kwargs)

    def _setup_model(self) -> None:
        if self._obs_split is None:
            self._obs_split = docking_split(self.core)
        super()._setup_model()

    @property
    def obs_split(self) -> ObsSplit:
        return self._obs_split

    def _build_networks(self):
        cfg = self.cfg
        self.actor = MultiInputSACActor(self.core.n_actions, self._obs_split,
                                        tuple(cfg.net_arch))
        self.critic = MultiInputTwinQCritic(self.core.n_actions,
                                            self._obs_split,
                                            tuple(cfg.net_arch))

    def _init_replay(self, n_act=None):
        return dict_replay_init(
            self.cfg.buffer_size // self.n_envs, self.n_envs,
            self._obs_split,
            n_act if n_act is not None else self.core.n_actions)

    def _replay_record(self, st, res, next_obs, scaled):
        sp = self._obs_split
        return dict_replay_add(st.replay, sp.to_dict(st.last_obs),
                               sp.to_dict(next_obs), scaled, res.reward,
                               res.done.astype(jnp.float32))

    def _sample_replay(self, rb, key, batch_size):
        return dict_replay_sample(rb, key, batch_size)


class DictPPO(_DictPredictMixin, PPO):
    """PPO with a MultiInputPolicy (CombinedExtractor + AC heads).

    The rollout scan carries the native flat observation and the network
    splits it per call — on TPU the dict view is a zero-copy slice inside
    the fused program, so (unlike torch) carrying flat + splitting in-graph
    and storing dicts are the same compiled code; ``dict_rollout_*`` above
    is provided (and tested) for envs whose native observation is a dict.
    """

    _obs_split: ObsSplit | None = None  # class default: load() skips __init__

    def __init__(self, *args, obs_split: ObsSplit | None = None, **kwargs):
        self._obs_split = obs_split
        super().__init__(*args, **kwargs)

    def _setup_model(self) -> None:
        if self._obs_split is None:
            self._obs_split = docking_split(self.core)
        super()._setup_model()

    @property
    def obs_split(self) -> ObsSplit:
        return self._obs_split

    def _build_networks(self):
        cfg = self.cfg
        self.net = MultiInputActorCritic(self.core.n_actions, self._obs_split,
                                         tuple(cfg.net_arch),
                                         cfg.log_std_init)
