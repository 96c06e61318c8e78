"""DRL hyper-parameter sets.

Typed equivalents of the reference's kwargs dicts
(gym_dockauv/config/DRL_hyperparams.py:2-106).  Semantics follow SB3 1.5.0:
PPO MlpPolicy = separate [64,64] tanh pi/vf heads; SAC = [256,256] relu actor
and twin critics with auto entropy tuning.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    learning_rate: float = 3e-4
    n_steps: int = 2048  # rollout length per env between updates
    batch_size: int = 64
    n_epochs: int = 10
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    clip_range_vf: Optional[float] = None
    normalize_advantage: bool = True
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    target_kl: Optional[float] = None
    seed: Optional[int] = None
    net_arch: Tuple[int, ...] = (64, 64)
    log_std_init: float = 0.0
    tensorboard_log: Optional[str] = None
    # Off by default for SB3 parity (ActorCriticPolicy samples in RAW env
    # units).  True = the policy lives in [-1, 1] and actions are affinely
    # mapped to the env bounds — essential for envs with asymmetric bounds
    # like the REMUS rpm in [0, 1500], where a raw zero-centered Gaussian
    # never spins the propeller (policies.py squash_output analogue).
    scale_actions: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class SACConfig:
    learning_rate: float = 3e-4
    buffer_size: int = 1_000_000
    learning_starts: int = 100
    batch_size: int = 256
    tau: float = 0.005
    gamma: float = 0.99
    train_freq: int = 1
    train_freq_unit: str = "step"  # "step" | "episode" (sac.py:40 tuple form)
    gradient_steps: int = 1
    ent_coef: str | float = "auto"
    target_update_interval: int = 1
    target_entropy: str | float = "auto"
    seed: Optional[int] = None
    net_arch: Tuple[int, ...] = (256, 256)
    tensorboard_log: Optional[str] = None
    # TPU knob (no SB3 counterpart): collect/update cycles fused into one
    # jitted call — amortizes host->device dispatch without changing the
    # algorithm (train_freq/gradient_steps semantics apply per cycle).
    jit_iters: int = 1

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class A2CConfig:
    """SB3 A2C defaults (a2c/a2c.py:13-120): RMSprop(alpha .99, eps 1e-5),
    one gradient step over the whole 5-step rollout."""

    learning_rate: float = 7e-4
    n_steps: int = 5
    gamma: float = 0.99
    gae_lambda: float = 1.0
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    normalize_advantage: bool = False
    seed: Optional[int] = None
    net_arch: Tuple[int, ...] = (64, 64)
    log_std_init: float = 0.0
    tensorboard_log: Optional[str] = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TD3Config:
    """SB3 TD3 defaults (td3/td3.py:16-120).

    `train_freq_unit="episode"` activates SB3's episode-unit scheduling
    (TD3/DDPG default `train_freq=(1, "episode")`, td3/td3.py:73): collect
    whole episodes, then `gradient_steps` updates (-1 = one per env step
    collected, SB3's default pairing).  The SB3 ctor tuple form
    `train_freq=(1, "episode")` is accepted and mapped onto these two
    fields.  The default here stays step-based: it is the fused in-graph
    fast path; the episode path is host-driven (off_policy.py
    `_episode_iteration`)."""

    learning_rate: float = 1e-3
    buffer_size: int = 1_000_000
    learning_starts: int = 100
    batch_size: int = 100
    tau: float = 0.005
    gamma: float = 0.99
    train_freq: int = 1
    train_freq_unit: str = "step"  # "step" | "episode"
    gradient_steps: int = 1  # -1 (episode unit only): one per step collected
    policy_delay: int = 2
    target_policy_noise: float = 0.2
    target_noise_clip: float = 0.5
    action_noise_std: float = 0.0  # noise sigma (0 = no exploration noise)
    # "normal" = NormalActionNoise (noise.py:23-52); "ou" =
    # OrnsteinUhlenbeckActionNoise (noise.py:55-110) with theta/dt below
    # and per-env state carried in the learner state (reset on episode
    # done, off_policy_algorithm.py:615)
    action_noise_type: str = "normal"
    action_noise_theta: float = 0.15
    action_noise_dt: float = 1e-2
    seed: Optional[int] = None
    net_arch: Tuple[int, ...] = (400, 300)
    tensorboard_log: Optional[str] = None
    jit_iters: int = 1  # fused collect/update cycles per jitted call

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DDPGConfig(TD3Config):
    """DDPG = TD3 minus the tricks (ddpg/ddpg.py:102-113): no delayed policy,
    no target smoothing, single critic."""

    policy_delay: int = 1
    target_policy_noise: float = 0.1
    target_noise_clip: float = 0.0
    n_critics: int = 1


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    """SB3 DQN defaults (dqn/dqn.py:17-140)."""

    learning_rate: float = 1e-4
    buffer_size: int = 1_000_000
    learning_starts: int = 50_000
    batch_size: int = 32
    tau: float = 1.0
    gamma: float = 0.99
    train_freq: int = 4
    gradient_steps: int = 1
    target_update_interval: int = 10_000
    exploration_fraction: float = 0.1
    exploration_initial_eps: float = 1.0
    exploration_final_eps: float = 0.05
    max_grad_norm: float = 10.0
    seed: Optional[int] = None
    net_arch: Tuple[int, ...] = (64, 64)
    tensorboard_log: Optional[str] = None
    jit_iters: int = 1  # fused collect/update cycles per jitted call

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def PPO_HYPER_PARAMS_DEFAULT() -> PPOConfig:
    return PPOConfig()


def SAC_HYPER_PARAMS_DEFAULT() -> SACConfig:
    return SACConfig()


def PPO_HYPER_PARAMS_TEST() -> PPOConfig:
    """DRL_hyperparams.py:55-78: batch 8192, gamma 0.97, gae 0.90, tb logs."""
    return PPOConfig(batch_size=8192, gamma=0.97, gae_lambda=0.90, tensorboard_log="tb_logs")


def SAC_HYPER_PARAMS_TEST() -> SACConfig:
    """DRL_hyperparams.py:80-106: lr 1.5e-3, buffer 5e4, batch 100, tb logs."""
    return SACConfig(learning_rate=0.0015, buffer_size=50_000, batch_size=100,
                     tensorboard_log="tb_logs")
