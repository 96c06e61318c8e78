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
    gradient_steps: int = 1
    ent_coef: str | float = "auto"
    target_update_interval: int = 1
    target_entropy: str | float = "auto"
    seed: Optional[int] = None
    net_arch: Tuple[int, ...] = (256, 256)
    tensorboard_log: Optional[str] = None

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
