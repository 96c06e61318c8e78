"""DDPG = TD3 minus the tricks (reference ddpg/ddpg.py:102-118):
policy_delay=1, no target smoothing (noise clip 0), a single critic."""
from __future__ import annotations

from ..config.drl_hyperparams import DDPGConfig
from .td3 import TD3


class DDPG(TD3):
    config_cls = DDPGConfig  # policy_delay=1, no smoothing, n_critics=1
