"""TPU-native RL learners.

This package re-creates the capabilities of the reference's vendored
stable-baselines3 1.5.0 (stable_baselines3/: PPO/SAC/A2C/TD3/DDPG/DQN + HER,
replay/rollout buffers, vec-env parallelism, Monitor/Logger) as idiomatic
JAX: policies are flax modules, rollout collection is a `lax.scan` over the
vmapped on-device env batch, and collection + optimization compile into a
single XLA program per iteration (Anakin-style) — no process farm, no
host<->device ping-pong per step.
"""
from .apg import APG
from .ppo import PPO
from .sac import SAC
from .a2c import A2C
from .td3 import TD3
from .ddpg import DDPG
from .dqn import DQN
from .her import HerDDPG, HerSAC, HerTD3
from .dict_obs import DictPPO, DictSAC, ObsSplit
from .sb3_io import from_sb3_zip, read_sb3_zip, to_sb3_zip

__all__ = ["APG", "PPO", "SAC", "A2C", "TD3", "DDPG", "DQN",
           "HerSAC", "HerTD3", "HerDDPG", "DictSAC", "DictPPO", "ObsSplit",
           "from_sb3_zip", "read_sb3_zip", "to_sb3_zip"]
