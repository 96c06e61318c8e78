from .env_config import (
    BASE_CONFIG,
    MANUAL_CONFIG,
    PREDICT_CONFIG,
    REGISTRATION_DICT,
    TRAIN_CONFIG,
    TRAIN_CONFIG_REMUS,
    EnvConfig,
    RadarConfig,
    RewardFactors,
)
from .drl_hyperparams import (
    PPO_HYPER_PARAMS_DEFAULT,
    PPO_HYPER_PARAMS_TEST,
    SAC_HYPER_PARAMS_DEFAULT,
    SAC_HYPER_PARAMS_TEST,
    PPOConfig,
    SACConfig,
)

__all__ = [
    "BASE_CONFIG",
    "MANUAL_CONFIG",
    "PREDICT_CONFIG",
    "REGISTRATION_DICT",
    "TRAIN_CONFIG",
    "TRAIN_CONFIG_REMUS",
    "EnvConfig",
    "RadarConfig",
    "RewardFactors",
    "PPO_HYPER_PARAMS_DEFAULT",
    "PPO_HYPER_PARAMS_TEST",
    "SAC_HYPER_PARAMS_DEFAULT",
    "SAC_HYPER_PARAMS_TEST",
    "PPOConfig",
    "SACConfig",
]
