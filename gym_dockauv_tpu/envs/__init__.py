from .core import DockingEnv, make_env
from .adapter import GymDockingEnv, VecDockingEnv, Box
from .types import EnvState, StepInfo, StepResult
from .scenarios import Scenario, sample_scenario

__all__ = [
    "DockingEnv",
    "make_env",
    "GymDockingEnv",
    "VecDockingEnv",
    "Box",
    "EnvState",
    "StepInfo",
    "StepResult",
    "Scenario",
    "sample_scenario",
]
