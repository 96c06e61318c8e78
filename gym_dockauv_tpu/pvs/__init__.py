"""Vehicle-simulator periphery (the reference's vendored
python_vehicle_simulator beyond the REMUS-100 path already powering the
remus envs): guidance/control libraries, eight additional Fossen vehicle
models, and the standalone simulation harness — re-designed as pure
functional JAX (state in, state out; `lax.scan` sim loop; everything
vmappable for batched parameter studies).

Reference layout: python_vehicle_simulator/lib/{control,guidance,models,
mainLoop,plotTimeSeries}.py and vehicles/{DSRV,frigate,otter,ROVzefakkel,
semisub,shipClarke83,supply,tanker}.py.
"""
from .control import PIDState, dp_pole_placement, pid_pole_placement
from .guidance import ref_model3
from .models import clarke83
from .sim import simulate, plot_time_series
from .vehicles import (
    DSRV,
    Frigate,
    Otter,
    Remus100AP,
    ROVzefakkel,
    Semisub,
    ShipClarke83,
    Supply,
    Tanker,
    VEHICLES,
)

__all__ = [
    "PIDState", "pid_pole_placement", "dp_pole_placement", "ref_model3",
    "clarke83", "simulate", "plot_time_series",
    "DSRV", "Frigate", "Otter", "ROVzefakkel", "Semisub", "ShipClarke83",
    "Supply", "Tanker", "Remus100AP", "VEHICLES",
]
