from metta_tpu.sweep.core import Distribution, ParameterConfig, SweepParameters, make_sweep
from metta_tpu.sweep.protein import Protein
from metta_tpu.sweep.schedulers import AsyncCappedScheduler, GridSearchScheduler, JobDefinition

__all__ = [
    "AsyncCappedScheduler", "Distribution", "GridSearchScheduler",
    "JobDefinition", "ParameterConfig", "Protein", "SweepParameters", "make_sweep",
]
