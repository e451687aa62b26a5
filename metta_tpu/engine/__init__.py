from metta_tpu.engine.compiler import CompiledConfig, compile_game
from metta_tpu.engine.env import MettaGridEnv, VecEnvState
from metta_tpu.engine.state import EnvState
from metta_tpu.engine.step import initial_observations, make_initial_state, step_env
from metta_tpu.engine.tables import Tables

__all__ = [
    "CompiledConfig", "EnvState", "MettaGridEnv", "Tables", "VecEnvState",
    "compile_game", "initial_observations", "make_initial_state", "step_env",
]
