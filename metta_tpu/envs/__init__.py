from metta_tpu.envs.pettingzoo_env import PettingZooEnv

__all__ = ["PettingZooEnv"]
