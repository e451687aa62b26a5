from metta_tpu.cogames.missions import make_mission, MISSIONS
from metta_tpu.cogames.scripted import ScriptedBaselineAgent, ScriptedUnclippingAgent

__all__ = ["MISSIONS", "ScriptedBaselineAgent", "ScriptedUnclippingAgent", "make_mission"]
