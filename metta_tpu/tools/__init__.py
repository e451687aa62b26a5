from metta_tpu.tools.evaluate import EvaluateTool
from metta_tpu.tools.play import PlayTool, ReplayTool
from metta_tpu.tools.tool import Tool, cli_entry
from metta_tpu.tools.train import PolicyConfig, TrainTool

__all__ = ["EvaluateTool", "PlayTool", "PolicyConfig", "ReplayTool", "Tool", "TrainTool", "cli_entry"]
