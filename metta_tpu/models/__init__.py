from metta_tpu.models.components import LSTMCore, MLP, PerceiverLatent, TokenEmbed
from metta_tpu.models.vit import ViTConfig, ViTPolicy

__all__ = ["LSTMCore", "MLP", "PerceiverLatent", "TokenEmbed", "ViTConfig", "ViTPolicy"]
