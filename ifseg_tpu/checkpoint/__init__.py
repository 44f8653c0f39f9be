from .convert import convert_torch_state_dict, load_torch_checkpoint
from .manager import CheckpointManager

__all__ = ["convert_torch_state_dict", "load_torch_checkpoint", "CheckpointManager"]
