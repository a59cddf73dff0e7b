"""Reference-checkpoint compatibility: import torch UNAST checkpoints.

Lets a user of the reference implementation (Lucaskabela/UNAST) carry
trained weights into this framework: `torch_import.import_state_dict`
maps the reference's `model.state_dict()` (src/utils.py:139-163 save
format) into our functional param/state trees, for both backbones.
"""

from .torch_import import (import_state_dict, import_vocoder_state_dict,
                           load_reference_checkpoint)

__all__ = ["import_state_dict", "import_vocoder_state_dict",
           "load_reference_checkpoint"]
