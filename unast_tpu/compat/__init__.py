"""Reference-checkpoint compatibility: import torch UNAST checkpoints.

Two-way migration with the reference implementation (Lucaskabela/UNAST):
`torch_import` maps the reference's `model.state_dict()`
(src/utils.py:139-163 save format) into our functional param/state trees
(both backbones + the CBHG vocoder); `torch_export` is the exact inverse,
producing a state_dict the reference loads with strict=True.
"""

from .torch_import import (import_state_dict, import_vocoder_state_dict,
                           load_reference_checkpoint)
from .torch_export import export_state_dict, export_checkpoint

__all__ = ["import_state_dict", "import_vocoder_state_dict",
           "load_reference_checkpoint", "export_state_dict",
           "export_checkpoint"]
