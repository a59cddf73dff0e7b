"""Model stack: functional networks with the reference's full capability
surface (UNAST facade, transformer + RNN backbones, discriminators, CBHG
vocoder), redesigned TPU-first (see networks.py / transformer.py / rnn.py
module docstrings for the reference file:line parity map)."""

from .config import ModelConfig, TINY, VOCAB_SIZE, PAD_IDX, SOS_IDX, EOS_IDX
from . import modules
from . import transformer
from . import rnn
from . import networks
from . import unast
from .unast import (
    unast_init,
    num_params,
    text_ae,
    speech_ae,
    cm_text_in,
    cm_speech_in,
    tts,
    asr,
    mlp_discriminator_init,
    mlp_discriminator,
    lstm_discriminator_init,
    lstm_discriminator,
    vocoder_init,
    vocoder,
)

__all__ = [
    "ModelConfig", "TINY", "VOCAB_SIZE", "PAD_IDX", "SOS_IDX", "EOS_IDX",
    "modules", "transformer", "rnn", "networks", "unast",
    "unast_init", "num_params",
    "text_ae", "speech_ae", "cm_text_in", "cm_speech_in", "tts", "asr",
    "mlp_discriminator_init", "mlp_discriminator",
    "lstm_discriminator_init", "lstm_discriminator",
    "vocoder_init", "vocoder",
]
