"""Audio hyperparameters.

Parity with reference `src/audio_parameters.py:1-20` (same derived values:
hop_length = int(22050*0.0125) = 275, win_length = int(22050*0.05) = 1102).
Expressed as a frozen dataclass so configs can override while the defaults
match the reference exactly.
"""

from dataclasses import dataclass


@dataclass(frozen=True)
class AudioParams:
    num_mels: int = 80
    n_fft: int = 2048
    sr: int = 22050
    preemphasis: float = 0.97
    frame_shift: float = 0.0125   # seconds
    frame_length: float = 0.05    # seconds
    power: float = 1.2            # magnitude exponent for Griffin-Lim
    min_level_db: int = -100
    ref_level_db: int = 20
    max_db: int = 100
    ref_db: int = 20
    n_iter: int = 60              # Griffin-Lim iterations
    gl_momentum: float = 0.0      # 0 = reference parity; ~0.99 = fast GL
    outputs_per_step: int = 1
    trim_top_db: float = 60.0     # librosa.effects.trim default
    trim_frame_length: int = 2048
    trim_hop_length: int = 512
    # Forward spectrogram engine for wav->mel/mag (analysis only; Griffin-Lim
    # keeps the complex FFT path). "dft_high": windowed DFT as two MXU
    # matmuls over the window's 1102-sample support, 3-pass-bf16 precision —
    # 2.1x the rfft path on v5e at max |mel err| 1.2e-4 in normalized units
    # (measured, scripts/dsp_probe.py; parity tolerance vs the reference
    # numpy path is 5e-4). "dft_highest": same at f32 precision, 1.5x at
    # 1.2e-6. "fft": XLA rfft (bit-identical legacy path).
    stft_mode: str = "dft_high"

    @property
    def hop_length(self) -> int:
        return int(self.sr * self.frame_shift)

    @property
    def win_length(self) -> int:
        return int(self.sr * self.frame_length)

    @property
    def n_freqs(self) -> int:
        return 1 + self.n_fft // 2

    def replace(self, **kw) -> "AudioParams":
        import dataclasses
        return dataclasses.replace(self, **kw)


DEFAULT = AudioParams()
