"""Streaming TTS: emit waveform chunks before the whole utterance is
vocoded.

Serving addition over the reference (batch-only synthesis via its eval
dump scripts): the MelGAN generator (models/melgan.py) is fully
convolutional, so output chunk [t0, t1) depends only on mel frames
[t0 - R, t1 + R) for a fixed receptive field R. Vocoding a context
window and keeping the interior reproduces the full forward EXACTLY,
PROVIDED window edges either lie >= R frames inside the sequence or
coincide with the sequence's true edges — a window must be a true slice
(convolution same-padding zeros only match at real sequence edges;
zero-padding a window beyond the sequence injects bias-propagated
activations the full forward never sees, measured as ~3e-2 edge error).
So windows are truncated at the sequence boundaries, giving at most
three compiled shapes (first / interior / last).

Contract: concatenated chunks == melgan_forward(mel zero-padded to a
chunk multiple), truncated to T*hop samples. That padded form is the
natural serving semantic — the FastSpeech NAR front end already emits
zero-padded fixed-cap mels cut at the predicted length.

With the NAR front end the mel for a whole utterance arrives in one fast
pass (bench: 866 utt/s batched), so the vocoder chunk loop bounds
time-to-first-audio: the first chunk is ready after one small window
instead of the whole utterance (scripts/streaming_check.py measures it).

RECEPTIVE_FIELD: the generator's total one-sided context in mel frames —
pre-conv k7 (3) + per-stage dilated resblocks mapped back through the
upsampling (stage 1 dominates: (1+3+9)*2*2 samples at x5 => ~11 frames)
+ post conv; 24 frames is a safe over-approximation (test_streaming.py
asserts exactness at this margin and failure at ctx=1, so the bound is
meaningful)."""

from typing import Iterator

import jax
import numpy as np

from ..models import melgan as G

RECEPTIVE_FIELD = 24  # one-sided, mel frames (see module docstring)


class MelganStreamer:
    """Warm-compiled chunked mel->wav streaming. Each step vocodes a
    boundary-truncated context window and emits the interior chunk*hop
    samples; at most three window shapes compile."""

    def __init__(self, params, hop: int, chunk: int = 32,
                 ctx: int = None, n_mels: int = 80):
        self.params = params
        self.hop = hop
        self.chunk = chunk
        # MRF (HiFi-GAN) generators have a wider receptive field than
        # MelGAN's; derive the safe context from the tree by default.
        self.ctx = G.receptive_field(params) if ctx is None else ctx
        self.n_mels = n_mels
        self._fn = jax.jit(lambda p, win: G.generator_forward(p, win)[0])

    def warm(self, t_total: int = None):
        """Pre-compile the window shapes for a t_total-frame stream
        (default: all three generic shapes)."""
        c, x = self.chunk, self.ctx
        for w in {c, c + x, c + 2 * x}:
            self._fn(self.params,
                     np.zeros((1, w, self.n_mels), np.float32))

    def stream(self, mel) -> Iterator[np.ndarray]:
        """mel: [T, n_mels] -> yields np.float32 chunks; concatenation ==
        melgan_forward(mel zero-padded to a chunk multiple)[: T*hop]."""
        mel = np.asarray(mel, np.float32)
        t_total = mel.shape[0]
        t_pad = -(-t_total // self.chunk) * self.chunk
        padded = np.zeros((t_pad, self.n_mels), np.float32)
        padded[:t_total] = mel
        emitted = 0
        for t0 in range(0, t_pad, self.chunk):
            t1 = t0 + self.chunk
            a = max(0, t0 - self.ctx)
            b = min(t_pad, t1 + self.ctx)
            wav = np.asarray(self._fn(self.params, padded[None, a:b]))
            lo = (t0 - a) * self.hop
            out = wav[lo:lo + self.chunk * self.hop]
            take = min(len(out), t_total * self.hop - emitted)
            if take <= 0:
                break
            emitted += take
            yield out[:take]


def stream_tts(syn, text: str, chunk: int = 32,
               ctx: int = None) -> Iterator[np.ndarray]:
    """End-to-end streaming TTS through a Synthesizer configured with
    nar_pv (one-pass mel) + melgan_params: yields waveform chunks.
    Time-to-first-audio = one NAR pass + ONE vocoder window instead of
    the whole utterance."""
    if syn.melgan_params is None:
        raise ValueError("stream_tts needs Synthesizer(melgan_params=...)")
    mel = syn.tts_mels([text])[0]
    streamer = MelganStreamer(syn.melgan_params, syn.audio_params.hop_length,
                              chunk=chunk, ctx=ctx)
    yield from streamer.stream(mel)
