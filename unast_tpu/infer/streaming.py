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
import jax.numpy as jnp
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


class StreamingCtcAsr:
    """Online (streaming) CTC ASR over a chunk-masked model
    (ModelConfig.ctc_chunk > 0; models/ctc.py::ctc_stream_step).

    Serving addition over the reference (whose only ASR decode consumes
    the COMPLETE utterance, src/network.py:440-458): mel frames are fed
    in fixed chunks as they arrive; each step runs ONE jitted encoder
    pass over the chunk with per-layer K/V caches of the last
    cfg.ctc_left chunks and emits the newly decoded tokens. The
    concatenated emissions EQUAL the one-shot greedy transcript of the
    same chunk-masked model (tested) — latency is bounded by the chunk
    size instead of the utterance length, and state is O(left * chunk)
    regardless of stream duration.

        s = StreamingCtcAsr(params, cfg)
        s.reset(batch_size=1)
        for mel_chunk in feed:          # [B, <=chunk, n_mels]
            new_ids = s.step(mel_chunk) # list of B lists of new tokens
        transcript = s.emitted[0]
    """

    def __init__(self, params, cfg):
        from .. import nn
        from ..models import ctc as CT
        assert cfg.ctc_chunk > 0 and cfg.ctc_left >= 0, (
            "StreamingCtcAsr needs a chunk-masked model "
            "(cfg.ctc_chunk > 0, ctc_left >= 0)")
        self.params = params
        self.cfg = cfg
        self._step = jax.jit(lambda p, carry, mel, valid: CT.ctc_stream_step(
            p, nn.Ctx.eval(), cfg, carry, mel, valid))
        self._init = CT.ctc_stream_init

    def reset(self, batch_size: int = 1):
        self.carry = self._init(self.params, self.cfg, batch_size)
        self._prev = np.full((batch_size,), -1, np.int64)
        self.emitted = [[] for _ in range(batch_size)]
        return self

    def warm(self):
        """Pre-compile the step at the reset batch size."""
        b = self._prev.shape[0]
        c, nm = self.cfg.ctc_chunk, self.cfg.num_mels
        self._step(self.params, self.carry,
                   jnp.zeros((b, c, nm), jnp.float32),
                   jnp.zeros((b, c), bool))
        return self

    def step(self, mel_chunk, n_valid=None):
        """Feed [B, t, n_mels] with t <= cfg.ctc_chunk (short final chunks
        are zero-padded and masked). n_valid: optional [B] per-row valid
        frame counts (default: all t frames). Returns the NEWLY emitted
        token ids per row; `self.emitted` accumulates the transcripts
        (capped at cfg.max_text_len, matching ctc_greedy_decode)."""
        from ..models.ctc import BLANK_ID
        mel_chunk = np.asarray(mel_chunk, np.float32)
        b, t = mel_chunk.shape[:2]
        c = self.cfg.ctc_chunk
        assert t <= c, (t, c)
        if n_valid is None:
            n_valid = np.full((b,), t, np.int64)
        if t < c:
            mel_chunk = np.pad(mel_chunk, ((0, 0), (0, c - t), (0, 0)))
        valid = np.arange(c)[None, :] < np.asarray(n_valid)[:, None]
        self.carry, _, tok = self._step(self.params, self.carry,
                                        jnp.asarray(mel_chunk),
                                        jnp.asarray(valid))
        tok = np.asarray(tok)
        new = [[] for _ in range(b)]
        cap = self.cfg.max_text_len
        for i in range(b):
            for f in range(int(n_valid[i])):
                k = tok[i, f]
                if k != BLANK_ID and k != self._prev[i] \
                        and len(self.emitted[i]) < cap:
                    new[i].append(int(k))
                    self.emitted[i].append(int(k))
                self._prev[i] = k
        return new


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
