"""Streaming TTS latency check (real chip): time-to-first-audio of the
chunked vocoder stream vs vocoding the whole utterance at once, on a
full-cap (815-frame, ~10 s) synthetic mel at the flagship scale.

Run: python scripts/streaming_check.py [--chunk N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.audio.params import DEFAULT as P
from unast_tpu.infer.streaming import MelganStreamer
from unast_tpu.models import melgan as G

# 128 frames (1.6 s audio) per chunk: each window dispatch pays the
# ~27 ms tunnel latency floor, so smaller chunks lose to the full pass
# THROUGH THE TUNNEL (chunk 32 measured TTFA 151 ms vs full 74 ms); on
# directly-attached hardware much smaller chunks would win.
chunk = 128
if "--chunk" in sys.argv:
    chunk = int(sys.argv[sys.argv.index("--chunk") + 1])

params = G.melgan_init(jax.random.PRNGKey(0))
# 832 = 26 x 32-frame chunks (~10.4 s audio): a chunk multiple, so the
# full forward IS the streaming contract's reference directly
T = -(-815 // chunk) * chunk
mel = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (T, 80)),
                 np.float32)

full_fn = jax.jit(lambda p, m: G.melgan_forward(p, m))
np.asarray(full_fn(params, jnp.asarray(mel)[None]))  # warm
t0 = time.perf_counter()
full = np.asarray(full_fn(params, jnp.asarray(mel)[None]))[0]
t_full = time.perf_counter() - t0

s = MelganStreamer(params, P.hop_length, chunk=chunk)
s.warm()
t0 = time.perf_counter()
it = s.stream(mel)
first = next(it)
t_first = time.perf_counter() - t0
rest = [first] + list(it)
t_all = time.perf_counter() - t0

got = np.concatenate(rest)
np.testing.assert_allclose(got, full, rtol=2e-5, atol=2e-5)
audio_s = len(full) / P.sr
first_audio_s = len(first) / P.sr
print(f"utterance: {audio_s:.1f} s audio, chunk {chunk} frames "
      f"({first_audio_s:.2f} s audio per chunk)")
print(f"full vocode latency: {t_full * 1000:.1f} ms")
print(f"time-to-first-audio (stream): {t_first * 1000:.1f} ms "
      f"({t_full / t_first:.1f}x sooner)")
print(f"full stream time: {t_all * 1000:.1f} ms "
      f"(streaming RTF {t_all / audio_s:.4f})")
ok = t_first < t_full and t_all / audio_s < 0.05
print(f"GATE {'PASS' if ok else 'FAIL'} (first-chunk sooner than full "
      f"vocode AND streaming RTF < 0.05)")
sys.exit(0 if ok else 1)
