"""Waveform synthesis CLIs.

Griffin-Lim vocoding of .mag.npy dumps — parity with src/gl_vocoder.py:10-34
(denormalize -> amplitude^1.2 -> griffinlim -> de-preemphasis -> trim ->
write wav @22050), on-device via the jitted audio pipeline; plus end-to-end
text -> mel -> wav synthesis using a trained model (capability the reference
spreads over three CLIs).

Usage:
  python -m unast_tpu.infer.synthesize --list_file x.csv --mels_dir d --out_dir o
"""

import argparse
import os
import wave

import numpy as np

from ..audio import dsp
from ..audio.params import DEFAULT
from ..data.dataset import load_manifest


def write_wav(path: str, wav_data: np.ndarray, sr: int = 22050):
    """PCM16 writer (no soundfile in this image). Accepts float in
    [-1, 1] or already-quantized int16 (the Synthesizer pcm16 path)."""
    if wav_data.dtype == np.int16:
        pcm = wav_data
    else:
        pcm = np.clip(wav_data, -1.0, 1.0)
        pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def vocode(list_file: str, mels_dir: str, out_dir: str, params=DEFAULT):
    """Per utterance: load .mag.npy -> mag_to_wav (device Griffin-Lim) ->
    write wav. Parity: src/gl_vocoder.py:10-34."""
    os.makedirs(out_dir, exist_ok=True)
    for fid, _ in load_manifest(list_file):
        mag = np.load(os.path.join(mels_dir, f"{fid}.mag.npy"))
        wav_data = dsp.mag_to_wav(mag, params)
        write_wav(os.path.join(out_dir, f"{fid}.wav"), wav_data, params.sr)


def synthesize_text(params_tree, state, cfg, text: str, vocoder_pv=None,
                    audio_params=DEFAULT):
    """text -> phonemes -> greedy TTS mel -> mag (CBHG vocoder if given,
    else mel pseudo-inverse lift) -> Griffin-Lim wav."""
    import jax
    import jax.numpy as jnp
    from .. import nn
    from ..models import unast as U
    from ..text import raw_text_to_phoneme_ids

    ids = np.asarray(raw_text_to_phoneme_ids(text), np.int32)
    text_ids = jnp.asarray(ids)[None, :]
    text_len = jnp.asarray([len(ids)], jnp.int32)
    (_, post, _, stop_lens), _ = U.tts(params_tree, state, nn.Ctx.eval(),
                                       cfg, text_ids, text_len, None, None,
                                       infer=True)
    n = int(stop_lens[0])
    mel = np.asarray(post[0, :n])
    if vocoder_pv is not None:
        vp, vs = vocoder_pv
        mag, _ = U.vocoder(vp, vs, nn.Ctx.eval(), jnp.asarray(mel)[None])
        mag = np.asarray(mag[0])
    else:
        lift = dsp.mel_to_mag_pseudo_inverse(audio_params)
        mag = np.clip(mel @ lift, 1e-8, 1.0)
    return dsp.mag_to_wav(mag, audio_params)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--list_file", required=True)
    ap.add_argument("--mels_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    args = ap.parse_args(argv)
    vocode(args.list_file, args.mels_dir, args.out_dir)


if __name__ == "__main__":
    main()
