"""ctypes bindings for the C++ native runtime (native/unast_native.cpp).

Auto-builds libunast_native.so with make/g++ on first import if missing;
every entry point has a pure-numpy fallback so the package works without a
toolchain. The TPU compute path is unaffected — this accelerates the
host-side runtime (metrics, wav decode, trim, collation)."""

import ctypes
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libunast_native.so")

_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       timeout=120, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception as e:
        print(f"[native] build skipped: {e}", file=sys.stderr)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        print(f"[native] load failed: {e}", file=sys.stderr)
        return None
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    lib.levenshtein_batch.argtypes = [c_i32p, c_i32p, c_i32p, c_i32p,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, c_i64p]
    lib.read_wav_pcm16.restype = ctypes.c_int64
    lib.read_wav_pcm16.argtypes = [ctypes.c_char_p, c_f32p, ctypes.c_int64,
                                   c_i32p]
    lib.trim_silence_bounds.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_double, c_i64p]
    lib.trim_silence_bounds_i16.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, c_i64p]
    lib.preemphasis.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_float, c_f32p]
    lib.shard_open.restype = ctypes.c_void_p
    lib.shard_open.argtypes = [ctypes.c_char_p]
    lib.shard_close.argtypes = [ctypes.c_void_p]
    lib.shard_len.restype = ctypes.c_int64
    lib.shard_len.argtypes = [ctypes.c_void_p]
    lib.shard_n_mels.restype = ctypes.c_int32
    lib.shard_n_mels.argtypes = [ctypes.c_void_p]
    lib.shard_lens.argtypes = [ctypes.c_void_p, c_i64p, ctypes.c_int,
                               c_i32p, c_i32p]
    lib.shard_collate.argtypes = [ctypes.c_void_p, c_i64p, ctypes.c_int,
                                  ctypes.c_int64, ctypes.c_int64,
                                  c_i32p, c_f32p, c_i32p, c_i32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def levenshtein_batch(refs: np.ndarray, hyps: np.ndarray,
                      ref_lens: np.ndarray, hyp_lens: np.ndarray) -> np.ndarray:
    """refs/hyps: [B, T*] int32; lens: [B]. Returns [B] int64 distances."""
    lib = _load()
    refs = np.ascontiguousarray(refs, np.int32)
    hyps = np.ascontiguousarray(hyps, np.int32)
    ref_lens = np.ascontiguousarray(ref_lens, np.int32)
    hyp_lens = np.ascontiguousarray(hyp_lens, np.int32)
    b = refs.shape[0]
    if lib is None:
        from ..infer.metrics import edit_distance
        return np.asarray([
            edit_distance(refs[i, :ref_lens[i]].tolist(),
                          hyps[i, :hyp_lens[i]].tolist())
            for i in range(b)], np.int64)
    out = np.empty((b,), np.int64)
    lib.levenshtein_batch(_i32p(refs), _i32p(hyps), _i32p(ref_lens),
                          _i32p(hyp_lens), b, refs.shape[1], hyps.shape[1],
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def read_wav(path: str, expect_sr: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """PCM16 WAV -> (float32 [-1,1] mono, sample_rate)."""
    lib = _load()
    if lib is None:
        from ..data.prepare import read_wav as py_read
        return py_read(path, expect_sr or 22050), expect_sr or 22050
    sr = ctypes.c_int32(0)
    n = lib.read_wav_pcm16(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        raise IOError(f"cannot decode {path}")
    out = np.empty((n,), np.float32)
    got = lib.read_wav_pcm16(path.encode(),
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             n, ctypes.byref(sr))
    if expect_sr is not None and sr.value != expect_sr:
        raise ValueError(f"{path}: sr {sr.value} != {expect_sr}")
    return out[:got], sr.value


def trim_silence(y: np.ndarray, frame_length: int = 2048, hop: int = 512,
                 top_db: float = 60.0):
    """librosa.effects.trim-equivalent. Returns (trimmed, (start, end))."""
    lib = _load()
    y = np.ascontiguousarray(y, np.float32)
    if lib is None:
        from ..audio import ref_dsp
        from ..audio.params import DEFAULT
        p = DEFAULT.replace(trim_frame_length=frame_length,
                            trim_hop_length=hop, trim_top_db=top_db)
        return ref_dsp.trim_silence(y, p)
    bounds = np.empty((2,), np.int64)
    lib.trim_silence_bounds(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y),
        frame_length, hop, top_db,
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    s, e = int(bounds[0]), int(bounds[1])
    return y[s:e], (s, e)


def trim_silence_i16(y: np.ndarray, frame_length: int = 2048,
                     hop: int = 512, top_db: float = 60.0):
    """trim_silence on PCM16 samples without a float conversion of the
    whole buffer (the Synthesizer pcm16 serving path). The trim decision
    is a dB ratio, so the 1/32767 scale cancels: bounds equal those of
    trim_silence(y / 32767)."""
    lib = _load()
    y = np.ascontiguousarray(y, np.int16)
    if lib is None:
        trimmed, se = trim_silence(y.astype(np.float32) / 32767.0,
                                   frame_length, hop, top_db)
        return y[se[0]:se[1]], se
    bounds = np.empty((2,), np.int64)
    lib.trim_silence_bounds_i16(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(y),
        frame_length, hop, top_db,
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    s, e = int(bounds[0]), int(bounds[1])
    return y[s:e], (s, e)


def shard_open(path: str):
    """mmap a packed dataset shard (data/shard.py format). Returns an
    opaque handle for shard_collate, or None (fallback to numpy reads)."""
    lib = _load()
    if lib is None:
        return None
    h = lib.shard_open(path.encode())
    return h or None


def shard_close(h):
    lib = _load()
    if lib is not None and h:
        lib.shard_close(h)


def shard_collate(h, idx: np.ndarray, text_cap: int, mel_cap: int,
                  n_mels: int):
    """Native single-call batch assembly from a shard handle: returns
    (text [B,Tc] i32, mel [B,Mc,n_mels] f32, text_len, mel_len) padded/
    truncated exactly like data/batching.py::collate."""
    lib = _load()
    if lib is None or not h:
        return None
    idx = np.ascontiguousarray(idx, np.int64)
    b = len(idx)
    text = np.empty((b, text_cap), np.int32)
    mel = np.empty((b, mel_cap, n_mels), np.float32)
    tl = np.empty((b,), np.int32)
    ml = np.empty((b,), np.int32)
    lib.shard_collate(
        h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), b,
        text_cap, mel_cap, _i32p(text),
        mel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _i32p(tl), _i32p(ml))
    return text, mel, tl, ml


def preemphasis(y: np.ndarray, coef: float = 0.97) -> np.ndarray:
    lib = _load()
    y = np.ascontiguousarray(y, np.float32)
    if lib is None:
        return np.append(y[:1], y[1:] - coef * y[:-1]).astype(np.float32)
    out = np.empty_like(y)
    lib.preemphasis(y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    len(y), coef,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
