"""Dynamic-batching serving frontend (infer/server.py): request coalescing,
result correctness vs the direct Synthesizer calls, error propagation, and
the stdlib HTTP endpoint round-trip. (The reference has no serving layer —
this is a TPU-native addition; see BENCHMARKS.md batch-scaling numbers.)"""

import http.client
import json
import threading

import numpy as np
import jax

from unast_tpu.models import TINY, unast as U
from unast_tpu.audio.params import AudioParams
from unast_tpu.infer.serve import Synthesizer
from unast_tpu.infer.server import (DynamicBatcher, parse_wav, serve_http,
                                    wav_bytes)


def _make_syn(max_batch=4):
    params, state = U.unast_init(jax.random.PRNGKey(0), TINY)
    # force full-length decode so waveforms carry energy
    params["speech_m"]["postnet"]["stop_proj"]["b"] = (
        params["speech_m"]["postnet"]["stop_proj"]["b"] - 100.0)
    return Synthesizer(params, state, TINY,
                       audio_params=AudioParams(n_iter=2),
                       text_buckets=(8, 16), mel_buckets=(16, 24),
                       max_batch=max_batch)


def test_wav_bytes_roundtrip():
    wav_arr = (np.sin(np.arange(2000) / 30) * 0.5).astype(np.float32)
    back = parse_wav(wav_bytes(wav_arr, 22050))
    assert back.shape == wav_arr.shape
    np.testing.assert_allclose(back, wav_arr, atol=1.5 / 32768)


def test_dynamic_batcher_coalesces_and_matches_direct():
    syn = _make_syn()
    texts = ["hi there", "ok", "go now", "stop it"]
    direct = syn.tts_mels(texts)

    batcher = DynamicBatcher(syn, max_wait_ms=300.0)
    try:
        reqs = [batcher.submit("tts_mel", t) for t in texts]
        got = [r.wait(timeout=300) for r in reqs]
    finally:
        batcher.close()
    for g, d in zip(got, direct):
        np.testing.assert_allclose(np.asarray(g), np.asarray(d),
                                   rtol=1e-5, atol=1e-5)
    # all four submitted before the first dispatch window closed -> at
    # least one multi-request device batch
    assert max(batcher.batch_sizes) > 1, batcher.batch_sizes


def test_dynamic_batcher_concurrent_threads_and_asr():
    syn = _make_syn()
    batcher = DynamicBatcher(syn, max_wait_ms=50.0)
    wav_in = np.sin(np.arange(4000) / 20).astype(np.float32) * 0.4
    results = {}

    def tts_client(i):
        results[f"tts{i}"] = batcher.tts(f"request {i}", timeout=600)

    def asr_client():
        results["asr"] = batcher.asr(wav_in, timeout=600)

    threads = [threading.Thread(target=tts_client, args=(i,))
               for i in range(3)] + [threading.Thread(target=asr_client)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
    finally:
        batcher.close()
    assert isinstance(results["asr"], str)
    for i in range(3):
        w = results[f"tts{i}"]
        assert w.ndim == 1 and np.isfinite(w).all()


def test_dynamic_batcher_propagates_errors():
    syn = _make_syn()
    batcher = DynamicBatcher(syn, max_wait_ms=5.0)
    try:
        req = batcher.submit("nonsense", "x")
        try:
            req.wait(timeout=120)
            raise AssertionError("expected the unknown-kind error")
        except ValueError as e:
            assert "unknown request kind" in str(e)
    finally:
        batcher.close()


def test_http_server_roundtrip():
    syn = _make_syn()
    batcher = DynamicBatcher(syn, max_wait_ms=5.0)
    server = serve_http(batcher, "127.0.0.1", 0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("GET", "/healthz")
        assert conn.getresponse().read() == b"ok"

        body = json.dumps({"text": "hello world"}).encode()
        conn.request("POST", "/tts", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()[:200]
        wav_arr = parse_wav(resp.read())
        assert wav_arr.ndim == 1 and len(wav_arr) > 0

        wav_in = np.sin(np.arange(4000) / 20).astype(np.float32) * 0.4
        conn.request("POST", "/asr", wav_bytes(wav_in),
                     {"Content-Type": "audio/wav"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()[:200]
        out = json.loads(resp.read())
        assert isinstance(out["text"], str)

        conn.request("POST", "/nope", b"{}")
        assert conn.getresponse().status == 404
    finally:
        server.shutdown()
        batcher.close()
