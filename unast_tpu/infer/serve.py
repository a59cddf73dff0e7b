"""Batch serving API: warm-compiled TTS and ASR endpoints.

The reference exposes inference only through the eval/test dump scripts; for
production serving this provides a stable object API:

    syn = Synthesizer.from_checkpoint(ckpt_dir, args)   # or (params, state)
    wavs = syn.tts(["hello world", ...])                 # list of np wavs
    texts = syn.asr([wav1, wav2])                        # list of id lists

Design: requests are padded into fixed text/mel buckets so each bucket
compiles once (then served hot); greedy decode runs the KV-cached
while_loop; Griffin-Lim vocoding (via the CBHG vocoder if provided, else
the mel pseudo-inverse lift) runs on device.
"""

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..audio import dsp
from ..audio.params import DEFAULT as AUDIO_DEFAULT
from ..models import unast as U
from ..models.config import ModelConfig
from ..text import raw_text_to_phoneme_ids, sequence_to_text


class Synthesizer:
    """Warm-compiled batched text->wav / mel->text endpoints."""

    def __init__(self, params, net_state, cfg: ModelConfig,
                 vocoder_pv=None, audio_params=AUDIO_DEFAULT,
                 text_buckets: Sequence[int] = (32, 64, 128, 304),
                 mel_buckets: Sequence[int] = (256, 512, 816),
                 max_batch: int = 8, mesh=None, quantize: str = None,
                 nar_pv=None, melgan_params=None, ctc_pv=None,
                 melgan_chunk: Optional[int] = None, pcm16: bool = False):
        """`mesh`: optional jax.sharding.Mesh with a 'dp' axis — one
        Synthesizer then serves batches sharded across all chips (params
        replicated, request batch split over 'dp'; XLA runs each shard's
        decode independently, no collectives on this path). max_batch must
        be divisible by the dp size; short chunks are padded by replicating
        the last request.

        `nar_pv`: optional (params, net_state) of a distilled FastSpeech
        student (models/fastspeech.py, same cfg dims) — the TTS mel path
        then runs the ONE-PASS non-autoregressive synthesis instead of the
        KV-cached greedy decode (output length = predicted durations; ASR
        still uses the AR model).

        `melgan_params`: optional trained neural-vocoder params
        (models/melgan.py) — wav synthesis then runs the one-pass conv
        generator instead of Griffin-Lim (takes precedence over
        vocoder_pv/lift).

        `ctc_pv`: optional (params, net_state) of a trained CTC ASR model
        (models/ctc.py, same cfg dims) — asr_ids then runs the one-pass
        greedy-CTC decode instead of the AR text decoder (beam > 1 still
        routes to the AR beam search).

        `melgan_chunk`: time-chunked neural vocoding — the MelGAN forward
        runs over boundary-truncated windows of this many mel frames
        (batched over the chunk's utterances), EXACTLY reproducing the
        whole-utterance forward (infer/streaming.py's contract) while
        bounding the generator's [B, T*hop, C] activations per window.
        This bounds the serving batch's HBM: from batch 96 x 816 frames
        up, the whole-utterance activations pressure one chip's HBM and
        chunked windows win (BENCHMARKS.md "batch knee, revisited").
        None = auto (chunk only when rows*frames exceeds the measured
        safe region); 0 = never.

        `pcm16`: quantize waveforms to 16-bit PCM on device — tts() /
        tts_long() return int16 arrays (the disk/wire format, reference
        src/utils.py:103) and the device->host waveform transfer halves;
        that transfer is the dominant batched-serving cost (BENCHMARKS.md
        round-3 serving-transfer study)."""
        self.cfg = cfg
        if quantize is not None:
            # int8 weight-only quantization (nn/quant.py): halves the
            # per-decode-step weight HBM traffic on this latency-bound path.
            assert quantize == "int8", quantize
            params = nn.quant.quantize_params(params)
            if vocoder_pv is not None:
                vocoder_pv = (nn.quant.quantize_params(vocoder_pv[0]),
                              vocoder_pv[1])
            if nar_pv is not None:
                nar_pv = (nn.quant.quantize_params(nar_pv[0]), nar_pv[1])
        self.vocoder_pv = vocoder_pv
        self.audio_params = audio_params
        # clamp (not drop) buckets above the model caps, so long requests
        # still get the full-capacity bucket
        self.text_buckets = sorted({min(b, cfg.max_text_len)
                                    for b in text_buckets})
        self.mel_buckets = sorted({min(b, cfg.max_mel_len)
                                   for b in mel_buckets})
        self.max_batch = max_batch
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            dp = mesh.shape["dp"]
            assert max_batch % dp == 0, (
                f"max_batch {max_batch} must divide over dp={dp}")
            repl = NamedSharding(mesh, P())
            params = jax.device_put(params, jax.tree_util.tree_map(
                lambda _: repl, params))
            net_state = jax.device_put(net_state, jax.tree_util.tree_map(
                lambda _: repl, net_state))
            self._req_sharding = NamedSharding(mesh, P("dp"))
            if nar_pv is not None:
                nar_pv = tuple(
                    jax.device_put(t, jax.tree_util.tree_map(
                        lambda _: repl, t)) for t in nar_pv)
        self.params = params
        self.net_state = net_state
        self.nar_pv = nar_pv
        self.ctc_pv = ctc_pv
        self._tts_fn = (jax.jit(self._nar_tts_impl) if nar_pv is not None
                        else jax.jit(self._tts_impl))
        self._asr_fn = (jax.jit(self._ctc_asr_impl) if ctc_pv is not None
                        else jax.jit(self._asr_impl))
        self._asr_beam_fn = jax.jit(self._asr_beam_impl, static_argnums=(4,))
        self._lift = jnp.asarray(dsp.mel_to_mag_pseudo_inverse(audio_params))
        # one jitted program per (rows, bucket): mel -> mag (CBHG vocoder or
        # pseudo-inverse lift) -> batched Griffin-Lim -> wavs. Everything in
        # one jit — eager ops are per-op compiles on the axon TPU backend.
        gl = jax.vmap(lambda m: dsp._mag_to_wav_core(m, audio_params))
        self.melgan_params = melgan_params
        self.melgan_chunk = melgan_chunk
        self.pcm16 = bool(pcm16)
        # pcm16: quantize to 16-bit PCM ON DEVICE so the waveform leaves
        # the chip at half the bytes — measured 2x faster device->host
        # fetch, and the dominant serving cost at batch >= 32 is exactly
        # that fetch (BENCHMARKS.md "serving transfer"). PCM16 is the
        # disk/wire format anyway (reference writes 16-bit WAVs,
        # src/utils.py:103); tts() then returns int16 arrays.
        _out = ((lambda w: jnp.round(jnp.clip(w, -1.0, 1.0)
                                     * 32767.0).astype(jnp.int16))
                if self.pcm16 else (lambda w: w))
        self._out_op = _out
        if melgan_params is not None:
            from ..models import melgan as MG
            self._vocode_fn = jax.jit(
                lambda mp, mel_b: _out(MG.generator_forward(mp, mel_b)))
        elif vocoder_pv is not None:
            def _vocode(vp, vs, mel_b):
                mag, _ = U.vocoder(vp, vs, nn.Ctx.eval(), mel_b)
                return _out(gl(jnp.clip(mag, 1e-8, 1.0)))
            self._vocode_fn = jax.jit(_vocode)
        else:
            self._vocode_fn = jax.jit(
                lambda lift, mel_b: _out(gl(jnp.clip(mel_b @ lift,
                                                     1e-8, 1.0))))

    def _place(self, *arrays):
        """Shard request arrays over 'dp' (no-op without a mesh)."""
        if self.mesh is None:
            return arrays
        return tuple(jax.device_put(a, self._req_sharding) for a in arrays)

    def _pad_chunk(self, n: int) -> int:
        """Rows a chunk must be padded to (replicating the last request)
        so the batch divides over the mesh."""
        if self.mesh is None:
            return n
        dp = self.mesh.shape["dp"]
        return -(-n // dp) * dp

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, args, **kw):
        from ..train.config import model_config_from_args
        from ..train.steps import init_train_state
        from ..train.checkpoint import load_ckp
        cfg = model_config_from_args(args)
        template = init_train_state(jax.random.PRNGKey(0), cfg, args)
        _, _, ts, _ = load_ckp(ckpt_path, template)
        return cls(ts.params, ts.net_state, cfg, **kw)

    # -- device fns (jitted once per input shape = per bucket) --------------

    def _tts_impl(self, params, net_state, ids, lens):
        (pre, post, stop, stop_lens), _ = U.tts(
            params, net_state, nn.Ctx.eval(), self.cfg, ids, lens,
            None, None, infer=True)
        return post, stop_lens

    def _nar_tts_impl(self, params, net_state, ids, lens):
        # params/net_state args are the AR trees (ignored) so the public
        # call shape stays identical; the NAR trees ride the closure.
        from ..models import fastspeech as F
        nar_p, nar_s = self.nar_pv
        (_, post, out_lens, _), _ = F.fastspeech_forward(
            nar_p, nar_s, nn.Ctx.eval(), self.cfg, ids, lens,
            max_len=self.cfg.max_mel_len)
        return post, out_lens

    def _asr_impl(self, params, net_state, mel, mel_len):
        (ids, stop_lens), _ = U.asr(params, net_state, nn.Ctx.eval(),
                                    self.cfg, None, None, mel, mel_len,
                                    infer=True)
        return ids, stop_lens

    def _ctc_asr_impl(self, params, net_state, mel, mel_len):
        # one-pass greedy-CTC ASR; AR trees ignored (call shape unchanged),
        # the CTC trees ride the closure — same pattern as _nar_tts_impl
        from ..models import ctc as CT
        c_p, c_s = self.ctc_pv
        (ids, lens), _ = CT.ctc_asr_infer(c_p, c_s, nn.Ctx.eval(),
                                          self.cfg, mel, mel_len)
        return ids, lens

    def _asr_beam_impl(self, params, net_state, mel, mel_len, beam):
        from ..models import networks as N
        ectx = nn.Ctx.eval()
        (enc, mask), _ = N.speech_encode(params["speech_m"],
                                         net_state["speech_m"], ectx,
                                         self.cfg, mel, mel_len)
        return N.text_tr_beam_search(params["text_m"], ectx, self.cfg,
                                     enc, mask, beam=beam)

    def _spec_asr_impl(self, params, net_state, mel, mel_len):
        # speculative AR decode: the one-pass CTC greedy output drafts,
        # the AR decoder verifies whole candidate sequences in parallel
        # teacher-forced forwards (networks.text_tr_spec_infer) — output
        # is the AR model's greedy transcript, reached in ~(#CTC-errors+1)
        # MXU-friendly passes instead of max_text_len cached steps.
        from ..models import ctc as CT
        from ..models import networks as N
        ectx = nn.Ctx.eval()
        c_p, c_s = self.ctc_pv
        (draft, _), _ = CT.ctc_asr_infer(c_p, c_s, ectx, self.cfg,
                                         mel, mel_len)
        (enc, mask), _ = N.speech_encode(params["speech_m"],
                                         net_state["speech_m"], ectx,
                                         self.cfg, mel, mel_len)
        return N.text_tr_spec_infer(params["text_m"], ectx, self.cfg,
                                    enc, mask, draft)

    # -- public API ----------------------------------------------------------

    def _bucket(self, buckets, need):
        for b in buckets:
            if need <= b:
                return b
        return buckets[-1]

    def _tts_chunk(self, chunk: List[str]):
        """One padded/bucketed chunk of texts -> (post [rows, Tcap, n_mels]
        jnp, stop_lens np, n_real)."""
        return self._tts_chunk_seqs(
            [np.asarray(raw_text_to_phoneme_ids(t), np.int32)
             for t in chunk])

    def _tts_chunk_seqs(self, seqs):
        """Pre-phonemized variant of _tts_chunk (id arrays in, mels out)."""
        n = len(seqs)
        rows = self._pad_chunk(n)
        tl = self._bucket(self.text_buckets, max(len(s) for s in seqs))
        ids = np.zeros((rows, tl), np.int32)
        lens = np.zeros((rows,), np.int32)
        for i in range(rows):
            s = seqs[min(i, n - 1)][:tl]
            ids[i, :len(s)] = s
            lens[i] = len(s)
        ids, lens = self._place(jnp.asarray(ids), jnp.asarray(lens))
        post, stop_lens = self._tts_fn(self.params, self.net_state,
                                       ids, lens)
        return post, np.asarray(stop_lens), n

    def tts_mels(self, texts: List[str]):
        """texts -> list of (mel [T, n_mels] np.float32)."""
        out = []
        for start in range(0, len(texts), self.max_batch):
            post, stop_lens, n = self._tts_chunk(
                texts[start:start + self.max_batch])
            post = np.asarray(post, np.float32)
            out.extend(post[i, : stop_lens[i]] for i in range(n))
        return out

    def tts(self, texts: List[str]):
        """texts -> list of waveforms (np.float32).

        Vocoding (CBHG or mel pseudo-inverse lift, then Griffin-Lim) runs
        BATCHED at a fixed mel bucket per chunk — one compiled program per
        (rows, bucket) instead of one Griffin-Lim compile per distinct
        utterance length — then each waveform is cut at its stop length and
        silence-trimmed on host."""
        return self._tts_wavs_from_seqs(
            [np.asarray(raw_text_to_phoneme_ids(t), np.int32)
             for t in texts])

    def tts_long(self, text: str, pause_s: float = 0.1):
        """Unbounded-length text -> one waveform. Texts longer than the
        model's max_text_len are split at WORD boundaries (space phoneme,
        id 3) into segments within the cap, synthesized as ONE batch
        (they ride the same bucketed program), and concatenated with
        `pause_s` of silence between segments. Capability add: the
        reference caps every input at max_text_len (src/network.py:455)."""
        from ..text.symbols import symbols
        space = symbols.index(" ")
        ids = raw_text_to_phoneme_ids(text)
        cap = self.cfg.max_text_len
        segs, cur = [], []
        for tok in ids:
            cur.append(tok)
            if len(cur) >= cap:
                # backtrack to the last word boundary inside the cap
                try:
                    cut = len(cur) - 1 - cur[::-1].index(space)
                except ValueError:
                    cut = len(cur)  # no space: hard split at the cap
                head, cur = cur[:cut], [t for t in cur[cut:] if t != space]
                if head:
                    segs.append(head)
        if cur:
            segs.append(cur)
        wavs = self._tts_wavs_from_seqs(
            [np.asarray(s, np.int32) for s in segs])
        if len(wavs) == 1:
            return wavs[0]
        gap = np.zeros(int(pause_s * self.audio_params.sr), np.float32)
        out = []
        for i, w in enumerate(wavs):
            if i:
                out.append(gap)
            out.append(w)
        return np.concatenate(out)

    def _tts_wavs_from_seqs(self, seqs):
        """Pre-phonemized id sequences -> waveforms: batched mel
        synthesis, fixed-bucket batched vocoding (MelGAN > CBHG+GL >
        lift+GL), native C silence trim per utterance (the pure-numpy
        trim costs ~100 ms per 32-utterance batch on this host)."""
        from .. import native
        p = self.audio_params
        out = []
        for start in range(0, len(seqs), self.max_batch):
            post, stop_lens, n = self._tts_chunk_seqs(
                seqs[start:start + self.max_batch])
            tb = self._bucket(self.mel_buckets,
                              max(1, int(stop_lens[:n].max())))
            mel_b = post[:, :tb]
            if self.melgan_params is not None:
                wavs = self._melgan_vocode(mel_b)
            elif self.vocoder_pv is not None:
                vp, vs = self.vocoder_pv
                wavs = self._vocode_fn(vp, vs, mel_b)
            else:
                wavs = self._vocode_fn(self._lift, mel_b)
            wavs = np.asarray(wavs,
                              np.int16 if self.pcm16 else np.float32)
            trim = (native.trim_silence_i16 if self.pcm16
                    else native.trim_silence)
            for i in range(n):
                # AR stop_lens counts the stop-fired frame (cut excludes
                # it, reference src/network.py:246-252); NAR out_lens is
                # the exact frame count — keep every frame.
                frames = (int(stop_lens[i]) if self.nar_pv is not None
                          else int(stop_lens[i]) - 1)
                cut = p.hop_length * max(1, frames)
                w, _ = trim(
                    wavs[i, :cut], frame_length=p.trim_frame_length,
                    hop=p.trim_hop_length, top_db=p.trim_top_db)
                out.append(w)
        return out

    # threshold (total mel frames per vocoder dispatch) above which the
    # auto mode chunks. Measured round 3 (BENCHMARKS.md "batch knee,
    # revisited"): with PCM16 output the whole-utterance forward WINS
    # through batch 64 x 816 (~52k frames, 61.5 utt/s vs 56.3 chunked) —
    # the round-2 "collapse" was transfer-bound, not HBM — while at
    # batch 96 x 816 (~78k) activation pressure is real and chunk 256
    # wins (54.5 vs 43.2 utt/s).
    _MELGAN_AUTO_FRAMES = 65536

    def _melgan_vocode(self, mel_b):
        """Neural vocoding of one padded chunk [rows, T, n_mels] -> wavs
        [rows, T*hop]. When chunking is active, runs boundary-truncated
        context windows (exactness contract of infer/streaming.py, here
        batched over the rows) so the generator's activations are bounded
        per dispatch — at most three window shapes compile."""
        from ..models import melgan as MG
        rows, t = mel_b.shape[0], mel_b.shape[1]
        chunk = self.melgan_chunk
        if chunk is None:
            chunk = 256 if rows * t > self._MELGAN_AUTO_FRAMES else 0
        if not chunk or t <= chunk:
            return self._vocode_fn(self.melgan_params, mel_b)
        hop = self.audio_params.hop_length
        ctx = MG.receptive_field(self.melgan_params)
        win = chunk + 2 * ctx
        if t <= win:
            return self._vocode_fn(self.melgan_params, mel_b)
        # ONE jitted program for every window: device-side dynamic_slice
        # of a UNIFORM (chunk + 2*ctx)-frame window (window starts are
        # clamped at the bucket edges, which only grows the interior's
        # context margin), vocode, return ONLY the interior chunk*hop
        # samples. Every window is a TRUE slice of mel_b with >= ctx
        # margin or a real bucket edge on each side, so the concatenation
        # is exactly melgan_forward(mel_b). All dispatches queue async on
        # the device (bounded live activations — the batch-knee fix);
        # exactly chunk*hop samples transfer per window (no overlap
        # retransmit), fetched after everything is in flight.
        key = (chunk, win, hop)
        if getattr(self, "_voc_win_key", None) != key:
            def _win(params, mel, a, lo):
                w_mel = jax.lax.dynamic_slice(
                    mel, (0, a, 0), (mel.shape[0], win, mel.shape[2]))
                wav = MG.generator_forward(params, w_mel)
                return self._out_op(jax.lax.dynamic_slice(
                    wav, (0, lo), (wav.shape[0], chunk * hop)))

            self._voc_win_fn = jax.jit(_win)
            self._voc_win_key = key
        pending = []
        for t0 in range(0, t, chunk):
            a = min(max(0, t0 - ctx), t - win)
            lo = (t0 - a) * hop
            # the returned block is always chunk*hop samples; for the
            # final PARTIAL chunk lo + chunk*hop would run past the
            # window (dynamic_slice would silently clamp and return the
            # wrong region), so clamp the slice start ourselves and keep
            # the residual offset for the host-side trim
            lo_c = min(lo, (win - chunk) * hop)
            pending.append((self._voc_win_fn(
                self.melgan_params, mel_b, a, lo_c),
                lo - lo_c, min(chunk, t - t0) * hop))
        outs = [np.asarray(w)[:, off:off + take]
                for w, off, take in pending]
        return np.concatenate(outs, axis=1)

    def asr_ids(self, mels: List[np.ndarray], beam: int = 1,
                ctc_beam: int = 1, spec: bool = False):
        """mels (list of [T, n_mels]) -> list of phoneme-id np arrays.
        beam > 1 (transformer backbone only) uses the AR beam-search
        decode; ctc_beam > 1 (with ctc_pv) runs prefix beam search over
        the CTC posteriors (host-side; merges probability mass across
        alignments — models/ctc.py::ctc_prefix_beam_search); spec=True
        (with ctc_pv, transformer backbone) returns the AR model's greedy
        transcript via CTC-drafted speculative decoding — same output as
        the AR path, a few parallel verify passes instead of a sequential
        decode loop. self.last_spec_rounds records the verify-round
        counts."""
        if beam > 1 and self.cfg.model_type != "transformer":
            raise ValueError("beam search requires the transformer backbone")
        if ctc_beam > 1 and self.ctc_pv is None:
            raise ValueError("ctc_beam needs Synthesizer(ctc_pv=...)")
        if spec:
            if self.ctc_pv is None:
                raise ValueError("spec=True needs Synthesizer(ctc_pv=...)")
            if self.cfg.model_type != "transformer":
                raise ValueError("speculative decode requires the "
                                 "transformer backbone")
            if not hasattr(self, "_asr_spec_fn"):
                self._asr_spec_fn = jax.jit(self._spec_asr_impl)
            self.last_spec_rounds = []
        out = []
        for start in range(0, len(mels), self.max_batch):
            chunk = mels[start:start + self.max_batch]
            n = len(chunk)
            rows = self._pad_chunk(n)
            ml = self._bucket(self.mel_buckets, max(len(m) for m in chunk))
            mel = np.zeros((rows, ml, self.cfg.num_mels), np.float32)
            lens = np.zeros((rows,), np.int32)
            for i in range(rows):
                m = chunk[min(i, n - 1)][:ml]
                mel[i, :len(m)] = m
                lens[i] = len(m)
            mel, lens = self._place(jnp.asarray(mel), jnp.asarray(lens))
            if ctc_beam > 1:
                lp, n_frames = self._ctc_log_probs(mel, lens)
                lp, n_frames = np.asarray(lp), np.asarray(n_frames)
                from ..models.ctc import ctc_prefix_beam_search
                out.extend(np.asarray(ctc_prefix_beam_search(
                    lp[i], int(n_frames[i]), beam=ctc_beam,
                    max_text_len=self.cfg.max_text_len), np.int32)
                    for i in range(n))
                continue
            if spec:
                ids, stop_lens, rounds = self._asr_spec_fn(
                    self.params, self.net_state, mel, lens)
                self.last_spec_rounds.append(int(rounds))
            elif beam > 1:
                ids, stop_lens = self._asr_beam_fn(
                    self.params, self.net_state, mel, lens, beam)
            else:
                ids, stop_lens = self._asr_fn(self.params, self.net_state,
                                              mel, lens)
            ids = np.asarray(ids)
            stop_lens = np.asarray(stop_lens)
            out.extend(ids[i, : stop_lens[i]] for i in range(n))
        return out

    def _ctc_log_probs(self, mel, mel_len):
        if not hasattr(self, "_ctc_lp_fn"):
            from ..models import ctc as CT

            def impl(mel, mel_len):
                c_p, c_s = self.ctc_pv
                logits, pad, _ = CT.ctc_logits(c_p, c_s, nn.Ctx.eval(),
                                               self.cfg, mel, mel_len)
                return (jax.nn.log_softmax(logits, axis=-1),
                        jnp.sum(~pad, axis=1))

            self._ctc_lp_fn = jax.jit(impl)
        return self._ctc_lp_fn(mel, mel_len)

    def asr(self, wavs: List[np.ndarray], beam: int = 1):
        """waveforms -> decoded text strings (via the shared DSP + codec)."""
        mels = []
        for wav in wavs:
            mel, _, n = dsp.wav_to_mel_mag(np.asarray(wav, np.float32),
                                           self.audio_params)
            mels.append(np.asarray(mel[:n], np.float32))
        return [sequence_to_text(ids.tolist())
                for ids in self.asr_ids(mels, beam=beam)]

    def warmup(self):
        """Pre-compile every bucket (one dummy request per bucket; under a
        mesh the dummy batch is dp-wide so warm shapes match served ones)."""
        rows = self._pad_chunk(1)
        for tb in self.text_buckets:
            ids, lens = self._place(
                jnp.ones((rows, tb), jnp.int32),
                jnp.full((rows,), tb, jnp.int32))
            self._tts_fn(self.params, self.net_state, ids, lens)
        for mb in self.mel_buckets:
            mel, lens = self._place(
                jnp.zeros((rows, mb, self.cfg.num_mels), jnp.float32),
                jnp.full((rows,), mb, jnp.int32))
            self._asr_fn(self.params, self.net_state, mel, lens)
