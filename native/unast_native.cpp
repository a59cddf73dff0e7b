// Native runtime components for unast_tpu, exposed through a C ABI and
// loaded from Python via ctypes (no pybind11 in this image).
//
// The reference is pure Python (SURVEY.md §2.3: no native code anywhere), so
// these are performance additions for the host-side runtime around the TPU
// compute path:
//   - batch Levenshtein distance  (PER metric over eval sets; the Python DP
//     is O(B*T^2) interpreter work)
//   - PCM16 WAV decode            (data pipeline; avoids python wave+numpy
//     copies)
//   - silence trim + preemphasis  (librosa.effects.trim semantics,
//     src/utils.py:249,255 — the only data-dependent host-side DSP)
//
// Build: make -C native   (produces libunast_native.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Batch token-level Levenshtein. refs/hyps are [batch, stride] int32 row-major
// with per-row valid lengths. out: [batch] int64 distances.
// ---------------------------------------------------------------------------
void levenshtein_batch(const int32_t* refs, const int32_t* hyps,
                       const int32_t* ref_lens, const int32_t* hyp_lens,
                       int batch, int stride_r, int stride_h, int64_t* out) {
  std::vector<int64_t> prev, cur;
  for (int b = 0; b < batch; ++b) {
    const int32_t* r = refs + (int64_t)b * stride_r;
    const int32_t* h = hyps + (int64_t)b * stride_h;
    int n = ref_lens[b], m = hyp_lens[b];
    if (n == 0) { out[b] = m; continue; }
    if (m == 0) { out[b] = n; continue; }
    prev.resize(m + 1);
    cur.resize(m + 1);
    for (int j = 0; j <= m; ++j) prev[j] = j;
    for (int i = 1; i <= n; ++i) {
      cur[0] = i;
      const int32_t ri = r[i - 1];
      for (int j = 1; j <= m; ++j) {
        int64_t sub = prev[j - 1] + (h[j - 1] != ri);
        cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
      }
      std::swap(prev, cur);
    }
    out[b] = prev[m];
  }
}

// ---------------------------------------------------------------------------
// PCM16 mono/stereo WAV decode -> float32 in [-1, 1].
// Returns sample count, or -1 on error. If out == nullptr just returns the
// count (call twice: size then fill). sr_out receives the sample rate.
// ---------------------------------------------------------------------------
int64_t read_wav_pcm16(const char* path, float* out, int64_t max_len,
                       int32_t* sr_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char id[4];
  uint32_t chunk_size;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4)) { fclose(f); return -1; }
  fseek(f, 4, SEEK_CUR);
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4)) { fclose(f); return -1; }

  uint16_t channels = 1, bits = 16;
  uint32_t sample_rate = 0;
  int64_t n_samples = -1;
  while (fread(id, 1, 4, f) == 4 && fread(&chunk_size, 4, 1, f) == 1) {
    if (!memcmp(id, "fmt ", 4)) {
      uint16_t fmt;
      fread(&fmt, 2, 1, f);
      fread(&channels, 2, 1, f);
      fread(&sample_rate, 4, 1, f);
      fseek(f, 6, SEEK_CUR);
      fread(&bits, 2, 1, f);
      fseek(f, chunk_size - 16, SEEK_CUR);
      if (fmt != 1 || bits != 16) { fclose(f); return -1; }
    } else if (!memcmp(id, "data", 4)) {
      int64_t frames = chunk_size / (2 * channels);
      if (sr_out) *sr_out = (int32_t)sample_rate;
      if (!out) { fclose(f); return frames; }
      frames = std::min(frames, max_len);
      std::vector<int16_t> buf(frames * channels);
      size_t got = fread(buf.data(), 2, frames * channels, f);
      frames = (int64_t)(got / channels);
      const float scale = 1.0f / 32768.0f;
      for (int64_t i = 0; i < frames; ++i) {
        if (channels == 1) {
          out[i] = buf[i] * scale;
        } else {
          float acc = 0.f;
          for (int c = 0; c < channels; ++c) acc += buf[i * channels + c];
          out[i] = acc * scale / channels;
        }
      }
      n_samples = frames;
      break;
    } else {
      fseek(f, chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  return n_samples;
}

// ---------------------------------------------------------------------------
// librosa.effects.trim semantics: drop leading/trailing frames whose RMS
// power (frame_length window, hop step) is more than top_db below the max.
// Writes [start, end) sample bounds into out_bounds[2].
// ---------------------------------------------------------------------------
void trim_silence_bounds(const float* y, int64_t n, int frame_length, int hop,
                         double top_db, int64_t* out_bounds) {
  out_bounds[0] = 0;
  out_bounds[1] = n;
  if (n == 0) return;
  // Centered RMS frames (librosa.feature.rms center=True zero padding):
  // frame t spans samples [t*hop - frame/2, t*hop + frame/2) of y, with
  // out-of-range samples contributing zero; divide by frame_length always.
  const int64_t pad = frame_length / 2;
  int64_t n_frames = 1 + ((n + 2 * pad) - frame_length) / hop;
  std::vector<double> mse(n_frames);
  double max_mse = 0.0;
  for (int64_t t = 0; t < n_frames; ++t) {
    int64_t start = t * hop - pad;
    int64_t lo = std::max<int64_t>(0, start);
    int64_t hi = std::min<int64_t>(n, start + frame_length);
    double acc = 0.0;
    for (int64_t i = lo; i < hi; ++i) acc += (double)y[i] * y[i];
    mse[t] = acc / frame_length;
    max_mse = std::max(max_mse, mse[t]);
  }
  max_mse = std::max(max_mse, 1e-10);
  int64_t first = -1, last = -1;
  for (int64_t t = 0; t < n_frames; ++t) {
    double db = 10.0 * log10(std::max(mse[t], 1e-10) / max_mse);
    if (db > -top_db) {
      if (first < 0) first = t;
      last = t;
    }
  }
  if (first < 0) { out_bounds[0] = 0; out_bounds[1] = 0; return; }
  out_bounds[0] = first * hop;
  out_bounds[1] = std::min<int64_t>(n, (last + 1) * hop);
}

// ---------------------------------------------------------------------------
// In-place-safe preemphasis: out[0] = y[0]; out[t] = y[t] - coef*y[t-1].
// ---------------------------------------------------------------------------
void preemphasis(const float* y, int64_t n, float coef, float* out) {
  if (n == 0) return;
  float prev = y[0];
  out[0] = y[0];
  for (int64_t t = 1; t < n; ++t) {
    float cur = y[t];
    out[t] = cur - coef * prev;
    prev = cur;
  }
}

// ---------------------------------------------------------------------------
// Fixed-shape batch collation of variable-length float32 sequences:
// gather rows[i] (length lens[i], feature dim d) into out [batch, max_t, d],
// zero-padded. Used by the data loader to avoid per-item numpy copies.
// ---------------------------------------------------------------------------
void pad_batch_f32(const float** rows, const int64_t* lens, int batch,
                   int64_t max_t, int64_t d, float* out) {
  for (int b = 0; b < batch; ++b) {
    int64_t t = std::min(lens[b], max_t);
    float* dst = out + (int64_t)b * max_t * d;
    memcpy(dst, rows[b], sizeof(float) * t * d);
    memset(dst + t * d, 0, sizeof(float) * (max_t - t) * d);
  }
}

}  // extern "C"
