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

// PCM16 variant for the int16 serving path (Synthesizer pcm16=True): the
// trim decision is a dB RATIO to the max-power frame, so the 1/32767
// scale cancels and the bounds computed on raw int16 samples are exactly
// those of the float signal.
void trim_silence_bounds_i16(const int16_t* y, int64_t n, int frame_length,
                             int hop, double top_db, int64_t* out_bounds) {
  out_bounds[0] = 0;
  out_bounds[1] = n;
  if (n == 0) return;
  const int64_t pad = frame_length / 2;
  int64_t n_frames = 1 + ((n + 2 * pad) - frame_length) / hop;
  std::vector<double> mse(n_frames);
  double max_mse = 0.0;
  for (int64_t t = 0; t < n_frames; ++t) {
    int64_t start = t * hop - pad;
    int64_t lo = std::max<int64_t>(0, start);
    int64_t hi = std::min<int64_t>(n, start + frame_length);
    double acc = 0.0;
    for (int64_t i = lo; i < hi; ++i) {
      double v = (double)y[i] / 32767.0;
      acc += v * v;
    }
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

// ---------------------------------------------------------------------------
// Packed dataset shard: one mmap'd file holding the whole corpus
// (unast_tpu/data/shard.py writes it; format doc there). Replaces
// thousands of per-utterance .npy files with zero-copy reads + a single-
// call C batch collate (pad/truncate + f16->f32) on the training hot path.
//
// Layout (little-endian):
//   0: magic "UNSH" | u32 version=1 | u64 n_items | u32 n_mels | u32 pad
//   24: index, n_items x 4 u64: text_off, text_count, mel_off, mel_frames
//       (offsets are absolute byte positions; text = i32, mel = f16)
//   payload
// ---------------------------------------------------------------------------

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Shard {
  const uint8_t* base;
  int64_t size;
  int64_t n_items;
  int32_t n_mels;
  const uint64_t* index;  // [n_items * 4]
};

inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1fu;
  uint32_t man = h & 0x3ffu;
  uint32_t f;
  if (exp == 0) {
    if (man == 0) {
      f = sign;
    } else {  // subnormal: renormalize
      int e = 112;  // 127 - 15
      while (!(man & 0x400u)) { man <<= 1; --e; }
      man &= 0x3ffu;
      f = sign | ((uint32_t)(e + 1) << 23) | (man << 13);
    }
  } else if (exp == 31) {  // inf / nan
    f = sign | 0x7f800000u | (man << 13);
  } else {
    f = sign | ((exp + 112u) << 23) | (man << 13);
  }
  float out;
  memcpy(&out, &f, 4);
  return out;
}

}  // namespace

void* shard_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 24) { close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);  // mapping persists
  if (base == MAP_FAILED) return nullptr;
  const uint8_t* p = (const uint8_t*)base;
  if (memcmp(p, "UNSH", 4) != 0) { munmap(base, st.st_size); return nullptr; }
  uint32_t version;
  memcpy(&version, p + 4, 4);
  if (version != 1) { munmap(base, st.st_size); return nullptr; }
  Shard* s = new Shard;
  s->base = p;
  s->size = st.st_size;
  uint64_t n;
  memcpy(&n, p + 8, 8);
  s->n_items = (int64_t)n;
  memcpy(&s->n_mels, p + 16, 4);
  s->index = (const uint64_t*)(p + 24);
  // validate the index against the file size so a truncated/corrupt
  // shard fails at open, not as an out-of-bounds read in shard_collate
  if (24 + s->n_items * 32 > s->size || s->n_mels <= 0) {
    munmap(base, st.st_size);
    delete s;
    return nullptr;
  }
  for (int64_t i = 0; i < s->n_items; ++i) {
    const uint64_t* e = s->index + i * 4;
    if (e[0] + e[1] * 4 > (uint64_t)s->size ||
        e[2] + e[3] * 2 * (uint64_t)s->n_mels > (uint64_t)s->size) {
      munmap(base, st.st_size);
      delete s;
      return nullptr;
    }
  }
  return s;
}

void shard_close(void* h) {
  Shard* s = (Shard*)h;
  if (!s) return;
  munmap((void*)s->base, s->size);
  delete s;
}

int64_t shard_len(void* h) { return ((Shard*)h)->n_items; }
int32_t shard_n_mels(void* h) { return ((Shard*)h)->n_mels; }

void shard_lens(void* h, const int64_t* idx, int n, int32_t* text_lens,
                int32_t* mel_frames) {
  Shard* s = (Shard*)h;
  for (int i = 0; i < n; ++i) {
    const uint64_t* e = s->index + idx[i] * 4;
    text_lens[i] = (int32_t)e[1];
    mel_frames[i] = (int32_t)e[3];
  }
}

// Single-call batch assembly: text ids padded/truncated to [batch,
// text_cap] i32, mels to [batch, mel_cap, n_mels] f32 (converted from the
// stored f16), clamped lengths out — exactly data/batching.py::collate.
void shard_collate(void* h, const int64_t* idx, int batch, int64_t text_cap,
                   int64_t mel_cap, int32_t* text_out, float* mel_out,
                   int32_t* tlen_out, int32_t* mlen_out) {
  Shard* s = (Shard*)h;
  const int64_t d = s->n_mels;
  for (int b = 0; b < batch; ++b) {
    const uint64_t* e = s->index + idx[b] * 4;
    const int32_t* ids = (const int32_t*)(s->base + e[0]);
    const uint16_t* mel = (const uint16_t*)(s->base + e[2]);
    int64_t tl = std::min<int64_t>((int64_t)e[1], text_cap);
    int64_t ml = std::min<int64_t>((int64_t)e[3], mel_cap);
    int32_t* tdst = text_out + (int64_t)b * text_cap;
    memcpy(tdst, ids, sizeof(int32_t) * tl);
    memset(tdst + tl, 0, sizeof(int32_t) * (text_cap - tl));
    float* mdst = mel_out + (int64_t)b * mel_cap * d;
    for (int64_t t = 0; t < ml * d; ++t) mdst[t] = f16_to_f32(mel[t]);
    memset(mdst + ml * d, 0, sizeof(float) * (mel_cap - ml) * d);
    tlen_out[b] = (int32_t)tl;
    mlen_out[b] = (int32_t)ml;
  }
}

}  // extern "C"
