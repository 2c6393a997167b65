// libsirdsp — native host-side DSP for speech_intent_recognizer_tpu.
//
// Owns the host hot loops the reference delegated to torchaudio's C++
// backend (audio decode at scripts/precompute_features.py:47 and
// preprocess_fsc.py:34 of the reference; resampling at
// precompute_features.py:54-56):
//
//   * RIFF/WAVE parsing (PCM 8/16/24/32, IEEE float32/64, EXTENSIBLE)
//   * MP3 decode via libmpg123 (dlopen'd; the bundled gTTS corpus is MP3
//     with a .wav extension)
//   * bandlimited sinc resampling — the exact polyphase Hann-windowed-sinc
//     algorithm of torchaudio's sinc_interp_hann resampler, matching the
//     NumPy implementation in ops/resample.py bit-for-bit at f64
//
// C ABI only (ctypes-friendly). All outputs are malloc'd float32 buffers
// released by sirdsp_free().

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrDecode = -3;
constexpr int kErrNoMp3 = -4;

// ---------------------------------------------------------------- WAV parse

struct WavData {
  std::vector<float> samples;  // interleaved
  int channels = 0;
  int rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

int parse_wav(const std::vector<uint8_t>& data, WavData* out) {
  if (data.size() < 44 || memcmp(data.data(), "RIFF", 4) != 0 ||
      memcmp(data.data() + 8, "WAVE", 4) != 0)
    return kErrFormat;
  size_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* body = nullptr;
  size_t body_len = 0;
  while (pos + 8 <= data.size()) {
    const uint8_t* p = data.data() + pos;
    uint32_t chunk = rd_u32(p + 4);
    size_t avail = data.size() - pos - 8;
    size_t clen = chunk < avail ? chunk : avail;
    if (memcmp(p, "fmt ", 4) == 0 && clen >= 16) {
      fmt = rd_u16(p + 8);
      channels = rd_u16(p + 10);
      rate = rd_u32(p + 12);
      bits = rd_u16(p + 22);
      if (fmt == 0xFFFE && clen >= 40) fmt = rd_u16(p + 8 + 24);
    } else if (memcmp(p, "data", 4) == 0) {
      body = p + 8;
      body_len = clen;
    }
    pos += 8 + clen + (clen & 1);
  }
  if (!body || channels == 0 || rate == 0) return kErrFormat;

  size_t n = 0;
  std::vector<float> x;
  if (fmt == 1) {  // PCM
    if (bits == 16) {
      n = body_len / 2;
      x.resize(n);
      for (size_t i = 0; i < n; i++) {
        int16_t v = (int16_t)rd_u16(body + 2 * i);
        x[i] = (float)v / 32768.0f;
      }
    } else if (bits == 8) {
      n = body_len;
      x.resize(n);
      for (size_t i = 0; i < n; i++) x[i] = ((float)body[i] - 128.0f) / 128.0f;
    } else if (bits == 24) {
      n = body_len / 3;
      x.resize(n);
      for (size_t i = 0; i < n; i++) {
        int32_t v = (int32_t)body[3 * i] | ((int32_t)body[3 * i + 1] << 8) |
                    ((int32_t)body[3 * i + 2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        x[i] = (float)v / 8388608.0f;
      }
    } else if (bits == 32) {
      n = body_len / 4;
      x.resize(n);
      for (size_t i = 0; i < n; i++) {
        int32_t v = (int32_t)rd_u32(body + 4 * i);
        x[i] = (float)((double)v / 2147483648.0);
      }
    } else {
      return kErrFormat;
    }
  } else if (fmt == 3) {  // IEEE float
    if (bits == 32) {
      n = body_len / 4;
      x.resize(n);
      memcpy(x.data(), body, n * 4);
    } else if (bits == 64) {
      n = body_len / 8;
      x.resize(n);
      for (size_t i = 0; i < n; i++) {
        double d;
        memcpy(&d, body + 8 * i, 8);
        x[i] = (float)d;
      }
    } else {
      return kErrFormat;
    }
  } else {
    return kErrFormat;
  }
  out->samples = std::move(x);
  out->channels = channels;
  out->rate = (int)rate;
  return 0;
}

// ---------------------------------------------------------------- MP3 (mpg123)

struct Mpg123Api {
  void* handle = nullptr;
  int (*init)() = nullptr;
  void* (*make)(const char*, int*) = nullptr;
  int (*open)(void*, const char*) = nullptr;
  int (*getformat)(void*, long*, int*, int*) = nullptr;
  int (*format_none)(void*) = nullptr;
  int (*format)(void*, long, int, int) = nullptr;
  int (*read)(void*, void*, size_t, size_t*) = nullptr;
  int (*close)(void*) = nullptr;
  void (*del)(void*) = nullptr;
};

Mpg123Api* mp3_api() {
  static Mpg123Api api;
  static bool tried = false;
  if (tried) return api.handle ? &api : nullptr;
  tried = true;
  const char* names[] = {"libmpg123.so.0", "libmpg123.so"};
  for (const char* name : names) {
    api.handle = dlopen(name, RTLD_NOW | RTLD_LOCAL);
    if (api.handle) break;
  }
  if (!api.handle) return nullptr;
  api.init = (int (*)())dlsym(api.handle, "mpg123_init");
  api.make = (void* (*)(const char*, int*))dlsym(api.handle, "mpg123_new");
  api.open = (int (*)(void*, const char*))dlsym(api.handle, "mpg123_open");
  api.getformat = (int (*)(void*, long*, int*, int*))dlsym(api.handle,
                                                           "mpg123_getformat");
  api.format_none = (int (*)(void*))dlsym(api.handle, "mpg123_format_none");
  api.format =
      (int (*)(void*, long, int, int))dlsym(api.handle, "mpg123_format");
  api.read = (int (*)(void*, void*, size_t, size_t*))dlsym(api.handle,
                                                           "mpg123_read");
  api.close = (int (*)(void*))dlsym(api.handle, "mpg123_close");
  api.del = (void (*)(void*))dlsym(api.handle, "mpg123_delete");
  if (!api.init || !api.make || !api.open || !api.getformat || !api.format ||
      !api.format_none || !api.read || !api.close || !api.del) {
    api.handle = nullptr;
    return nullptr;
  }
  api.init();
  return &api;
}

constexpr int MPG123_OK = 0;
constexpr int MPG123_DONE = -12;
constexpr int MPG123_NEW_FORMAT = -11;
constexpr int MPG123_ENC_FLOAT_32 = 0x200;

int decode_mp3(const char* path, WavData* out) {
  Mpg123Api* api = mp3_api();
  if (!api) return kErrNoMp3;
  int err = 0;
  void* h = api->make(nullptr, &err);
  if (!h) return kErrDecode;
  int ret = kErrDecode;
  do {
    api->format_none(h);
    const long rates[] = {8000,  11025, 12000, 16000, 22050,
                          24000, 32000, 44100, 48000};
    for (long r : rates)
      for (int ch = 1; ch <= 2; ch++) api->format(h, r, ch, MPG123_ENC_FLOAT_32);
    if (api->open(h, path) != MPG123_OK) { ret = kErrOpen; break; }
    long rate = 0;
    int channels = 0, enc = 0;
    if (api->getformat(h, &rate, &channels, &enc) != MPG123_OK ||
        enc != MPG123_ENC_FLOAT_32 || channels <= 0) {
      api->close(h);
      break;
    }
    std::vector<float> samples;
    std::vector<uint8_t> buf(1 << 16);
    for (;;) {
      size_t done = 0;
      int rc = api->read(h, buf.data(), buf.size(), &done);
      if (done) {
        size_t nf = done / sizeof(float);
        const float* f = (const float*)buf.data();
        samples.insert(samples.end(), f, f + nf);
      }
      if (rc == MPG123_DONE) { ret = 0; break; }
      if (rc != MPG123_OK && rc != MPG123_NEW_FORMAT) {
        ret = samples.empty() ? kErrDecode : 0;
        break;
      }
    }
    api->close(h);
    if (ret == 0) {
      out->samples = std::move(samples);
      out->channels = channels;
      out->rate = (int)rate;
    }
  } while (false);
  api->del(h);
  return ret;
}

}  // namespace

// ---------------------------------------------------------------------------
// Streaming log-mel featurizer.
//
// Native counterpart of infer/streaming.StreamingFeaturizer's per-chunk hot
// loop (window multiply + rFFT + power + mel projection + dB), the host-side
// cost that bounds concurrent serving sessions (reference live path:
// scripts/testing.py:111-170 recomputes librosa features from scratch each
// time; here features accrue incrementally).  All state lives in
// caller-owned (NumPy) memory — the C side is stateless: a small i64 state
// vector {n, left_filled, frames_done}, the shared prepared-signal buffer
// [left reflect pad | raw signal], and the mel output rows.  This keeps
// Python's views (_signal/_prepared) valid and needs no handle lifetimes.

namespace {

// rFFT plan: half-size complex FFT (even/odd packing) + untangle, float
// data with double-computed twiddle tables, cached per n_fft.
struct RfftPlan {
  int n = 0;  // rFFT length
  int m = 0;  // n/2: complex FFT size
  std::vector<int> rev;               // bit-reversal permutation (size m)
  std::vector<float> wre, wim;        // W_m^k, k < m/2 (stage twiddles)
  std::vector<float> ure, uim;        // e^{-2*pi*i*k/n}, k <= m (untangle)
  std::vector<float> zre, zim;        // FFT work buffers (size m)
  std::vector<float> power;           // |X_k|^2, k <= m
};

RfftPlan* get_rfft_plan(int n) {
  thread_local RfftPlan plan;
  if (plan.n == n) return &plan;
  int m = n / 2;
  plan.n = n;
  plan.m = m;
  plan.rev.assign((size_t)m, 0);
  for (int i = 1, j = 0; i < m; i++) {
    int bit = m >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j |= bit;
    plan.rev[(size_t)i] = j;
  }
  plan.wre.assign((size_t)(m / 2), 0.0f);
  plan.wim.assign((size_t)(m / 2), 0.0f);
  for (int k = 0; k < m / 2; k++) {
    double a = -2.0 * M_PI * k / m;
    plan.wre[(size_t)k] = (float)std::cos(a);
    plan.wim[(size_t)k] = (float)std::sin(a);
  }
  plan.ure.assign((size_t)(m + 1), 0.0f);
  plan.uim.assign((size_t)(m + 1), 0.0f);
  for (int k = 0; k <= m; k++) {
    double a = -2.0 * M_PI * k / n;
    plan.ure[(size_t)k] = (float)std::cos(a);
    plan.uim[(size_t)k] = (float)std::sin(a);
  }
  plan.zre.assign((size_t)m, 0.0f);
  plan.zim.assign((size_t)m, 0.0f);
  plan.power.assign((size_t)(m + 1), 0.0f);
  return &plan;
}

// Windowed rFFT power spectrum of frame[n] into plan->power[0..m].
void rfft_power(RfftPlan* p, const float* frame, const float* window) {
  int m = p->m;
  float* zre = p->zre.data();
  float* zim = p->zim.data();
  // pack even/odd windowed samples as one complex sequence, bit-reversed
  for (int i = 0; i < m; i++) {
    int j = p->rev[(size_t)i];
    zre[i] = frame[2 * j] * window[2 * j];
    zim[i] = frame[2 * j + 1] * window[2 * j + 1];
  }
  for (int len = 2; len <= m; len <<= 1) {
    int half = len / 2, step = m / len;
    for (int i = 0; i < m; i += len) {
      for (int j = 0; j < half; j++) {
        float cr = p->wre[(size_t)(j * step)];
        float ci = p->wim[(size_t)(j * step)];
        int a = i + j, b = i + j + half;
        float tr = zre[b] * cr - zim[b] * ci;
        float ti = zre[b] * ci + zim[b] * cr;
        zre[b] = zre[a] - tr;
        zim[b] = zim[a] - ti;
        zre[a] += tr;
        zim[a] += ti;
      }
    }
  }
  // untangle: X[k] = Ze + e^{-2pi i k/n} * (-i) * Zo, Z[m] wraps to Z[0]
  float* pow = p->power.data();
  for (int k = 0; k <= m; k++) {
    int kk = k == m ? 0 : k;
    int mk = (m - k) == m ? 0 : (m - k);
    float ar = zre[kk], ai = zim[kk];
    float br = zre[mk], bi = -zim[mk];  // conj(Z[m-k])
    float er = 0.5f * (ar + br), ei = 0.5f * (ai + bi);
    float or_ = 0.5f * (ar - br), oi = 0.5f * (ai - bi);
    float ur = p->ure[(size_t)k], ui = p->uim[(size_t)k];
    // X = E + (-i*u) * O;  -i*u = ui - i*ur
    float xr = er + ui * or_ + ur * oi;
    float xi = ei + ui * oi - ur * or_;
    pow[k] = xr * xr + xi * xi;
  }
}

// One frame: windowed rFFT power -> mel -> dB.  mel_fb is row-major
// (n_fft/2+1, n_mels) — torchaudio layout (frontend_jax.FrontendParams).
void mel_db_frame(const float* frame, const float* window,
                  const float* mel_fb, int n_fft, int n_mels, float* out) {
  RfftPlan* plan = get_rfft_plan(n_fft);
  rfft_power(plan, frame, window);
  int n_freqs = n_fft / 2 + 1;
  const float* pow = plan->power.data();
  thread_local std::vector<float> acc;
  acc.assign((size_t)n_mels, 0.0f);
  float* a = acc.data();
  for (int k = 0; k < n_freqs; k++) {
    float pk = pow[k];
    const float* fbk = mel_fb + (size_t)k * n_mels;
    for (int m = 0; m < n_mels; m++) a[m] += pk * fbk[m];
  }
  for (int m = 0; m < n_mels; m++) {
    float v = a[m] < 1e-10f ? 1e-10f : a[m];
    out[m] = 10.0f * std::log10(v);
  }
}

// Mirror sig[1 : k+1] into the left pad region as samples become available
// (StreamingFeaturizer._fill_left_pad semantics).
void fill_left_pad(float* prep_buf, int pad, long long n,
                   long long* left_filled) {
  if (*left_filled >= pad) return;
  long long avail = n - 1 < (long long)pad ? n - 1 : (long long)pad;
  for (long long i = *left_filled; i < avail; i++)
    prep_buf[pad - 1 - i] = prep_buf[pad + 1 + i];
  if (avail > *left_filled) *left_filled = avail;
}

}  // namespace

extern "C" {

int sirdsp_version() { return 1; }

void sirdsp_free(float* p) { free(p); }

// Decode a WAV or MP3 file. On success fills *data (malloc'd interleaved
// float32, frames*channels), *frames, *channels, *rate; returns 0.
int sirdsp_decode_file(const char* path, float** data, long long* frames,
                       int* channels, int* rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> head(size > 12 ? 12 : (size_t)size);
  if (fread(head.data(), 1, head.size(), f) != head.size()) {
    fclose(f);
    return kErrOpen;
  }

  WavData wav;
  int ret;
  bool is_wav = head.size() >= 12 && memcmp(head.data(), "RIFF", 4) == 0 &&
                memcmp(head.data() + 8, "WAVE", 4) == 0;
  if (is_wav) {
    std::vector<uint8_t> blob((size_t)size);
    fseek(f, 0, SEEK_SET);
    if (fread(blob.data(), 1, blob.size(), f) != blob.size()) {
      fclose(f);
      return kErrOpen;
    }
    fclose(f);
    ret = parse_wav(blob, &wav);
  } else {
    fclose(f);
    ret = decode_mp3(path, &wav);
    if (ret == kErrNoMp3 || ret == kErrFormat) {
      // last resort: try WAV parse anyway
      FILE* g = fopen(path, "rb");
      if (g) {
        std::vector<uint8_t> blob((size_t)size);
        if (fread(blob.data(), 1, blob.size(), g) == blob.size())
          ret = parse_wav(blob, &wav);
        fclose(g);
      }
    }
  }
  if (ret != 0) return ret;

  size_t n = wav.samples.size();
  float* out = (float*)malloc(n * sizeof(float));
  if (!out) return kErrDecode;
  memcpy(out, wav.samples.data(), n * sizeof(float));
  *data = out;
  *channels = wav.channels;
  *frames = (long long)(n / (size_t)wav.channels);
  *rate = wav.rate;
  return 0;
}

// Bandlimited sinc resample (mono float32). Returns the output length and
// fills *out_data (malloc'd), or a negative error code.
long long sirdsp_resample(const float* x, long long n, int orig_freq,
                          int new_freq, int lowpass_filter_width,
                          double rolloff, float** out_data) {
  if (n < 0 || orig_freq <= 0 || new_freq <= 0) return kErrFormat;
  if (orig_freq == new_freq) {
    float* out = (float*)malloc((size_t)n * sizeof(float));
    if (!out) return kErrDecode;
    memcpy(out, x, (size_t)n * sizeof(float));
    *out_data = out;
    return n;
  }
  // gcd reduction
  long long a = orig_freq, b = new_freq;
  while (b) { long long t = a % b; a = b; b = t; }
  int orig = (int)(orig_freq / a), nw = (int)(new_freq / a);

  double base_freq = (orig < nw ? orig : nw) * rolloff;
  int width = (int)std::ceil(lowpass_filter_width * orig / base_freq);
  int klen = 2 * width + orig;

  // polyphase kernels: kernel[i][j], i in [0, nw), j in [0, klen)
  std::vector<double> kernel((size_t)nw * klen);
  for (int i = 0; i < nw; i++) {
    for (int j = 0; j < klen; j++) {
      double idx = (double)(j - width) / orig;
      double t = (-(double)i / nw + idx) * base_freq;
      if (t > lowpass_filter_width) t = lowpass_filter_width;
      if (t < -lowpass_filter_width) t = -lowpass_filter_width;
      double window = std::cos(t * M_PI / lowpass_filter_width / 2.0);
      window *= window;
      double tp = t * M_PI;
      double sinc = (tp == 0.0) ? 1.0 : std::sin(tp) / tp;
      kernel[(size_t)i * klen + j] = sinc * window * (base_freq / orig);
    }
  }

  long long target = (long long)std::ceil((double)nw * n / orig);
  float* out = (float*)malloc((size_t)target * sizeof(float));
  if (!out) return kErrDecode;

  // x padded conceptually by `width` zeros left and `width + orig` right
  long long blocks = (n + 2LL * width + orig - klen) / orig + 1;
  long long emitted = 0;
  for (long long blk = 0; blk < blocks && emitted < target; blk++) {
    long long start = blk * orig - width;  // position in x of kernel tap 0
    for (int i = 0; i < nw && emitted < target; i++) {
      const double* k = &kernel[(size_t)i * klen];
      double acc = 0.0;
      long long j0 = start < 0 ? -start : 0;
      long long j1 = klen;
      if (start + j1 > n) j1 = n - start;
      for (long long j = j0; j < j1; j++) acc += (double)x[start + j] * k[j];
      out[emitted++] = (float)acc;
    }
  }
  while (emitted < target) out[emitted++] = 0.0f;
  *out_data = out;
  return target;
}

// Mean absolute energy of a chunk (the VAD detector's per-chunk hot op —
// reference scripts/testing.py:38-47 semantics).
double sirdsp_mean_abs(const float* x, long long n) {
  if (n <= 0) return 0.0;
  double acc = 0.0;
  for (long long i = 0; i < n; i++) acc += std::fabs((double)x[i]);
  return acc / (double)n;
}

// Streaming featurizer: append a chunk, emit all newly-complete frames.
//
//   st       i64[3] {n, left_filled, frames_done}, zero-initialized
//   prep_buf float[pad + max_samples]: [left reflect pad | raw signal]
//   mel_out  float[cap_frames * n_mels]: emitted dB-mel rows
//
// Frame t is read at prep_buf[t*hop : t*hop + n_fft] once n > pad (the left
// reflect region is final by then) — identical math and gating to
// StreamingFeaturizer.feed.  Returns frames_done, or -1 on a bad n_fft.
long long sirdsp_stream_feed(long long* st, float* prep_buf, float* mel_out,
                             const float* chunk, long long chunk_n,
                             const float* window, const float* mel_fb,
                             int n_fft, int hop, int n_mels,
                             long long max_samples, long long cap_frames) {
  if (n_fft <= 0 || (n_fft & (n_fft - 1)) || hop <= 0) return -1;
  int pad = n_fft / 2;
  long long n = st[0], left_filled = st[1], frames_done = st[2];

  long long space = max_samples - n;
  long long take = chunk_n < space ? chunk_n : space;
  if (take > 0) {
    memcpy(prep_buf + pad + n, chunk, (size_t)take * sizeof(float));
    n += take;
  }
  fill_left_pad(prep_buf, pad, n, &left_filled);

  long long num = n + pad - n_fft;
  long long avail = num < 0 ? 0 : num / hop + 1;
  long long total_frames = 1 + n / hop;
  if (avail > total_frames) avail = total_frames;
  if (avail > cap_frames) avail = cap_frames;
  if (avail > frames_done && n > pad) {
    for (long long t = frames_done; t < avail; t++)
      mel_db_frame(prep_buf + t * hop, window, mel_fb, n_fft, n_mels,
                   mel_out + t * n_mels);
    frames_done = avail;
  }
  st[0] = n;
  st[1] = left_filled;
  st[2] = frames_done;
  return frames_done;
}

// Complete the utterance: right reflect tail + remaining frames — the
// native analog of StreamingFeaturizer.finalize's frame emission
// (normalization/pad stay in the caller).  Returns the total frame count.
long long sirdsp_stream_finalize(long long* st, float* prep_buf,
                                 float* mel_out, const float* window,
                                 const float* mel_fb, int n_fft, int hop,
                                 int n_mels, long long cap_frames) {
  if (n_fft <= 0 || (n_fft & (n_fft - 1)) || hop <= 0) return -1;
  int pad = n_fft / 2;
  long long n = st[0], left_filled = st[1], frames_done = st[2];
  long long total_frames = 1 + n / hop;
  if (total_frames > cap_frames) total_frames = cap_frames;
  long long remaining = total_frames - frames_done;
  if (remaining > 0 && n >= 2) {
    fill_left_pad(prep_buf, pad, n, &left_filled);
    // prepared = prep_buf[pad-left : pad+n] + sig[clip(n-2-i)] + zeros
    long long left = n - 1 < (long long)pad ? n - 1 : (long long)pad;
    long long need = (total_frames - 1) * hop + n_fft;
    std::vector<float> ext((size_t)need, 0.0f);
    long long have = left + n;
    long long c = have < need ? have : need;
    memcpy(ext.data(), prep_buf + (pad - left), (size_t)c * sizeof(float));
    const float* sig = prep_buf + pad;
    for (long long i = 0; i < (long long)pad && have + i < need; i++) {
      long long idx = n - 2 - i;
      if (idx < 0) idx = 0;
      ext[(size_t)(have + i)] = sig[idx];
    }
    for (long long t = frames_done; t < total_frames; t++)
      mel_db_frame(ext.data() + t * hop, window, mel_fb, n_fft, n_mels,
                   mel_out + t * n_mels);
    st[1] = left_filled;
    st[2] = total_frames;
  }
  return st[2];
}

}  // extern "C"
