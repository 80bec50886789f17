// Native audio runtime for qwen3-tts-tpu.
//
// The reference stack gets its host-side audio performance from third-party
// native libraries (libsndfile/librosa resampling, sox loudness norm —
// SURVEY.md §2.2). This is the first-party replacement: RIFF/WAVE codec,
// windowed-sinc polyphase resampler, peak normalization, and batched
// float->PCM16 conversion, exposed through a plain C ABI consumed via
// ctypes (see qwen3_tts_tpu/utils/native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode: returns number of frames, fills sample rate / channels.
// Supports PCM 8/16/24/32 and IEEE float32/64. Returns -1 on malformed input.
// Two-phase: call with out == nullptr to query the frame count.
// ---------------------------------------------------------------------------

static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

long qtts_wav_decode(const uint8_t* data, long n, float* out, long out_cap,
                     int* sample_rate, int* channels) {
  if (n < 44 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  long pos = 12;
  uint16_t fmt = 0, ch = 0, bits = 0;
  uint32_t sr = 0;
  while (pos + 8 <= n) {
    const uint8_t* cid = data + pos;
    uint32_t size = rd_u32(data + pos + 4);
    const uint8_t* body = data + pos + 8;
    if ((long)(pos + 8 + size) > n) size = (uint32_t)(n - pos - 8);
    if (memcmp(cid, "fmt ", 4) == 0 && size >= 16) {
      fmt = rd_u16(body);
      ch = rd_u16(body + 2);
      sr = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (fmt == 0xFFFE && size >= 40) fmt = rd_u16(body + 24);  // extensible
    } else if (memcmp(cid, "data", 4) == 0 && fmt != 0) {
      if (ch == 0 || bits == 0) return -1;
      long bytes_per = bits / 8;
      long frames = size / (bytes_per * ch);
      *sample_rate = (int)sr;
      *channels = (int)ch;
      if (out == nullptr) return frames;
      long want = std::min(frames, out_cap / ch);
      for (long f = 0; f < want; ++f) {
        for (int c = 0; c < ch; ++c) {
          const uint8_t* s = body + (f * ch + c) * bytes_per;
          float v = 0.f;
          if (fmt == 1) {  // integer PCM
            if (bits == 16) {
              int16_t x;
              memcpy(&x, s, 2);
              v = x / 32768.f;
            } else if (bits == 32) {
              int32_t x;
              memcpy(&x, s, 4);
              v = (float)(x / 2147483648.0);
            } else if (bits == 24) {
              int32_t x = (int32_t)s[0] | ((int32_t)s[1] << 8) |
                          ((int32_t)s[2] << 16);
              if (x & 0x800000) x -= 0x1000000;
              v = x / 8388608.f;
            } else if (bits == 8) {
              v = ((int)s[0] - 128) / 128.f;
            } else {
              return -1;
            }
          } else if (fmt == 3) {  // IEEE float
            if (bits == 32) {
              float x;
              memcpy(&x, s, 4);
              v = x;
            } else if (bits == 64) {
              double x;
              memcpy(&x, s, 8);
              v = (float)x;
            } else {
              return -1;
            }
          } else {
            return -1;
          }
          out[f * ch + c] = v;
        }
      }
      return want;
    }
    pos += 8 + size + (size & 1);
  }
  return -1;
}

// ---------------------------------------------------------------------------
// WAV encode (PCM16 mono/interleaved). Returns bytes written or required
// size when out == nullptr.
// ---------------------------------------------------------------------------

long qtts_wav_encode_pcm16(const float* in, long frames, int channels,
                           int sample_rate, uint8_t* out, long out_cap) {
  long data_bytes = frames * channels * 2;
  long total = 44 + data_bytes;
  if (out == nullptr) return total;
  if (out_cap < total) return -1;
  auto w32 = [&](long off, uint32_t v) {
    out[off] = v & 0xff;
    out[off + 1] = (v >> 8) & 0xff;
    out[off + 2] = (v >> 16) & 0xff;
    out[off + 3] = (v >> 24) & 0xff;
  };
  auto w16 = [&](long off, uint16_t v) {
    out[off] = v & 0xff;
    out[off + 1] = (v >> 8) & 0xff;
  };
  memcpy(out, "RIFF", 4);
  w32(4, (uint32_t)(36 + data_bytes));
  memcpy(out + 8, "WAVEfmt ", 8);
  w32(16, 16);
  w16(20, 1);
  w16(22, (uint16_t)channels);
  w32(24, (uint32_t)sample_rate);
  w32(28, (uint32_t)(sample_rate * channels * 2));
  w16(32, (uint16_t)(channels * 2));
  w16(34, 16);
  memcpy(out + 36, "data", 4);
  w32(40, (uint32_t)data_bytes);
  for (long i = 0; i < frames * channels; ++i) {
    float v = std::max(-1.f, std::min(1.f, in[i]));
    int16_t q = (int16_t)lrintf(v * 32767.f);
    w16(44 + i * 2, (uint16_t)q);
  }
  return total;
}

// ---------------------------------------------------------------------------
// Polyphase windowed-sinc resampler (Kaiser window), upsample-filter-
// decimate: y[m] = sum_k x[(m*D + k offsets)/U] h[...]. Matches
// scipy.signal.resample_poly's structure with a Kaiser(5.0)-windowed ideal
// low-pass of half-width min(pi/U, pi/D) and 10-taps-per-zero-crossing.
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

static long gcd_long(long a, long b) { return b == 0 ? a : gcd_long(b, a % b); }

long qtts_resample(const float* in, long n_in, int sr_in, int sr_out,
                   float* out, long out_cap) {
  if (sr_in == sr_out) {
    long n = std::min(n_in, out_cap);
    memcpy(out, in, n * sizeof(float));
    return n;
  }
  long g = gcd_long(sr_in, sr_out);
  long up = sr_out / g, down = sr_in / g;
  long n_out = (n_in * up + down - 1) / down;
  if (out == nullptr) return n_out;
  if (out_cap < n_out) return -1;

  // filter design (matches scipy.resample_poly defaults):
  // cutoff 1/max(up,down), 10 half-taps per phase, kaiser beta 5.0
  long max_rate = std::max(up, down);
  double f_c = 1.0 / (double)max_rate;
  long half_len = 10 * max_rate;
  long ntaps = 2 * half_len + 1;
  std::vector<double> h(ntaps);
  double beta = 5.0, denom = bessel_i0(beta);
  for (long i = 0; i < ntaps; ++i) {
    double t = (double)(i - half_len);
    double sinc = (t == 0.0) ? f_c : sin(M_PI * f_c * t) / (M_PI * t);
    double r = 2.0 * (double)i / (double)(ntaps - 1) - 1.0;
    double win = bessel_i0(beta * sqrt(std::max(0.0, 1.0 - r * r))) / denom;
    h[i] = sinc * win * (double)up;
  }

  // y[m] = sum_i x[i] * h[m*down - i*up + half_len]
  for (long m = 0; m < n_out; ++m) {
    long center = m * down;
    long i_min = std::max(0L, (center - half_len + up - 1) / up);
    long i_max = std::min(n_in - 1, (center + half_len) / up);
    double acc = 0.0;
    for (long i = i_min; i <= i_max; ++i) {
      long hi = center - i * up + half_len;
      acc += (double)in[i] * h[hi];
    }
    out[m] = (float)acc;
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// Peak normalization to a target dBFS (sox `norm` equivalent).
// ---------------------------------------------------------------------------

void qtts_peak_normalize(float* x, long n, float target_db) {
  float peak = 0.f;
  for (long i = 0; i < n; ++i) peak = std::max(peak, fabsf(x[i]));
  if (peak < 1e-12f) return;
  float gain = powf(10.f, target_db / 20.f) / peak;
  for (long i = 0; i < n; ++i) x[i] *= gain;
}

}  // extern "C"
