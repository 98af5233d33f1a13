// Native wav decode + mono downmix + polyphase resample.
//
// The TPU compute path is JAX/XLA; this is the host-side data-loader hot
// path (the reference used torchaudio's C++ decoders for the same role,
// datasets/datasets.py:112-129). Exposed through a C ABI consumed via
// ctypes (lct_gan_tpu/ops/native/wav_loader.py).
//
// Build: see lct_gan_tpu/ops/native/build.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr uint16_t kPcm = 0x0001;
constexpr uint16_t kFloat = 0x0003;
constexpr uint16_t kExtensible = 0xFFFE;

struct WavData {
  std::vector<float> mono;  // downmixed samples
  int sample_rate = 0;
};

bool ReadFile(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    std::fclose(f);
    return false;
  }
  out->resize(static_cast<size_t>(size));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  return got == out->size();
}

uint32_t ReadU32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

uint16_t ReadU16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

// Parse RIFF/WAVE, decode PCM/float payload, downmix to mono.
bool DecodeWav(const std::vector<uint8_t>& buf, WavData* out) {
  if (buf.size() < 12 || std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0) {
    return false;
  }
  uint16_t fmt_code = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_size = 0;

  size_t pos = 12;
  while (pos + 8 <= buf.size()) {
    const uint8_t* chunk = buf.data() + pos;
    uint32_t csize = ReadU32(chunk + 4);
    const uint8_t* payload = chunk + 8;
    if (pos + 8 + csize > buf.size()) {
      csize = static_cast<uint32_t>(buf.size() - pos - 8);
    }
    if (std::memcmp(chunk, "fmt ", 4) == 0 && csize >= 16) {
      fmt_code = ReadU16(payload);
      channels = ReadU16(payload + 2);
      sample_rate = ReadU32(payload + 4);
      bits = ReadU16(payload + 14);
      if (fmt_code == kExtensible && csize >= 40) {
        fmt_code = ReadU16(payload + 24);
      }
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      data = payload;
      data_size = csize;
    }
    pos += 8 + csize + (csize & 1);
  }
  if (!channels || !sample_rate || !data) return false;

  const size_t bytes_per = bits / 8;
  const size_t n_frames = data_size / (bytes_per * channels);
  out->mono.resize(n_frames);
  out->sample_rate = static_cast<int>(sample_rate);
  const float inv_ch = 1.0f / static_cast<float>(channels);

  for (size_t i = 0; i < n_frames; ++i) {
    float acc = 0.0f;
    for (size_t c = 0; c < channels; ++c) {
      const uint8_t* p = data + (i * channels + c) * bytes_per;
      float v = 0.0f;
      if (fmt_code == kPcm) {
        if (bits == 16) {
          int16_t s;
          std::memcpy(&s, p, 2);
          v = static_cast<float>(s) / 32768.0f;
        } else if (bits == 32) {
          int32_t s;
          std::memcpy(&s, p, 4);
          v = static_cast<float>(s) / 2147483648.0f;
        } else if (bits == 24) {
          int32_t s = static_cast<int32_t>(p[0]) |
                      (static_cast<int32_t>(p[1]) << 8) |
                      (static_cast<int32_t>(p[2]) << 16);
          if (s & 0x800000) s -= 0x1000000;
          v = static_cast<float>(s) / 8388608.0f;
        } else if (bits == 8) {
          v = (static_cast<float>(p[0]) - 128.0f) / 128.0f;
        } else {
          return false;
        }
      } else if (fmt_code == kFloat) {
        if (bits == 32) {
          float s;
          std::memcpy(&s, p, 4);
          v = s;
        } else if (bits == 64) {
          double s;
          std::memcpy(&s, p, 8);
          v = static_cast<float>(s);
        } else {
          return false;
        }
      } else {
        return false;
      }
      acc += v;
    }
    out->mono[i] = acc * inv_ch;
  }
  return true;
}

int Gcd(int a, int b) { return b == 0 ? a : Gcd(b, a % b); }

// Windowed-sinc polyphase resampler (Kaiser-windowed lowpass, zero-phase),
// functionally equivalent to scipy.signal.resample_poly defaults.
void ResamplePoly(const std::vector<float>& in, int up, int down,
                  std::vector<float>* out) {
  // Filter design: half_len = 10 * max(up, down), Kaiser beta 5.0,
  // cutoff at min(1/up, 1/down) of Nyquist (scipy resample_poly default).
  const int max_rate = up > down ? up : down;
  const int half_len = 10 * max_rate;
  const int n_taps = 2 * half_len + 1;
  const double fc = 1.0 / static_cast<double>(max_rate);  // normalized (0,1]
  const double beta = 5.0;

  auto bessel_i0 = [](double x) {
    double sum = 1.0, term = 1.0;
    for (int k = 1; k < 64; ++k) {
      term *= (x / (2.0 * k)) * (x / (2.0 * k));
      sum += term;
      if (term < 1e-16 * sum) break;
    }
    return sum;
  };

  std::vector<double> h(n_taps);
  const double i0b = bessel_i0(beta);
  for (int i = 0; i < n_taps; ++i) {
    const double m = i - half_len;
    const double x = m * fc;
    const double sinc = (m == 0) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
    const double r = m / half_len;
    const double w = bessel_i0(beta * std::sqrt(1.0 - r * r)) / i0b;
    h[i] = fc * sinc * w * up;
  }

  const long n_in = static_cast<long>(in.size());
  const long n_out = (n_in * up + down - 1) / down;
  out->assign(n_out, 0.0f);

  auto ceil_div = [](long a, long b) {
    return a / b + ((a % b != 0 && (a > 0) == (b > 0)) ? 1 : 0);
  };

  // Taps as float: the data is float PCM and the parity budget vs scipy
  // is 1e-3 (tests/test_native_wav.py); 61-tap float accumulation errs
  // ~1e-6. Built with -ffast-math so the reductions below vectorize.
  std::vector<float> hf(h.begin(), h.end());

  if (up == 1) {
    // Pure decimation (the 48 kHz->16 kHz corpus case): contiguous
    // n_taps-tap FIR at stride `down`. This specialization is the host
    // data-loader hot loop -- the generic zero-stuffed form below ran
    // scalar (~6.7 ms per 4 s file; this runs ~10x faster) and made a
    // 1-core host input-bound at B=64 (tools/bench_input_pipeline.py).
    const long j_lo = ceil_div(half_len, static_cast<long>(down));
    long j_hi = (n_in - half_len - 1) / down;  // base + n_taps <= n_in
    if (j_hi >= n_out) j_hi = n_out - 1;
    const float* x = in.data();
    for (long j = (j_lo < n_out ? j_lo : n_out); j <= j_hi; ++j) {
      const float* xp = x + (j * down - half_len);
      float acc = 0.0f;
      for (int k = 0; k < n_taps; ++k) acc += hf[k] * xp[k];
      (*out)[j] = acc;
    }
    // Boundary outputs: clamped tap range (identical formula).
    for (long j = 0; j < n_out; ++j) {
      if (j >= j_lo && j <= j_hi) continue;
      const long lo = j * down - half_len;
      long i_first = lo < 0 ? 0 : lo;
      long i_last = j * down + half_len;
      if (i_last >= n_in) i_last = n_in - 1;
      float acc = 0.0f;
      for (long i = i_first; i <= i_last; ++i) acc += hf[i - lo] * in[i];
      (*out)[j] = acc;
    }
    return;
  }

  // y[j] = sum_k h[k] * x_up[j*down - half_len + k], x_up = zero-stuffed;
  // only upsampled indices that are multiples of `up` carry real samples.
  for (long j = 0; j < n_out; ++j) {
    const long lo = j * down - half_len;
    const long hi = j * down + half_len;
    long i_first = ceil_div(lo, static_cast<long>(up));
    if (i_first < 0) i_first = 0;
    long i_last = hi / up;
    if (i_last >= n_in) i_last = n_in - 1;
    float acc = 0.0f;
    for (long i = i_first; i <= i_last; ++i) {
      acc += hf[i * up - lo] * in[i];
    }
    (*out)[j] = acc;
  }
}

}  // namespace

extern "C" {

// Decode wav at `path`, downmix to mono, resample to `target_sr` (0 = keep
// native rate). Returns sample count, fills *out_sr; caller then copies out
// of the thread-local buffer via lct_copy_samples. Returns -1 on error.
static thread_local std::vector<float> g_buffer;

long lct_load_mono_wave(const char* path, int target_sr, int* out_sr) {
  std::vector<uint8_t> raw;
  if (!ReadFile(path, &raw)) return -1;
  WavData wav;
  if (!DecodeWav(raw, &wav)) return -1;

  if (target_sr > 0 && target_sr != wav.sample_rate) {
    const int g = Gcd(target_sr, wav.sample_rate);
    std::vector<float> resampled;
    ResamplePoly(wav.mono, target_sr / g, wav.sample_rate / g, &resampled);
    g_buffer = std::move(resampled);
    *out_sr = target_sr;
  } else {
    g_buffer = std::move(wav.mono);
    *out_sr = wav.sample_rate;
  }
  return static_cast<long>(g_buffer.size());
}

void lct_copy_samples(float* dst, long n) {
  if (n > static_cast<long>(g_buffer.size())) {
    n = static_cast<long>(g_buffer.size());
  }
  std::memcpy(dst, g_buffer.data(), static_cast<size_t>(n) * sizeof(float));
}

}  // extern "C"
