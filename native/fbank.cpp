// Native host-side audio frontend: kaldi-compatible 80-mel log filterbank + WAV
// PCM decode. TPU-native replacement for the reference's vendored
// kaldi-native-fbank C++ (ggml/examples/kaldi-native-fbank/csrc, 5.2k LoC) used by
// fairseq2's WaveformToFbankConverter — here a compact single-file implementation
// with a C ABI consumed from Python via ctypes (seamless_communication_tpu/native.py).
//
// Math matches audio/fbank.py exactly: 2^15 scale, 25ms/10ms framing, per-frame DC
// removal, preemphasis 0.97 (edge-replicated), povey window, 512-pt real FFT power
// spectrum, kaldi-mel triangular filters (20Hz..nyquist), natural log with floor.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kFrameLen = 400;
constexpr int kHop = 160;
constexpr int kNfft = 512;
constexpr int kBins = kNfft / 2 + 1;
constexpr double kMelFloor = 1.192092955078125e-07;
constexpr double kPreemph = 0.97;

double hz_to_mel(double f) { return 1127.0 * std::log(1.0 + f / 700.0); }

// Precomputed tables (initialized once, thread-safe in C++11).
struct Tables {
  std::vector<double> window;                 // povey, kFrameLen
  std::vector<double> mel;                    // kBins x n_mels
  std::vector<double> twiddle_re, twiddle_im; // radix-2 FFT twiddles
  int n_mels;
  double sample_rate;

  Tables(int n_mels_, double rate) : n_mels(n_mels_), sample_rate(rate) {
    window.resize(kFrameLen);
    for (int i = 0; i < kFrameLen; i++) {
      double hann = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / (kFrameLen - 1));
      window[i] = std::pow(hann, 0.85);
    }
    // mel filters, triangularized in mel space, no normalization
    mel.assign((size_t)kBins * n_mels, 0.0);
    double lo = hz_to_mel(20.0), hi = hz_to_mel(rate / 2.0);
    std::vector<double> pts(n_mels + 2);
    for (int m = 0; m < n_mels + 2; m++)
      pts[m] = lo + (hi - lo) * m / (n_mels + 1);
    for (int k = 0; k < kBins; k++) {
      double fhz = k * rate / kNfft;
      double fm = hz_to_mel(fhz);
      for (int m = 0; m < n_mels; m++) {
        double l = pts[m], c = pts[m + 1], r = pts[m + 2];
        double up = (fm - l) / (c - l), down = (r - fm) / (r - c);
        double v = std::min(up, down);
        if (v > 0) mel[(size_t)k * n_mels + m] = v;
      }
    }
  }
};

// iterative radix-2 complex FFT, n = kNfft
void fft512(double* re, double* im) {
  const int n = kNfft;
  // bit reversal
  for (int i = 1, j = 0; i < n; i++) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) { std::swap(re[i], re[j]); std::swap(im[i], im[j]); }
  }
  for (int len = 2; len <= n; len <<= 1) {
    double ang = -2.0 * M_PI / len;
    double wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (int k = 0; k < len / 2; k++) {
        int a = i + k, b = i + k + len / 2;
        double tr = re[b] * cr - im[b] * ci;
        double ti = re[b] * ci + im[b] * cr;
        re[b] = re[a] - tr; im[b] = im[a] - ti;
        re[a] += tr;        im[a] += ti;
        double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

} // namespace

extern "C" {

// waveform (float32, [-1,1]) -> fbank (num_frames x n_mels float32).
// Returns number of frames written (<= max_frames), or -1 on error.
int seamless_fbank(const float* waveform, int64_t num_samples, int n_mels,
                   double sample_rate, float* out, int64_t max_frames) {
  if (!waveform || !out || n_mels <= 0) return -1;
  static thread_local Tables* tables = nullptr;
  if (!tables || tables->n_mels != n_mels || tables->sample_rate != sample_rate)
    tables = new Tables(n_mels, sample_rate);

  if (num_samples < kFrameLen) return 0;
  int64_t n_frames = 1 + (num_samples - kFrameLen) / kHop;
  if (n_frames > max_frames) n_frames = max_frames;

  std::vector<double> frame(kFrameLen), re(kNfft), im(kNfft);
  for (int64_t t = 0; t < n_frames; t++) {
    const float* src = waveform + t * kHop;
    double mean = 0.0;
    for (int i = 0; i < kFrameLen; i++) mean += src[i];
    mean = mean * 32768.0 / kFrameLen;
    for (int i = 0; i < kFrameLen; i++) frame[i] = src[i] * 32768.0 - mean;
    // preemphasis with edge replication, then window
    for (int i = kFrameLen - 1; i >= 1; i--)
      frame[i] = (frame[i] - kPreemph * frame[i - 1]) * tables->window[i];
    frame[0] = (frame[0] - kPreemph * frame[0]) * tables->window[0];

    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    std::memcpy(re.data(), frame.data(), kFrameLen * sizeof(double));
    fft512(re.data(), im.data());

    float* dst = out + t * n_mels;
    for (int m = 0; m < n_mels; m++) dst[m] = 0.0f;
    for (int k = 0; k < kBins; k++) {
      double p = re[k] * re[k] + im[k] * im[k];
      const double* mrow = &tables->mel[(size_t)k * n_mels];
      for (int m = 0; m < n_mels; m++)
        dst[m] += (float)(p * mrow[m]);
    }
    for (int m = 0; m < n_mels; m++)
      dst[m] = (float)std::log(std::max((double)dst[m], kMelFloor));
  }
  return (int)n_frames;
}

// Decode PCM16/PCM32/float32 WAV bytes -> mono float32. Returns sample count
// written (<= max_samples); sample rate via out param. -1 on parse error.
int64_t seamless_wav_decode(const uint8_t* data, int64_t size, float* out,
                            int64_t max_samples, int32_t* sample_rate_out) {
  if (size < 44 || std::memcmp(data, "RIFF", 4) || std::memcmp(data + 8, "WAVE", 4))
    return -1;
  int64_t pos = 12;
  int fmt = 0, channels = 0, bits = 0;
  int32_t rate = 0;
  const uint8_t* body = nullptr;
  int64_t body_size = 0;
  while (pos + 8 <= size) {
    const uint8_t* id = data + pos;
    uint32_t csize;
    std::memcpy(&csize, data + pos + 4, 4);
    if (!std::memcmp(id, "fmt ", 4) && csize >= 16) {
      uint16_t f, ch, b;
      std::memcpy(&f, data + pos + 8, 2);
      std::memcpy(&ch, data + pos + 10, 2);
      std::memcpy(&rate, data + pos + 12, 4);
      std::memcpy(&b, data + pos + 22, 2);
      fmt = f; channels = ch; bits = b;
    } else if (!std::memcmp(id, "data", 4)) {
      body = data + pos + 8;
      body_size = csize;
      if (pos + 8 + body_size > size) body_size = size - pos - 8;
    }
    pos += 8 + csize + (csize & 1);
  }
  if (!body || channels <= 0) return -1;
  *sample_rate_out = rate;
  int64_t n;
  if (fmt == 3 && bits == 32) {
    n = body_size / 4 / channels;
    if (n > max_samples) n = max_samples;
    const float* s = (const float*)body;
    for (int64_t i = 0; i < n; i++) {
      double acc = 0;
      for (int c = 0; c < channels; c++) acc += s[i * channels + c];
      out[i] = (float)(acc / channels);
    }
  } else if (fmt == 1 && bits == 16) {
    n = body_size / 2 / channels;
    if (n > max_samples) n = max_samples;
    const int16_t* s = (const int16_t*)body;
    for (int64_t i = 0; i < n; i++) {
      double acc = 0;
      for (int c = 0; c < channels; c++) acc += s[i * channels + c] / 32768.0;
      out[i] = (float)(acc / channels);
    }
  } else if (fmt == 1 && bits == 32) {
    n = body_size / 4 / channels;
    if (n > max_samples) n = max_samples;
    const int32_t* s = (const int32_t*)body;
    for (int64_t i = 0; i < n; i++) {
      double acc = 0;
      for (int c = 0; c < channels; c++) acc += s[i * channels + c] / 2147483648.0;
      out[i] = (float)(acc / channels);
    }
  } else {
    return -1;
  }
  return n;
}

} // extern "C"
