// Threaded host-side data loader: wav file -> PCM decode -> (sinc resample to
// 16 kHz) -> log-mel fbank, assembled into padded batches in submission order
// behind a bounded prefetch window.
//
// TPU-native equivalent of the reference's C++ data path (fairseq2 DataPipeline
// read_text -> FileMapper -> AudioDecoder -> WaveformToFbankConverter -> bucket
// -> collate -> prefetch, reference cli/m4t/evaluate/evaluate.py:116-202, and
// the kaldi-native-fbank C++ feature extractor): the host assembles fixed-shape
// fbank batches off the critical path while the TPU consumes the previous one.
// Corrupted/unreadable files yield a zero-length item (the caller masks them,
// reference evaluate.py:205-245).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int seamless_fbank(const float* waveform, int64_t num_samples, int n_mels,
                   double sample_rate, float* out, int64_t max_frames);
int64_t seamless_wav_decode(const uint8_t* data, int64_t size, float* out,
                            int64_t max_samples, int32_t* sample_rate_out);
}

namespace {

constexpr int kTargetRate = 16000;

// Windowed-sinc (Hann) resampler, 16 zero-crossings per side with anti-alias
// cutoff for downsampling. Not bit-equal to scipy's polyphase path (the pure
// Python loader stays the parity reference); quality is far beyond what the
// 80-mel fbank resolves.
std::vector<float> resample_sinc(const std::vector<float>& in, int from, int to) {
  if (from == to || in.empty()) return in;
  const double ratio = static_cast<double>(to) / from;
  const int64_t n_in = static_cast<int64_t>(in.size());
  const int64_t n_out = static_cast<int64_t>(n_in * ratio);
  const int kHalf = 16;
  const double cutoff = std::min(1.0, ratio) * 0.97;
  std::vector<float> out(n_out);
  for (int64_t i = 0; i < n_out; i++) {
    const double center = i / ratio;
    const int64_t lo = std::max<int64_t>(0, (int64_t)std::floor(center) - kHalf + 1);
    const int64_t hi = std::min<int64_t>(n_in - 1, (int64_t)std::floor(center) + kHalf);
    double acc = 0.0;
    for (int64_t j = lo; j <= hi; j++) {
      const double d = center - j;
      const double x = d * cutoff;
      const double sinc = (x == 0.0) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
      const double win = 0.5 * (1.0 + std::cos(M_PI * d / kHalf));
      acc += in[j] * sinc * cutoff * win;
    }
    out[i] = static_cast<float>(acc);
  }
  return out;
}

struct Item {
  std::vector<float> feat;  // frames x n_mels
  int64_t frames = 0;
};

struct Loader {
  std::vector<std::string> paths;
  int batch, n_mels, bucket, window;
  std::vector<Item> items;
  std::unique_ptr<std::atomic<int>[]> done;  // 0 pending, 1 ok, -1 failed
  std::atomic<int64_t> next_work{0};
  std::atomic<bool> stop{false};
  int64_t cursor = 0;       // next item index to emit
  int64_t ready_count = 0;  // size of the batch staged by next_meta
  std::mutex mu;
  std::condition_variable cv_done;   // workers -> consumer
  std::condition_variable cv_space;  // consumer -> workers (prefetch window)
  std::vector<std::thread> workers;

  void work() {
    for (;;) {
      const int64_t i = next_work.fetch_add(1);
      if (i >= static_cast<int64_t>(paths.size()) || stop.load()) return;
      {  // bounded prefetch: don't run more than `window` items ahead
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] { return stop.load() || i < cursor + window; });
        if (stop.load()) return;
      }
      process(i);
      done[i].store(1);
      cv_done.notify_all();
    }
  }

  void process(int64_t i) {
    Item& it = items[i];
    std::ifstream f(paths[i], std::ios::binary | std::ios::ate);
    if (!f) return;
    const std::streamsize size = f.tellg();
    if (size < 44) return;
    f.seekg(0);
    std::vector<uint8_t> buf(static_cast<size_t>(size));
    if (!f.read(reinterpret_cast<char*>(buf.data()), size)) return;
    std::vector<float> wav(static_cast<size_t>(size) / 2 + 16);
    int32_t rate = 0;
    const int64_t n = seamless_wav_decode(buf.data(), size, wav.data(),
                                          static_cast<int64_t>(wav.size()), &rate);
    if (n <= 0 || rate <= 0) return;
    wav.resize(static_cast<size_t>(n));
    if (rate != kTargetRate) wav = resample_sinc(wav, rate, kTargetRate);
    if (static_cast<int64_t>(wav.size()) < 400) return;
    const int64_t max_frames = 1 + (static_cast<int64_t>(wav.size()) - 400) / 160;
    it.feat.resize(static_cast<size_t>(max_frames) * n_mels);
    const int got = seamless_fbank(wav.data(), static_cast<int64_t>(wav.size()),
                                   n_mels, kTargetRate, it.feat.data(), max_frames);
    if (got <= 0) { it.feat.clear(); return; }
    it.frames = got;
    it.feat.resize(static_cast<size_t>(got) * n_mels);
  }
};

}  // namespace

extern "C" {

// Paths: array of n UTF-8 C strings. Returns an opaque handle (never null on
// valid args; null on invalid args).
void* seamless_loader_create(const char* const* paths, int64_t n, int batch,
                             int n_mels, int bucket, int n_threads) {
  if (!paths || n < 0 || batch <= 0 || n_mels <= 0 || bucket <= 0) return nullptr;
  auto* L = new Loader();
  L->paths.reserve(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; i++) L->paths.emplace_back(paths[i]);
  L->batch = batch;
  L->n_mels = n_mels;
  L->bucket = bucket;
  L->window = batch * 4;
  L->items.resize(static_cast<size_t>(n));
  L->done = std::make_unique<std::atomic<int>[]>(static_cast<size_t>(std::max<int64_t>(n, 1)));
  for (int64_t i = 0; i < n; i++) L->done[i].store(0);
  const int nt = std::max(1, std::min(n_threads, 64));
  for (int t = 0; t < nt; t++)
    L->workers.emplace_back([L] { L->work(); });
  return L;
}

// Blocks until the next batch is fully extracted. Returns the item count
// (0 = end of data) and writes the padded frame length (a multiple of
// `bucket`, >= bucket even for all-failed batches).
int seamless_loader_next_meta(void* h, int64_t* frames_padded) {
  auto* L = static_cast<Loader*>(h);
  if (!L || !frames_padded) return -1;
  const int64_t n = static_cast<int64_t>(L->paths.size());
  if (L->cursor >= n) return 0;
  const int64_t end = std::min(n, L->cursor + L->batch);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_done.wait(lk, [&] {
      for (int64_t i = L->cursor; i < end; i++)
        if (L->done[i].load() == 0) return false;
      return true;
    });
  }
  int64_t maxf = 0;
  for (int64_t i = L->cursor; i < end; i++)
    maxf = std::max(maxf, L->items[i].frames);
  maxf = std::max<int64_t>(maxf, 1);
  *frames_padded = ((maxf + L->bucket - 1) / L->bucket) * L->bucket;
  L->ready_count = end - L->cursor;
  return static_cast<int>(L->ready_count);
}

// Copies the staged batch into out (count x frames_padded x n_mels, zero
// padded) and lengths (count), then advances. Call with the frames_padded
// returned by the matching next_meta.
int seamless_loader_next_data(void* h, int64_t frames_padded, float* out,
                              int32_t* lengths) {
  auto* L = static_cast<Loader*>(h);
  if (!L || !out || !lengths || L->ready_count <= 0) return -1;
  const int64_t count = L->ready_count;
  const size_t row = static_cast<size_t>(frames_padded) * L->n_mels;
  std::memset(out, 0, sizeof(float) * row * static_cast<size_t>(count));
  for (int64_t b = 0; b < count; b++) {
    Item& it = L->items[L->cursor + b];
    const int64_t frames = std::min(it.frames, frames_padded);
    if (frames > 0)
      std::memcpy(out + static_cast<size_t>(b) * row, it.feat.data(),
                  sizeof(float) * static_cast<size_t>(frames) * L->n_mels);
    lengths[b] = static_cast<int32_t>(frames);
    it.feat.clear();
    it.feat.shrink_to_fit();
  }
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->cursor += count;
    L->ready_count = 0;
  }
  L->cv_space.notify_all();
  return static_cast<int>(count);
}

void seamless_loader_destroy(void* h) {
  auto* L = static_cast<Loader*>(h);
  if (!L) return;
  L->stop.store(true);
  L->next_work.store(static_cast<int64_t>(L->paths.size()));
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->cursor = static_cast<int64_t>(L->paths.size()) + L->window;
  }
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
