// owc_runtime — native runtime support for the TPU Whisper framework.
//
// The reference delegates its runtime to PyTorch/HF internals (C++ ATen, HF
// datasets workers); here the host-side runtime is native C++ behind a C ABI
// consumed via ctypes (no pybind11 in the image):
//
//   1. BatchLoader: threaded audio batch assembler — linear resample to
//      16 kHz, pad/trim to the fixed window, write into a double-buffered
//      batch array so feature prep overlaps TPU compute (the role HF
//      `datasets.map(num_proc=4)` plays in the reference,
//      `experimental_pruning.py:2723-2729`).
//   2. Sparse codec: parallel nonzero extraction / dense reconstruction for
//      the compressed checkpoint formats (`storage.formats`), replacing
//      torch's `to_sparse()` (`unstructured_L1_baseline.py:412`).
//
// Build: make -C runtime   (g++ -O3 -shared -fPIC, pthreads only)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

// FLAC decoder C ABI, implemented in owc_flac.cpp (same shared library);
// used by owc_loader_submit_flac to decode inside the worker pool.
extern "C" {
void* owc_flac_open(const uint8_t* buf, int64_t n);
int owc_flac_info(void* h, int32_t* sr, int32_t* ch, int32_t* bits);
int64_t owc_flac_samples(void* h);
const int32_t* owc_flac_data(void* h);
void owc_flac_close(void* h);
}

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false), pending_(0) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
          if (--pending_ == 0) {
            std::lock_guard<std::mutex> lk(mu_);
            done_cv_.notify_all();
          }
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> job) {
    ++pending_;
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

  void wait() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_.load() == 0; });
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  std::atomic<long> pending_;
};

void resample_linear(const float* in, int64_t n_in, int sr_in, int sr_out,
                     float* out, int64_t n_out) {
  if (sr_in == sr_out) {
    int64_t n = std::min(n_in, n_out);
    std::memcpy(out, in, n * sizeof(float));
    std::fill(out + n, out + n_out, 0.0f);
    return;
  }
  const double ratio = static_cast<double>(sr_in) / sr_out;
  for (int64_t i = 0; i < n_out; ++i) {
    const double src = i * ratio;
    const int64_t i0 = static_cast<int64_t>(src);
    if (i0 + 1 >= n_in) {
      out[i] = (i0 < n_in) ? in[i0] : 0.0f;
      continue;
    }
    const double frac = src - i0;
    out[i] = static_cast<float>(in[i0] * (1.0 - frac) + in[i0 + 1] * frac);
  }
}

struct BatchLoader {
  int batch;
  int64_t n_samples;
  ThreadPool pool;
  std::vector<float> front, back;  // double buffer: (batch, n_samples) each
  // Per-slot decode-failure flags: each worker job writes only its own
  // slot's element (distinct memory locations — race-free), read/reset
  // after pool.wait() via owc_loader_error_slots / take_errors.
  std::vector<uint8_t> slot_errors;

  BatchLoader(int b, int64_t ns, int threads)
      : batch(b), n_samples(ns), pool(threads),
        front(static_cast<size_t>(b) * ns, 0.0f),
        back(static_cast<size_t>(b) * ns, 0.0f),
        slot_errors(static_cast<size_t>(b), 0) {}
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// BatchLoader C ABI
// ---------------------------------------------------------------------------

void* owc_loader_create(int batch, int64_t n_samples, int n_threads) {
  return new BatchLoader(batch, n_samples,
                         n_threads > 0 ? n_threads : 4);
}

void owc_loader_destroy(void* h) { delete static_cast<BatchLoader*>(h); }

// Submit one utterance into `slot` of the BACK buffer (async: resample to
// 16 kHz if needed, pad/trim to n_samples). The caller keeps `wav` alive
// until owc_loader_wait returns.
void owc_loader_submit(void* h, int slot, const float* wav, int64_t n,
                       int sample_rate) {
  auto* L = static_cast<BatchLoader*>(h);
  L->slot_errors[slot] = 0;
  float* dst = L->back.data() + static_cast<size_t>(slot) * L->n_samples;
  const int64_t n_samples = L->n_samples;
  L->pool.submit([=] {
    const int64_t out_n =
        (sample_rate == 16000)
            ? std::min(n, n_samples)
            : std::min(static_cast<int64_t>(
                           static_cast<double>(n) * 16000.0 / sample_rate),
                       n_samples);
    resample_linear(wav, n, sample_rate, 16000, dst, out_n);
    std::fill(dst + out_n, dst + n_samples, 0.0f);
  });
}

// Submit one FLAC-encoded utterance into `slot` of the BACK buffer: decode,
// downmix to mono, normalize to [-1, 1] and resample to 16 kHz — all inside
// the worker pool, so a batch of FLAC files decodes in parallel. On decode
// failure the slot is zeroed and its per-slot error flag set (readable via
// owc_loader_error_slots / owc_loader_take_errors) — one corrupt stream
// must fail only its own request, never the co-riding batch. The caller
// keeps `data` alive until owc_loader_flush returns.
void owc_loader_submit_flac(void* h, int slot, const uint8_t* data,
                            int64_t n) {
  auto* L = static_cast<BatchLoader*>(h);
  L->slot_errors[slot] = 0;
  float* dst = L->back.data() + static_cast<size_t>(slot) * L->n_samples;
  const int64_t n_samples = L->n_samples;
  L->pool.submit([=] {
    void* fh = owc_flac_open(data, n);
    if (fh == nullptr) {
      std::fill(dst, dst + n_samples, 0.0f);
      L->slot_errors[slot] = 1;
      return;
    }
    int32_t sr = 0, ch = 0, bits = 0;
    owc_flac_info(fh, &sr, &ch, &bits);
    const int64_t ns = owc_flac_samples(fh);
    const int32_t* s = owc_flac_data(fh);
    std::vector<float> mono(ns);
    const float scale = 1.0f / static_cast<float>(1u << (bits - 1));
    if (ch == 1) {
      for (int64_t i = 0; i < ns; ++i) mono[i] = s[i] * scale;
    } else {
      const float inv = scale / ch;
      for (int64_t i = 0; i < ns; ++i) {
        int64_t acc = 0;
        for (int c = 0; c < ch; ++c) acc += s[i * ch + c];
        mono[i] = acc * inv;
      }
    }
    owc_flac_close(fh);
    const int64_t out_n =
        (sr == 16000)
            ? std::min(ns, n_samples)
            : std::min(static_cast<int64_t>(
                           static_cast<double>(ns) * 16000.0 / sr),
                       n_samples);
    resample_linear(mono.data(), ns, sr, 16000, dst, out_n);
    std::fill(dst + out_n, dst + n_samples, 0.0f);
  });
}

// Fetch-and-reset the count of failed FLAC decodes since the last call.
// Call only after owc_loader_flush (workers quiesced).
int owc_loader_take_errors(void* h) {
  auto* L = static_cast<BatchLoader*>(h);
  int n = 0;
  for (auto& e : L->slot_errors) { n += e; e = 0; }
  return n;
}

// Fetch-and-reset per-slot decode-failure flags: writes `batch` int32 flags
// into `out` (caller-allocated), returns the failure count. Call only after
// owc_loader_flush (workers quiesced).
int owc_loader_error_slots(void* h, int32_t* out) {
  auto* L = static_cast<BatchLoader*>(h);
  int n = 0;
  for (int i = 0; i < L->batch; ++i) {
    out[i] = L->slot_errors[i];
    n += L->slot_errors[i];
    L->slot_errors[i] = 0;
  }
  return n;
}

// Zero a back-buffer slot (for padding batches short of utterances).
void owc_loader_clear(void* h, int slot) {
  auto* L = static_cast<BatchLoader*>(h);
  L->slot_errors[slot] = 0;
  float* dst = L->back.data() + static_cast<size_t>(slot) * L->n_samples;
  std::fill(dst, dst + L->n_samples, 0.0f);
}

// Wait for all submitted jobs, then swap back->front. Returns the FRONT
// buffer pointer: stable until the next swap.
const float* owc_loader_flush(void* h) {
  auto* L = static_cast<BatchLoader*>(h);
  L->pool.wait();
  std::swap(L->front, L->back);
  return L->front.data();
}

// ---------------------------------------------------------------------------
// Sparse codec C ABI
// ---------------------------------------------------------------------------

int64_t owc_nnz(const float* data, int64_t n, int n_threads) {
  const int T = n_threads > 0 ? n_threads : 4;
  std::vector<int64_t> counts(T, 0);
  std::vector<std::thread> ts;
  const int64_t chunk = (n + T - 1) / T;
  for (int t = 0; t < T; ++t) {
    ts.emplace_back([&, t] {
      const int64_t lo = t * chunk, hi = std::min(n, (t + 1) * chunk);
      int64_t c = 0;
      for (int64_t i = lo; i < hi; ++i) c += (data[i] != 0.0f);
      counts[t] = c;
    });
  }
  for (auto& th : ts) th.join();
  int64_t total = 0;
  for (auto c : counts) total += c;
  return total;
}

// Two-pass parallel encode: per-thread counts -> exclusive offsets -> fill.
// idx_out/val_out must have room for the true nnz. Returns nnz written.
int64_t owc_sparse_encode(const float* data, int64_t n, int64_t* idx_out,
                          float* val_out, int n_threads) {
  const int T = n_threads > 0 ? n_threads : 4;
  const int64_t chunk = (n + T - 1) / T;
  std::vector<int64_t> counts(T, 0);
  std::vector<std::thread> ts;
  for (int t = 0; t < T; ++t) {
    ts.emplace_back([&, t] {
      const int64_t lo = t * chunk, hi = std::min(n, (t + 1) * chunk);
      int64_t c = 0;
      for (int64_t i = lo; i < hi; ++i) c += (data[i] != 0.0f);
      counts[t] = c;
    });
  }
  for (auto& th : ts) th.join();
  std::vector<int64_t> offs(T + 1, 0);
  for (int t = 0; t < T; ++t) offs[t + 1] = offs[t] + counts[t];
  ts.clear();
  for (int t = 0; t < T; ++t) {
    ts.emplace_back([&, t] {
      const int64_t lo = t * chunk, hi = std::min(n, (t + 1) * chunk);
      int64_t w = offs[t];
      for (int64_t i = lo; i < hi; ++i) {
        if (data[i] != 0.0f) {
          idx_out[w] = i;
          val_out[w] = data[i];
          ++w;
        }
      }
    });
  }
  for (auto& th : ts) th.join();
  return offs[T];
}

void owc_sparse_decode(const int64_t* idx, const float* val, int64_t nnz,
                       float* out, int64_t n, int n_threads) {
  std::fill(out, out + n, 0.0f);
  const int T = n_threads > 0 ? n_threads : 4;
  const int64_t chunk = (nnz + T - 1) / T;
  std::vector<std::thread> ts;
  for (int t = 0; t < T; ++t) {
    ts.emplace_back([&, t] {
      const int64_t lo = t * chunk, hi = std::min(nnz, (t + 1) * chunk);
      for (int64_t i = lo; i < hi; ++i) out[idx[i]] = val[i];
    });
  }
  for (auto& th : ts) th.join();
}

// Simple self-test hook.
int owc_runtime_version() { return 1; }

}  // extern "C"
