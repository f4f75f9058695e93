// orbslam2_tpu native preprocessing runtime.
//
// The reference's runtime is C++ end to end; in the TPU-native design the
// device owns the compute path and the host-side preprocessing (stereo
// rectification remap, grayscale conversion, resize) remains a natural
// native component: it runs concurrently with PNG decode and device
// dispatch, off the Python GIL. Exposed as a C ABI for ctypes
// (pybind11 is not available in this environment).
//
// Mirrors the work of cv::remap/cvtColor in the reference driver
// (Examples/Stereo/stereo_euroc.cc:142-149) with a persistent worker pool
// and an async job queue so IO, rectification and TPU dispatch pipeline.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <set>
#include <thread>
#include <vector>

namespace {

struct Job {
  std::function<void()> fn;
  uint64_t id;
};

class Pool {
 public:
  explicit Pool(int n_threads) : stop_(false), next_id_(1), done_upto_(0) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { Run(); });
    }
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  uint64_t Submit(std::function<void()> fn) {
    std::lock_guard<std::mutex> lk(mu_);
    uint64_t id = next_id_++;
    jobs_.push({std::move(fn), id});
    cv_.notify_one();
    return id;
  }

  void Wait(uint64_t id) {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this, id] { return finished_.count(id) > 0; });
    finished_.erase(id);
  }

 private:
  void Run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = std::move(jobs_.front());
        jobs_.pop();
      }
      job.fn();
      {
        std::lock_guard<std::mutex> lk(mu_);
        finished_.insert(job.id);
      }
      done_cv_.notify_all();
    }
  }

  std::vector<std::thread> workers_;
  std::queue<Job> jobs_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  uint64_t next_id_;
  uint64_t done_upto_;
  std::set<uint64_t> finished_;
};

}  // namespace

static void remap_rows(const uint8_t* src, int sh, int sw, const float* mapx,
                       const float* mapy, float* dst, int dh, int dw, int r0,
                       int r1) {
  for (int r = r0; r < r1; ++r) {
    for (int c = 0; c < dw; ++c) {
      float fx = mapx[r * dw + c];
      float fy = mapy[r * dw + c];
      // cv::remap edge semantics (BORDER_CONSTANT 0): samples fully
      // outside are 0; samples on the last row/col (or at -eps from
      // rectify-map rounding noise) interpolate with CLAMPED neighbors.
      // The old `x0 >= sw-1` cut zeroed a 1-pixel border on identity
      // maps (caught by tests/test_euroc_e2e.py).
      if (fx <= -0.5f || fy <= -0.5f || fx >= sw - 0.5f || fy >= sh - 0.5f) {
        dst[r * dw + c] = 0.0f;
        continue;
      }
      if (fx < 0.0f) fx = 0.0f;
      if (fy < 0.0f) fy = 0.0f;
      int x0 = (int)fx;
      int y0 = (int)fy;
      if (x0 > sw - 1) x0 = sw - 1;
      if (y0 > sh - 1) y0 = sh - 1;
      int x1 = x0 + 1 > sw - 1 ? sw - 1 : x0 + 1;
      int y1 = y0 + 1 > sh - 1 ? sh - 1 : y0 + 1;
      float ax = fx - x0;
      float ay = fy - y0;
      const uint8_t* row0 = src + y0 * sw;
      const uint8_t* row1 = src + y1 * sw;
      float v00 = row0[x0], v01 = row0[x1];
      float v10 = row1[x0], v11 = row1[x1];
      dst[r * dw + c] = (1 - ay) * ((1 - ax) * v00 + ax * v01) +
                        ay * ((1 - ax) * v10 + ax * v11);
    }
  }
}

static Pool* g_pool = nullptr;

extern "C" {

void preprocess_init(int n_threads) {
  if (!g_pool) g_pool = new Pool(n_threads > 0 ? n_threads : 4);
}

// Synchronous multi-threaded bilinear remap: uint8 src -> float32 dst.
void remap_bilinear(const uint8_t* src, int sh, int sw, const float* mapx,
                    const float* mapy, float* dst, int dh, int dw) {
  int n = 4;
  std::vector<std::thread> ts;
  int rows = (dh + n - 1) / n;
  for (int i = 0; i < n; ++i) {
    int r0 = i * rows;
    int r1 = r0 + rows < dh ? r0 + rows : dh;
    if (r0 >= r1) break;
    ts.emplace_back(remap_rows, src, sh, sw, mapx, mapy, dst, dh, dw, r0, r1);
  }
  for (auto& t : ts) t.join();
}

// Async variant on the persistent pool: returns a job id to wait on.
uint64_t remap_bilinear_async(const uint8_t* src, int sh, int sw,
                              const float* mapx, const float* mapy, float* dst,
                              int dh, int dw) {
  preprocess_init(0);
  return g_pool->Submit([=] {
    remap_rows(src, sh, sw, mapx, mapy, dst, dh, dw, 0, dh);
  });
}

void preprocess_wait(uint64_t job) {
  if (g_pool) g_pool->Wait(job);
}

// RGB(A)/grayscale uint8 -> float32 grayscale (reference cvtColor analog,
// Tracking.cpp:176-201). channels: 1, 3 (RGB/BGR via bgr flag) or 4.
void to_grayscale(const uint8_t* src, int h, int w, int channels, int bgr,
                  float* dst) {
  const float wr = bgr ? 0.114f : 0.299f;
  const float wb = bgr ? 0.299f : 0.114f;
  for (int i = 0; i < h * w; ++i) {
    if (channels == 1) {
      dst[i] = (float)src[i];
    } else {
      const uint8_t* p = src + i * channels;
      dst[i] = wr * p[0] + 0.587f * p[1] + wb * p[2];
    }
  }
}

}  // extern "C"
