// Native batch loader: mmap'd uint8 record files -> shuffled float32 batches.
//
// TPU-native counterpart of the reference's data substrate
// (deps/score_sde_pytorch/datasets.py builds TFDS input pipelines; the two
// CUDA extensions are its only other native code).  Here the host-side hot
// path — record gather, dequantize, augment — is C++ so the Python layer
// only hands buffers to jax.device_put.
//
// Record format: CIFAR-10 binary version (data_batch_*.bin): one byte label
// + 3072 bytes CHW uint8 pixels per record.  The loader is generic over
// (label_bytes, c, h, w).
//
// Exposed C ABI (ctypes):
//   bl_open(paths, n_paths, label_bytes, c, h, w) -> handle
//   bl_num_records(handle)
//   bl_fill_batch(handle, indices, n, out_images, out_labels, hflip_mask)
//       gathers records, converts CHW uint8 -> HWC float32 in [0,1],
//       applies per-sample horizontal flip where hflip_mask[i] != 0
//   bl_fill_batch_mt(..., n_threads)  same, record range split over threads
//   bl_submit(handle, indices, n, out_images, out_labels, hflip_mask,
//             n_threads)
//       asynchronous bl_fill_batch_mt on the loader's worker thread
//       (indices/mask are copied; the OUTPUT buffers must stay alive and
//       untouched until bl_wait) -> 1 on accept, 0 if a job is in flight
//   bl_wait(handle)   block until the in-flight job (if any) completes
//   bl_close(handle)
//
// The submit/wait pair is the double-buffer prefetch hook: Python keeps two
// output buffer sets and overlaps the next batch's gather/dequantize with
// the device step on the current one (see native_loader.prefetch_batches).

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Mapping {
  const uint8_t* data = nullptr;
  size_t size = 0;
  int fd = -1;
};

struct Job {
  std::vector<long> indices;
  std::vector<uint8_t> hflip;
  bool has_flip = false;
  float* out_images = nullptr;
  int32_t* out_labels = nullptr;
  int n_threads = 1;
};

struct Loader {
  std::vector<Mapping> maps;
  std::vector<size_t> cum_records;  // cumulative record counts per file
  int label_bytes = 1;
  int c = 3, h = 32, w = 32;
  size_t record_bytes() const {
    return static_cast<size_t>(label_bytes) +
           static_cast<size_t>(c) * h * w;
  }

  // single-worker async state (double-buffer prefetch)
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  Job job;
  bool job_pending = false;   // submitted, not yet picked up / running
  bool shutting_down = false;
};

void fill_range(const Loader* L, const long* indices, int lo, int hi,
                float* out_images, int32_t* out_labels,
                const uint8_t* hflip_mask) {
  const size_t rec = L->record_bytes();
  const int c = L->c, h = L->h, w = L->w;
  const float inv = 1.0f / 255.0f;

  for (int i = lo; i < hi; ++i) {
    size_t idx = static_cast<size_t>(indices[i]);
    size_t fi = 0;
    while (idx >= L->cum_records[fi]) ++fi;
    size_t base = fi == 0 ? 0 : L->cum_records[fi - 1];
    const uint8_t* r = L->maps[fi].data + (idx - base) * rec;

    // last label byte = fine label (CIFAR-100 stores [coarse, fine]);
    // matches the numpy fallback path in native_loader.py
    out_labels[i] = r[L->label_bytes - 1];

    const uint8_t* px = r + L->label_bytes;
    float* out = out_images + static_cast<size_t>(i) * h * w * c;
    const bool flip = hflip_mask && hflip_mask[i];
    // CHW uint8 -> HWC float32 (+ optional horizontal flip)
    for (int ch = 0; ch < c; ++ch) {
      const uint8_t* plane = px + static_cast<size_t>(ch) * h * w;
      for (int y = 0; y < h; ++y) {
        const uint8_t* row = plane + static_cast<size_t>(y) * w;
        float* orow = out + (static_cast<size_t>(y) * w) * c + ch;
        if (flip) {
          for (int x = 0; x < w; ++x)
            orow[(w - 1 - x) * (size_t)c] = row[x] * inv;
        } else {
          for (int x = 0; x < w; ++x) orow[x * (size_t)c] = row[x] * inv;
        }
      }
    }
  }
}

void fill_mt(const Loader* L, const long* indices, int n, float* out_images,
             int32_t* out_labels, const uint8_t* hflip_mask, int n_threads) {
  if (n_threads <= 1 || n < 2 * n_threads) {
    fill_range(L, indices, 0, n, out_images, out_labels, hflip_mask);
    return;
  }
  std::vector<std::thread> ts;
  const int per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int lo = t * per;
    const int hi = lo + per < n ? lo + per : n;
    if (lo >= hi) break;
    ts.emplace_back(fill_range, L, indices, lo, hi, out_images, out_labels,
                    hflip_mask);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

void* bl_open(const char** paths, int n_paths, int label_bytes, int c, int h,
              int w) {
  Loader* L = new Loader();
  L->label_bytes = label_bytes;
  L->c = c;
  L->h = h;
  L->w = w;
  size_t total = 0;
  for (int i = 0; i < n_paths; ++i) {
    int fd = open(paths[i], O_RDONLY);
    if (fd < 0) {
      delete L;
      return nullptr;
    }
    struct stat st;
    fstat(fd, &st);
    void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
      close(fd);
      delete L;
      return nullptr;
    }
    madvise(p, st.st_size, MADV_WILLNEED);
    Mapping m;
    m.data = static_cast<const uint8_t*>(p);
    m.size = static_cast<size_t>(st.st_size);
    m.fd = fd;
    L->maps.push_back(m);
    total += m.size / L->record_bytes();
    L->cum_records.push_back(total);
  }
  return L;
}

long bl_num_records(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  return L->cum_records.empty() ? 0 : (long)L->cum_records.back();
}

// out_images: [n, h, w, c] float32; out_labels: [n] int32
void bl_fill_batch(void* handle, const long* indices, int n,
                   float* out_images, int32_t* out_labels,
                   const uint8_t* hflip_mask) {
  fill_range(static_cast<Loader*>(handle), indices, 0, n, out_images,
             out_labels, hflip_mask);
}

void bl_fill_batch_mt(void* handle, const long* indices, int n,
                      float* out_images, int32_t* out_labels,
                      const uint8_t* hflip_mask, int n_threads) {
  fill_mt(static_cast<Loader*>(handle), indices, n, out_images, out_labels,
          hflip_mask, n_threads);
}

int bl_submit(void* handle, const long* indices, int n, float* out_images,
              int32_t* out_labels, const uint8_t* hflip_mask,
              int n_threads) {
  Loader* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->job_pending) return 0;  // one job in flight at a time
  L->job.indices.assign(indices, indices + n);
  L->job.has_flip = hflip_mask != nullptr;
  if (L->job.has_flip) L->job.hflip.assign(hflip_mask, hflip_mask + n);
  L->job.out_images = out_images;
  L->job.out_labels = out_labels;
  L->job.n_threads = n_threads;
  L->job_pending = true;
  if (!L->worker.joinable()) {
    L->worker = std::thread([L] {
      std::unique_lock<std::mutex> wlk(L->mu);
      for (;;) {
        L->cv.wait(wlk, [L] { return L->job_pending || L->shutting_down; });
        if (L->shutting_down) return;
        // job fields are stable while job_pending: bl_submit refuses new
        // work until bl_wait observes the flag cleared below
        Job* j = &L->job;
        wlk.unlock();
        fill_mt(L, j->indices.data(), static_cast<int>(j->indices.size()),
                j->out_images, j->out_labels,
                j->has_flip ? j->hflip.data() : nullptr, j->n_threads);
        wlk.lock();
        L->job_pending = false;
        L->cv.notify_all();
      }
    });
  }
  L->cv.notify_all();
  return 1;
}

void bl_wait(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv.wait(lk, [L] { return !L->job_pending; });
}

void bl_close(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv.wait(lk, [L] { return !L->job_pending; });
    L->shutting_down = true;
    L->cv.notify_all();
  }
  if (L->worker.joinable()) L->worker.join();
  for (auto& m : L->maps) {
    munmap(const_cast<uint8_t*>(m.data), m.size);
    close(m.fd);
  }
  delete L;
}

}  // extern "C"
