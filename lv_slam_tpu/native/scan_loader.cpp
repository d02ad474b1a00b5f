// Native scan IO + asynchronous prefetching loader.
//
// The reference's runtime IO is C++ (rosbag playback + PCL readers feeding
// the nodelet pipeline). Here the equivalent role — keeping the device fed
// with scans without Python file-IO stalls — is a small C++ library exposed
// over the C ABI (loaded with ctypes; no pybind11 dependency):
//
//   - mmap-based KITTI .bin reader (zero-copy into the caller's buffer)
//   - binary PCD reader (x y z [intensity] float32 payloads)
//   - a background prefetcher: N reader threads fill a bounded ring of
//     fixed-capacity scan buffers ahead of consumption (the bounded-queue
//     pub/sub role of the reference's nodelet topics)
//
// Build: python -m lv_slam_tpu.native.build

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// One-shot readers
// ---------------------------------------------------------------------------

// Read a KITTI velodyne .bin (N x 4 float32). Returns the number of points
// copied (clipped to max_points), or -1 on error.
long lv_load_bin(const char* path, float* out, long max_points) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  long n = static_cast<long>(st.st_size / (4 * sizeof(float)));
  if (n > max_points) n = max_points;
  void* mapped = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (mapped == MAP_FAILED) return -1;
  std::memcpy(out, mapped, n * 4 * sizeof(float));
  munmap(mapped, st.st_size);
  return n;
}

// Read a binary PCD with float32 fields; returns points copied or -1.
// Fields per point are detected from the header (3 or 4 supported).
long lv_load_pcd(const char* path, float* out, long max_points, int* out_fields) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  void* mapped = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (mapped == MAP_FAILED) return -1;
  const char* data = static_cast<const char*>(mapped);
  std::string header(data, std::min<long>(st.st_size, 4096));
  long points = -1; int fields = 0; bool binary = false;
  size_t pos = 0, body = 0;
  while (pos < header.size()) {
    size_t eol = header.find('\n', pos);
    if (eol == std::string::npos) break;
    std::string line = header.substr(pos, eol - pos);
    if (line.rfind("FIELDS", 0) == 0) {
      fields = 0;
      for (size_t i = 6; i < line.size(); ++i)
        if (line[i] == ' ' && i + 1 < line.size() && line[i + 1] != ' ') fields++;
    } else if (line.rfind("POINTS", 0) == 0) {
      points = std::stol(line.substr(7));
    } else if (line.rfind("DATA", 0) == 0) {
      binary = line.find("binary") != std::string::npos;
      body = eol + 1;
      break;
    }
    pos = eol + 1;
  }
  if (points < 0 || fields < 3 || fields > 4 || !binary || body == 0) {
    munmap(mapped, st.st_size); return -1;
  }
  long n = std::min<long>(points, max_points);
  std::memcpy(out, data + body, n * fields * sizeof(float));
  *out_fields = fields;
  munmap(mapped, st.st_size);
  return n;
}

// ---------------------------------------------------------------------------
// Prefetching loader
// ---------------------------------------------------------------------------

struct Slot {
  std::vector<float> data;
  long n_points = 0;
  long index = -1;
};

struct Prefetcher {
  std::vector<std::string> paths;
  long cap;                       // max points per scan
  std::deque<Slot> ready;        // filled slots in order
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<long> next_to_read{0};
  long next_to_emit = 0;
  size_t max_queue;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::deque<Slot> out_of_order;  // slots finished ahead of order

  void worker() {
    for (;;) {
      long idx = next_to_read.fetch_add(1);
      if (stop.load() || idx >= static_cast<long>(paths.size())) return;
      Slot slot;
      slot.data.resize(cap * 4);
      slot.index = idx;
      slot.n_points = lv_load_bin(paths[idx].c_str(), slot.data.data(), cap);
      std::unique_lock<std::mutex> lock(mu);
      // Admission by sequence window, NOT queue occupancy: occupancy-based
      // waiting deadlocks when out-of-order completions fill the queue while
      // the next-in-order slot's thread is the one blocked.
      cv_space.wait(lock, [&] {
        return stop.load() || (idx - next_to_emit) < static_cast<long>(max_queue);
      });
      if (stop.load()) return;
      out_of_order.push_back(std::move(slot));
      // drain in-order completions into the ready queue
      bool moved = true;
      while (moved) {
        moved = false;
        for (auto it = out_of_order.begin(); it != out_of_order.end(); ++it) {
          if (it->index == next_to_emit + static_cast<long>(ready.size())) {
            ready.push_back(std::move(*it));
            out_of_order.erase(it);
            moved = true;
            break;
          }
        }
      }
      cv_ready.notify_all();
    }
  }
};

void* lv_prefetch_open(const char** paths, long n_paths, long cap,
                       int n_threads, int queue_depth) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n_paths);
  p->cap = cap;
  p->max_queue = queue_depth > 0 ? queue_depth : 4;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i) p->workers.emplace_back(&Prefetcher::worker, p);
  return p;
}

// Copy the next scan (in order) into out; returns n_points or -1 when done.
long lv_prefetch_next(void* handle, float* out) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::unique_lock<std::mutex> lock(p->mu);
  if (p->next_to_emit >= static_cast<long>(p->paths.size())) return -1;
  p->cv_ready.wait(lock, [&] { return !p->ready.empty(); });
  Slot slot = std::move(p->ready.front());
  p->ready.pop_front();
  p->next_to_emit++;
  p->cv_space.notify_all();
  lock.unlock();
  std::memcpy(out, slot.data.data(), slot.n_points * 4 * sizeof(float));
  return slot.n_points;
}

void lv_prefetch_close(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop.store(true);
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
