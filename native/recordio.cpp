// hand3d_tpu native record streamer.
//
// TPU-native replacement for the native half of the reference's input
// pipeline: TF's FixedLengthRecordReader C++ kernel + queue-runner threads
// (data/BinaryDbReader.py:128-129, 394-408). Python threads assembling
// batches hold the GIL while memcpy'ing ~13 MB/batch of records; this
// streamer does epoch shuffling, pread() and batch assembly on C++ threads
// into a bounded ring of reusable batch buffers, so the host-side input
// path runs concurrently with jax dispatch.
//
// C ABI (consumed via ctypes from hand3d_tpu/data/native.py):
//   rr_open(path, record_bytes, batch_size, shuffle, seed, drop_remainder,
//           num_threads, queue_capacity) -> handle (NULL on error)
//   rr_num_records(handle) -> int64
//   rr_next(handle, out_buf, out_indices) -> n_records in the batch
//       (0 on end of epoch stream; call rr_reset to start a new pass)
//   rr_reset(handle, epochs) -> void   (re-arms the producer for N epochs;
//       epochs < 0 means stream forever)
//   rr_close(handle) -> void
//
// Build: g++ -O3 -std=c++17 -shared -fPIC recordio.cpp -o librecordio.so -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Batch {
  std::vector<char> data;
  std::vector<int64_t> indices;
  int64_t count = 0;
  int64_t serial = 0;  // claim order; delivery happens in serial order
};

struct Reader {
  int fd = -1;
  int64_t record_bytes = 0;
  int64_t num_records = 0;
  int64_t batch_size = 0;
  bool shuffle = false;
  bool drop_remainder = true;
  uint64_t seed = 0;
  int num_threads = 2;
  size_t capacity = 4;

  // producer state
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_produce, cv_consume;
  std::deque<Batch*> ready;
  std::vector<Batch*> free_list;
  std::vector<Batch*> all_batches;
  std::atomic<bool> stopping{false};
  bool done = true;  // no epochs armed
  int active_workers = 0;

  // work queue of batches-of-indices for the current pass
  std::vector<std::vector<int64_t>> pending;
  size_t next_pending = 0;
  int64_t epochs_left = 0;
  int64_t epoch = 0;
  // in-order delivery: batches are claimed with increasing serials and
  // rr_next hands them out strictly in serial order, so a fixed seed
  // yields one reproducible stream regardless of worker-thread scheduling
  int64_t next_claim = 0;
  int64_t next_deliver = 0;
  bool io_error = false;  // a short pread: surfaced as rr_next() == -1

  ~Reader() {
    shutdown();
    if (fd >= 0) close(fd);
    for (Batch* b : all_batches) delete b;
  }

  void shutdown() {
    {
      std::lock_guard<std::mutex> lock(mu);
      stopping.store(true);
    }
    cv_produce.notify_all();
    cv_consume.notify_all();
    for (auto& t : workers) {
      if (t.joinable()) t.join();
    }
    workers.clear();
  }

  void build_pending_locked() {
    pending.clear();
    next_pending = 0;
    std::vector<int64_t> idx(num_records);
    for (int64_t i = 0; i < num_records; ++i) idx[i] = i;
    if (shuffle) {
      std::mt19937_64 rng(seed + static_cast<uint64_t>(epoch));
      for (int64_t i = num_records - 1; i > 0; --i) {
        std::uniform_int_distribution<int64_t> dist(0, i);
        std::swap(idx[i], idx[dist(rng)]);
      }
    }
    int64_t full = drop_remainder ? (num_records / batch_size) * batch_size
                                  : num_records;
    for (int64_t start = 0; start < full; start += batch_size) {
      int64_t end = std::min(start + batch_size, full);
      pending.emplace_back(idx.begin() + start, idx.begin() + end);
    }
    ++epoch;
  }

  bool claim_work(std::vector<int64_t>* out, int64_t* serial) {
    std::unique_lock<std::mutex> lock(mu);
    for (;;) {
      if (stopping.load()) return false;
      if (next_pending < pending.size()) {
        *out = pending[next_pending++];
        *serial = next_claim++;
        return true;
      }
      if (epochs_left != 0) {
        if (epochs_left > 0) --epochs_left;
        build_pending_locked();
        continue;
      }
      return false;  // drained; worker exits (rr_reset restarts workers)
    }
  }

  Batch* claim_buffer() {
    std::unique_lock<std::mutex> lock(mu);
    cv_produce.wait(lock, [&] { return stopping.load() || !free_list.empty(); });
    if (stopping.load()) return nullptr;
    Batch* b = free_list.back();
    free_list.pop_back();
    return b;
  }

  void worker_main() {
    // claim the buffer BEFORE the serial: a worker that holds a serial but
    // no buffer could deadlock ordered delivery (the consumer waits for
    // that serial while every buffer sits in `ready` holding later ones)
    std::vector<int64_t> work;
    for (;;) {
      Batch* b = claim_buffer();
      if (b == nullptr) break;  // stopping
      int64_t serial = 0;
      if (!claim_work(&work, &serial)) {
        std::lock_guard<std::mutex> lock(mu);
        free_list.push_back(b);
        break;
      }
      b->serial = serial;
      b->count = static_cast<int64_t>(work.size());
      b->indices.assign(work.begin(), work.end());
      char* dst = b->data.data();
      bool ok = true;
      for (size_t i = 0; i < work.size(); ++i) {
        ssize_t got = pread(fd, dst + i * record_bytes, record_bytes,
                            work[i] * record_bytes);
        if (got != static_cast<ssize_t>(record_bytes)) {
          ok = false;
          break;
        }
      }
      {
        std::lock_guard<std::mutex> lock(mu);
        if (ok) {
          ready.push_back(b);
        } else {
          // a lost serial would wedge in-order delivery; flag the stream
          // broken instead of silently dropping the batch
          io_error = true;
          free_list.push_back(b);
        }
      }
      cv_consume.notify_one();
      if (!ok) break;
    }
    // this worker is done; the stream is done once every worker has
    // finished (a peer may still be copying its final claimed batch)
    {
      std::lock_guard<std::mutex> lock(mu);
      if (--active_workers == 0) done = true;
    }
    cv_consume.notify_all();
    cv_produce.notify_all();  // peers waiting for buffers must re-check
  }

  void start_workers(int64_t epochs) {
    shutdown();
    {
      std::lock_guard<std::mutex> lock(mu);
      stopping.store(false);
      done = false;
      active_workers = num_threads;
      epochs_left = epochs < 0 ? -1 : epochs;
      // note: epochs_left semantics — -1 streams forever; N arms N passes
      if (epochs_left > 0) --epochs_left;
      next_claim = 0;
      next_deliver = 0;
      io_error = false;
      build_pending_locked();
      ready.clear();
      free_list.assign(all_batches.begin(), all_batches.end());
    }
    workers.reserve(num_threads);
    for (int i = 0; i < num_threads; ++i) {
      workers.emplace_back([this] { worker_main(); });
    }
  }
};

}  // namespace

extern "C" {

void* rr_open(const char* path, int64_t record_bytes, int64_t batch_size,
              int shuffle, uint64_t seed, int drop_remainder, int num_threads,
              int queue_capacity) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size % record_bytes != 0) {
    close(fd);
    return nullptr;
  }
  Reader* r = new Reader();
  r->fd = fd;
  r->record_bytes = record_bytes;
  r->num_records = st.st_size / record_bytes;
  r->batch_size = batch_size;
  r->shuffle = shuffle != 0;
  r->seed = seed;
  r->drop_remainder = drop_remainder != 0;
  r->num_threads = std::max(1, num_threads);
  r->capacity = std::max(2, queue_capacity);
  for (size_t i = 0; i < r->capacity; ++i) {
    Batch* b = new Batch();
    b->data.resize(static_cast<size_t>(batch_size) * record_bytes);
    b->indices.resize(batch_size);
    r->all_batches.push_back(b);
  }
  return r;
}

int64_t rr_num_records(void* handle) {
  return static_cast<Reader*>(handle)->num_records;
}

void rr_reset(void* handle, int64_t epochs) {
  static_cast<Reader*>(handle)->start_workers(epochs);
}

int64_t rr_next(void* handle, char* out_buf, int64_t* out_indices) {
  Reader* r = static_cast<Reader*>(handle);
  Batch* b = nullptr;
  {
    std::unique_lock<std::mutex> lock(r->mu);
    auto has_next = [&] {
      for (Batch* x : r->ready) {
        if (x->serial == r->next_deliver) return true;
      }
      return false;
    };
    r->cv_consume.wait(lock, [&] {
      return r->stopping.load() || r->io_error || has_next() ||
             (r->done && r->ready.empty());
    });
    if (r->io_error) return -1;  // broken stream (short pread)
    if (r->stopping.load() || !has_next()) return 0;  // drained/stopping
    for (auto it = r->ready.begin(); it != r->ready.end(); ++it) {
      if ((*it)->serial == r->next_deliver) {
        b = *it;
        r->ready.erase(it);
        break;
      }
    }
    ++r->next_deliver;
  }
  int64_t n = b->count;
  std::memcpy(out_buf, b->data.data(),
              static_cast<size_t>(n) * r->record_bytes);
  std::memcpy(out_indices, b->indices.data(), n * sizeof(int64_t));
  {
    std::lock_guard<std::mutex> lock(r->mu);
    r->free_list.push_back(b);
  }
  r->cv_produce.notify_one();
  return n;
}

void rr_close(void* handle) { delete static_cast<Reader*>(handle); }

}  // extern "C"
