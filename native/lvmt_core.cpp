// lvmt_core — native host runtime for the TPU streaming engine.
//
// The reference app's core runtime (src/core/: FramePool, BoundedQueue,
// LatestFrameMailbox, Instrumentation) is C++; this is its TPU-framework
// counterpart: a C ABI over the same transport semantics, driven from Python
// via ctypes (calls release the GIL while blocking, so producer/consumer
// threads overlap with device work).
//
//   * frame pool: fixed arena of aligned u8 buffers, credit-based blocking
//     acquire (lossless backpressure; reference core/FramePool.hpp:17-48);
//   * bounded queue of frame slots with BLOCK/DROP overflow
//     (reference core/BoundedQueue.hpp:14-95);
//   * latest-wins mailbox slot (reference core/LatestFrameMailbox.hpp);
//   * cache-line-padded atomic counters + 64x5ms latency histogram
//     (reference core/Instrumentation.hpp:19-83).
//
// Build: make -C native   (g++ -O2 -shared -fPIC, no dependencies)

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <new>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

struct FrameMeta {
  int64_t seq;
  int64_t pts_us;
  double capture_ts;
  int32_t width;
  int32_t height;
  int32_t channels;
  int32_t buffer_index;  // index into the pool arena
};

// ---------------------------------------------------------------- frame pool

struct Pool {
  std::mutex m;
  std::condition_variable cv;
  std::vector<uint8_t*> buffers;
  std::vector<int32_t> free_list;
  size_t buf_bytes = 0;
  bool stopped = false;

  ~Pool() {
    for (auto* b : buffers) std::free(b);
  }
};

// ---------------------------------------------------------------- queue

struct Queue {
  std::mutex m;
  std::condition_variable not_empty, not_full;
  std::deque<FrameMeta> items;
  size_t capacity = 2;
  bool drop_policy = false;  // false = BLOCK, true = DROP
  bool stopped = false;
  uint64_t drops = 0;
  Pool* pool = nullptr;  // to recycle dropped frames
};

// ---------------------------------------------------------------- mailbox

struct Mailbox {
  std::mutex m;
  FrameMeta latest{};
  bool has = false;
};

// ---------------------------------------------------------------- stats

constexpr int kBuckets = 64;
constexpr double kBucketMs = 5.0;

struct alignas(64) PaddedCounter {
  std::atomic<uint64_t> v{0};
};

struct Stats {
  PaddedCounter captured, processed, displayed, display_skipped, read_errors,
      proc_errors;
  std::atomic<uint64_t> hist[kBuckets] = {};
  std::atomic<uint64_t> lat_count{0};
  std::atomic<uint64_t> lat_sum_us{0};
};

void pool_release_locked(Pool* p, int32_t idx) {
  p->free_list.push_back(idx);
  p->cv.notify_one();
}

}  // namespace

extern "C" {

// ----- pool -----

void* lvmt_pool_create(int capacity, long long buf_bytes) {
  auto* p = new Pool();
  p->buf_bytes = static_cast<size_t>(buf_bytes);
  p->buffers.resize(capacity);
  for (int i = 0; i < capacity; ++i) {
    p->buffers[i] =
        static_cast<uint8_t*>(std::aligned_alloc(64, (buf_bytes + 63) & ~63ull));
    p->free_list.push_back(i);
  }
  return p;
}

void lvmt_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Blocks while exhausted; returns buffer index or -1 when stopped.
int lvmt_pool_acquire(void* pool) {
  auto* p = static_cast<Pool*>(pool);
  std::unique_lock<std::mutex> lk(p->m);
  p->cv.wait(lk, [&] { return !p->free_list.empty() || p->stopped; });
  if (p->stopped) return -1;
  int idx = p->free_list.back();
  p->free_list.pop_back();
  return idx;
}

void lvmt_pool_release(void* pool, int idx) {
  auto* p = static_cast<Pool*>(pool);
  std::lock_guard<std::mutex> lk(p->m);
  pool_release_locked(p, idx);
}

uint8_t* lvmt_pool_buffer(void* pool, int idx) {
  auto* p = static_cast<Pool*>(pool);
  return p->buffers[static_cast<size_t>(idx)];
}

void lvmt_pool_stop(void* pool) {
  auto* p = static_cast<Pool*>(pool);
  std::lock_guard<std::mutex> lk(p->m);
  p->stopped = true;
  p->cv.notify_all();
}

void lvmt_pool_reset(void* pool) {
  auto* p = static_cast<Pool*>(pool);
  std::lock_guard<std::mutex> lk(p->m);
  p->stopped = false;
  p->free_list.clear();
  for (int i = 0; i < static_cast<int>(p->buffers.size()); ++i)
    p->free_list.push_back(i);
}

// ----- queue -----

void* lvmt_queue_create(int capacity, int drop_policy, void* pool) {
  auto* q = new Queue();
  q->capacity = static_cast<size_t>(capacity < 1 ? 1 : capacity);
  q->drop_policy = drop_policy != 0;
  q->pool = static_cast<Pool*>(pool);
  return q;
}

void lvmt_queue_destroy(void* queue) { delete static_cast<Queue*>(queue); }

void lvmt_queue_set_policy(void* queue, int drop_policy) {
  auto* q = static_cast<Queue*>(queue);
  std::lock_guard<std::mutex> lk(q->m);
  q->drop_policy = drop_policy != 0;
}

// Returns 1 on success, 0 when stopped.
int lvmt_queue_push(void* queue, const FrameMeta* meta) {
  auto* q = static_cast<Queue*>(queue);
  std::unique_lock<std::mutex> lk(q->m);
  if (!q->drop_policy) {
    q->not_full.wait(lk, [&] { return q->items.size() < q->capacity || q->stopped; });
    if (q->stopped) return 0;
  } else {
    if (q->stopped) return 0;
    while (q->items.size() >= q->capacity) {
      FrameMeta old = q->items.front();
      q->items.pop_front();
      ++q->drops;
      if (q->pool) {
        std::lock_guard<std::mutex> plk(q->pool->m);
        pool_release_locked(q->pool, old.buffer_index);
      }
    }
  }
  q->items.push_back(*meta);
  q->not_empty.notify_one();
  return 1;
}

// Returns 1 on success, 0 when stopped/timeout. timeout_ms < 0 = infinite.
int lvmt_queue_pop(void* queue, FrameMeta* out, double timeout_ms) {
  auto* q = static_cast<Queue*>(queue);
  std::unique_lock<std::mutex> lk(q->m);
  auto ready = [&] { return !q->items.empty() || q->stopped; };
  if (timeout_ms < 0) {
    q->not_empty.wait(lk, ready);
  } else if (!q->not_empty.wait_for(
                 lk, std::chrono::duration<double, std::milli>(timeout_ms), ready)) {
    return 0;
  }
  if (q->items.empty()) return 0;
  *out = q->items.front();
  q->items.pop_front();
  q->not_full.notify_one();
  return 1;
}

void lvmt_queue_stop(void* queue) {
  auto* q = static_cast<Queue*>(queue);
  std::lock_guard<std::mutex> lk(q->m);
  q->stopped = true;
  q->not_empty.notify_all();
  q->not_full.notify_all();
}

void lvmt_queue_reset(void* queue) {
  auto* q = static_cast<Queue*>(queue);
  std::lock_guard<std::mutex> lk(q->m);
  for (const auto& it : q->items) {
    if (q->pool) {
      std::lock_guard<std::mutex> plk(q->pool->m);
      pool_release_locked(q->pool, it.buffer_index);
    }
  }
  q->items.clear();
  q->stopped = false;
  q->drops = 0;
}

long long lvmt_queue_drops(void* queue) {
  auto* q = static_cast<Queue*>(queue);
  std::lock_guard<std::mutex> lk(q->m);
  return static_cast<long long>(q->drops);
}

int lvmt_queue_depth(void* queue) {
  auto* q = static_cast<Queue*>(queue);
  std::lock_guard<std::mutex> lk(q->m);
  return static_cast<int>(q->items.size());
}

// ----- mailbox -----

void* lvmt_mailbox_create() { return new Mailbox(); }
void lvmt_mailbox_destroy(void* mb) { delete static_cast<Mailbox*>(mb); }

void lvmt_mailbox_publish(void* mb, const FrameMeta* meta) {
  auto* m = static_cast<Mailbox*>(mb);
  std::lock_guard<std::mutex> lk(m->m);
  m->latest = *meta;
  m->has = true;
}

int lvmt_mailbox_latest(void* mb, FrameMeta* out) {
  auto* m = static_cast<Mailbox*>(mb);
  std::lock_guard<std::mutex> lk(m->m);
  if (!m->has) return 0;
  *out = m->latest;
  return 1;
}

void lvmt_mailbox_clear(void* mb) {
  auto* m = static_cast<Mailbox*>(mb);
  std::lock_guard<std::mutex> lk(m->m);
  m->has = false;
}

// ----- stats -----

void* lvmt_stats_create() { return new Stats(); }
void lvmt_stats_destroy(void* s) { delete static_cast<Stats*>(s); }

void lvmt_stats_bump(void* s, int which) {
  auto* st = static_cast<Stats*>(s);
  switch (which) {
    case 0: st->captured.v.fetch_add(1, std::memory_order_relaxed); break;
    case 1: st->processed.v.fetch_add(1, std::memory_order_relaxed); break;
    case 2: st->displayed.v.fetch_add(1, std::memory_order_relaxed); break;
    case 3: st->display_skipped.v.fetch_add(1, std::memory_order_relaxed); break;
    case 4: st->read_errors.v.fetch_add(1, std::memory_order_relaxed); break;
    case 5: st->proc_errors.v.fetch_add(1, std::memory_order_relaxed); break;
  }
}

void lvmt_stats_latency(void* s, double seconds) {
  auto* st = static_cast<Stats*>(s);
  double ms = seconds * 1e3;
  int bucket = static_cast<int>(ms / kBucketMs);
  if (bucket < 0) bucket = 0;
  if (bucket >= kBuckets) bucket = kBuckets - 1;
  st->hist[bucket].fetch_add(1, std::memory_order_relaxed);
  st->lat_count.fetch_add(1, std::memory_order_relaxed);
  st->lat_sum_us.fetch_add(static_cast<uint64_t>(ms * 1e3),
                           std::memory_order_relaxed);
}

// counts[6], then mean_ms, p95_ms written to out[0..1]
void lvmt_stats_read(void* s, long long* counts, double* out) {
  auto* st = static_cast<Stats*>(s);
  counts[0] = static_cast<long long>(st->captured.v.load());
  counts[1] = static_cast<long long>(st->processed.v.load());
  counts[2] = static_cast<long long>(st->displayed.v.load());
  counts[3] = static_cast<long long>(st->display_skipped.v.load());
  counts[4] = static_cast<long long>(st->read_errors.v.load());
  counts[5] = static_cast<long long>(st->proc_errors.v.load());
  uint64_t n = st->lat_count.load();
  out[0] = n ? (st->lat_sum_us.load() / 1e3) / n : 0.0;
  out[1] = 0.0;
  if (n) {
    const double target = 0.95 * static_cast<double>(n);
    double run = 0;
    for (int i = 0; i < kBuckets; ++i) {
      run += st->hist[i].load();
      if (run >= target) {
        out[1] = (i + 1) * kBucketMs;
        break;
      }
    }
  }
}

}  // extern "C"
