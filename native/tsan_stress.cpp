// Concurrency stress harness for the native runtime, built with
// -fsanitize=thread in CI (SURVEY.md §5 "Race detection": TSAN job for host
// C++). Exercises the pool/queue/mailbox/stats C ABI from producer, consumer,
// control, and GUI-poll threads concurrently, including the teardown ordering
// (stop-unblocks-before-join) and policy flips the Python engine performs.
//
// Exits 0 when every thread joins and invariants hold; TSAN reports make the
// CI job fail via its default exit code.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

struct FrameMeta {
  int64_t seq;
  int64_t pts_us;
  double capture_ts;
  int32_t width, height, channels;
  int32_t buffer_index;
};

extern "C" {
void* lvmt_pool_create(int capacity, long long buf_bytes);
void lvmt_pool_destroy(void* pool);
int lvmt_pool_acquire(void* pool);
void lvmt_pool_release(void* pool, int idx);
uint8_t* lvmt_pool_buffer(void* pool, int idx);
void lvmt_pool_stop(void* pool);
void lvmt_pool_reset(void* pool);
void* lvmt_queue_create(int capacity, int drop_policy, void* pool);
void lvmt_queue_destroy(void* queue);
void lvmt_queue_set_policy(void* queue, int drop_policy);
int lvmt_queue_push(void* queue, const FrameMeta* meta);
int lvmt_queue_pop(void* queue, FrameMeta* out, double timeout_ms);
void lvmt_queue_stop(void* queue);
void lvmt_queue_reset(void* queue);
long long lvmt_queue_drops(void* queue);
int lvmt_queue_depth(void* queue);
void* lvmt_mailbox_create();
void lvmt_mailbox_destroy(void* mb);
void lvmt_mailbox_publish(void* mb, const FrameMeta* meta);
int lvmt_mailbox_latest(void* mb, FrameMeta* out);
void lvmt_mailbox_clear(void* mb);
void* lvmt_stats_create();
void lvmt_stats_destroy(void* s);
void lvmt_stats_bump(void* s, int which);
void lvmt_stats_latency(void* s, double seconds);
void lvmt_stats_read(void* s, long long* counts, double* out);
}

int main() {
  constexpr int kRounds = 20;
  constexpr int kFramesPerProducer = 400;
  for (int round = 0; round < kRounds; ++round) {
    void* pool = lvmt_pool_create(8, 64);
    void* queue = lvmt_queue_create(3, round % 2, pool);  // alternate policies
    void* mailbox = lvmt_mailbox_create();
    void* stats = lvmt_stats_create();
    std::atomic<long long> consumed{0};

    auto producer = [&](int pid) {
      for (int i = 0; i < kFramesPerProducer; ++i) {
        int idx = lvmt_pool_acquire(pool);
        if (idx < 0) return;  // stopped
        uint8_t* buf = lvmt_pool_buffer(pool, idx);
        std::memset(buf, static_cast<int>(i & 0xff), 64);
        FrameMeta m{};
        m.seq = pid * 1000000LL + i;
        m.buffer_index = idx;
        m.width = 8;
        m.height = 8;
        m.channels = 1;
        lvmt_stats_bump(stats, 0);
        if (!lvmt_queue_push(queue, &m)) {
          lvmt_pool_release(pool, idx);
          return;
        }
      }
    };
    auto consumer = [&] {
      FrameMeta m{};
      while (lvmt_queue_pop(queue, &m, -1.0)) {
        volatile uint8_t v = lvmt_pool_buffer(pool, m.buffer_index)[0];
        (void)v;
        lvmt_mailbox_publish(mailbox, &m);
        lvmt_stats_bump(stats, 1);
        lvmt_stats_latency(stats, 0.004);
        lvmt_pool_release(pool, m.buffer_index);
        consumed.fetch_add(1);
      }
    };
    auto control = [&] {  // GUI thread: policy flips + stat/mailbox polls
      FrameMeta m{};
      long long counts[6];
      double lat[2];
      for (int i = 0; i < 200; ++i) {
        lvmt_queue_set_policy(queue, i % 2);
        lvmt_mailbox_latest(mailbox, &m);
        lvmt_stats_read(stats, counts, lat);
        (void)lvmt_queue_depth(queue);
        (void)lvmt_queue_drops(queue);
        std::this_thread::yield();
      }
    };

    std::vector<std::thread> threads;
    threads.emplace_back(consumer);
    threads.emplace_back(consumer);
    threads.emplace_back(producer, 1);
    threads.emplace_back(producer, 2);
    threads.emplace_back(control);
    // teardown ordering: unblock BEFORE join (PlaybackController semantics)
    std::this_thread::sleep_for(std::chrono::milliseconds(20));
    lvmt_queue_stop(queue);
    lvmt_pool_stop(pool);
    for (auto& t : threads) t.join();
    lvmt_queue_reset(queue);
    lvmt_pool_reset(pool);
    lvmt_mailbox_clear(mailbox);

    lvmt_stats_destroy(stats);
    lvmt_mailbox_destroy(mailbox);
    lvmt_queue_destroy(queue);
    lvmt_pool_destroy(pool);
  }
  std::printf("tsan stress: OK\n");
  return 0;
}
