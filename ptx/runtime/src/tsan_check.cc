// ThreadSanitizer stress harness for the native runtime.
//
// The reference's concurrency layer carries a deliberate data race (the
// shared LCG, path-trace.h:56) and mutex-boxed pseudo-atomics; this
// harness asserts the replacement runtime is race-free: pool churn from
// many producers + concurrent render-farm round-trips on localhost.
// Run via `make tsan` (exits nonzero on any TSAN report).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include "pool.h"

extern "C" {
typedef int (*ptx_emit_fn)(void*, uint32_t, uint32_t, const float*);
typedef int (*ptx_render_cb)(uint32_t, uint32_t, uint32_t, uint32_t,
                             uint32_t, uint32_t, uint64_t, ptx_emit_fn,
                             void*, void*);
typedef void (*ptx_progress_fn)(void*, uint32_t, uint32_t);
struct ptx_server;
struct ptx_client;
ptx_server* ptx_server_start(const char*, int, ptx_render_cb, void*, int,
                             int);
int ptx_server_port(ptx_server*);
void ptx_server_stop(ptx_server*);
ptx_client* ptx_client_create(const char**, const int*, int, int, int, int);
int ptx_client_render_tile(ptx_client*, uint32_t, uint32_t, uint32_t,
                           uint32_t, uint32_t, uint32_t, uint64_t, float*,
                           ptx_progress_fn, void*);
void ptx_client_destroy(ptx_client*);
int ptx_rgbe_encode(const uint8_t*, int, int, uint8_t*, size_t, size_t*);
}

// Streams the tile in two row bands to exercise the incremental-frame
// path under TSAN.
static int fill_cb(uint32_t x0, uint32_t y0, uint32_t w, uint32_t h,
                   uint32_t spp, uint32_t, uint64_t, ptx_emit_fn emit,
                   void* ectx, void*) {
  std::vector<float> band(static_cast<size_t>(w) * h * 3);
  for (auto& v : band) v = static_cast<float>(x0 + y0 + spp);
  uint32_t first = h / 2 ? h / 2 : h;
  if (emit(ectx, 0, first, band.data())) return 3;
  if (first < h && emit(ectx, first, h - first, band.data())) return 3;
  return 0;
}

int main() {
  // --- pool churn -------------------------------------------------------
  std::atomic<long> sum{0};
  {
    ptxrt::Pool pool(8);
    std::vector<std::thread> producers;
    for (int p = 0; p < 4; ++p) {
      producers.emplace_back([&pool, &sum, p] {
        for (int i = 0; i < 200; ++i)
          pool.submit([&sum, p, i] { sum.fetch_add(p * 1000 + i); });
      });
    }
    for (auto& t : producers) t.join();
    pool.wait_idle();
  }
  std::printf("pool sum=%ld\n", sum.load());

  // --- farm round-trips -------------------------------------------------
  ptx_server* srv = ptx_server_start("127.0.0.1", 0, fill_cb, nullptr, 4, 0);
  if (!srv) {
    std::fprintf(stderr, "server start failed\n");
    return 1;
  }
  int port = ptx_server_port(srv);
  const char* hosts[] = {"127.0.0.1"};
  int ports[] = {port};
  ptx_client* cli = ptx_client_create(hosts, ports, 1, 50, 5, 0);
  std::vector<std::thread> workers;
  std::atomic<int> ok{0};
  std::atomic<int> progress_events{0};
  for (int w = 0; w < 6; ++w) {
    workers.emplace_back([cli, &ok, &progress_events, w] {
      std::vector<float> buf(16 * 16 * 3);
      for (int i = 0; i < 20; ++i) {
        if (ptx_client_render_tile(
                cli, w, i, 16, 16, 3, 2, 7, buf.data(),
                [](void* ctx, uint32_t, uint32_t) {
                  static_cast<std::atomic<int>*>(ctx)->fetch_add(1);
                },
                &progress_events) == 0)
          ok.fetch_add(1);
      }
    });
  }
  for (auto& t : workers) t.join();
  ptx_client_destroy(cli);
  ptx_server_stop(srv);
  std::printf("farm ok=%d/120\n", ok.load());
  return ok.load() == 120 ? 0 : 2;
}
