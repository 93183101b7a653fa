// C API for embedding the native HTTP front-end under a Python engine.
//
// The engine seam is the reference's Generator hook
// (/root/reference/src/service.cc:150): the front-end parses HTTP + the
// OpenAI protocol in C++, then calls a single registered callback with a
// compact request JSON; the callback (the JAX engine, via ctypes) emits the
// completion — one emit for whole responses, many for streamed tokens — and
// the front-end wraps it back into OpenAI envelopes/SSE. All strings are
// UTF-8; emitted payloads are copied before the emit call returns.
#ifndef GABBY_BRIDGE_C_API_H_
#define GABBY_BRIDGE_C_API_H_

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct GabbyServer GabbyServer;

typedef struct GabbyServerConfig {
    int port;                  // 0 = ephemeral
    int read_timeout_millis;   // <=0 = default 5000
    int write_timeout_millis;  // <=0 = default 10000
    int workers;               // <=0 = default 4
    int max_queue;             // <=0 = 2 * workers
    int log_level;             // 0 off, 1 error, 2 warn, 3 info, 4 debug
} GabbyServerConfig;

// Emits one generation chunk back to the front-end.
//   chunk_json: {"delta": str}                               (streaming) or
//               {"delta": str, "done": true,
//                "finish_reason": str, "prompt_tokens": n,
//                "completion_tokens": n}                     (final)
// Returns 0 to continue, nonzero to abort generation (client went away).
typedef int (*gabby_emit_fn)(void* emit_ctx, const char* chunk_json,
                             size_t len);

// The engine hook. request_json:
//   {"messages": [{"role": str, "content": str}...], "model": str,
//    "temperature": f|-1, "top_p": f|-1, "top_k": n|-1,
//    "max_tokens": n|-1, "stream": bool}
// Must call emit at least once with "done": true. Return 0 on success;
// nonzero maps to HTTP 500 (or emit {"error": str, "done": true} first for
// a clean message).
typedef int (*gabby_generate_fn)(void* user_data, const char* request_json,
                                 size_t len, void* emit_ctx,
                                 gabby_emit_fn emit);

// Optional: fills `buf` with a JSON object of engine-side metrics (merged
// into /statusz under "engine"). Returns the number of bytes written, or 0
// for none. Must not exceed `cap`.
typedef size_t (*gabby_stats_fn)(void* user_data, char* buf, size_t cap);

// model_id may be NULL (defaults to "gabby-tpu").
GabbyServer* gabby_server_create(const GabbyServerConfig* config,
                                 gabby_generate_fn generate, void* user_data,
                                 const char* model_id);

// Registers the /statusz engine-metrics hook (optional; call before start).
void gabby_server_set_stats(GabbyServer* server, gabby_stats_fn stats,
                            void* user_data);

// Readiness gate: /readyz answers 503 while ready == 0, 200 once 1. The
// server starts ready; an embedder that warms its engine first sets 0
// before gabby_server_start and 1 after the warm-up. Thread-safe.
void gabby_server_set_ready(GabbyServer* server, int ready);

// Binds + starts listening. Returns the bound port, or -1 on error.
int gabby_server_start(GabbyServer* server);

int gabby_server_port(const GabbyServer* server);

// Signals shutdown (safe from signal handlers / other threads).
void gabby_server_stop(GabbyServer* server);

// Blocks until the server has drained after gabby_server_stop.
void gabby_server_wait(GabbyServer* server);

void gabby_server_destroy(GabbyServer* server);

// Last error message for this thread ("" if none).
const char* gabby_last_error(void);

#ifdef __cplusplus
}
#endif

#endif  // GABBY_BRIDGE_C_API_H_
