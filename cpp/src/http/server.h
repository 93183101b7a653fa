// Hand-rolled POSIX HTTP/1.1 server.
//
// Same capability as /root/reference/src/http/server.h:27-63: listener
// thread + poll loop + self-pipe graceful shutdown, per-connection
// send/recv timeouts, request parsing with the body left on the stream
// (so handlers can parse JSON bounded by Content-Length straight off the
// socket), worker thread pool, access log, exception -> status mapping.
// Extensions: Content-Length on buffered responses, chunked
// transfer-encoding for streaming (SSE), and 429 load-shedding when the
// worker queue is full (the reference's backpressure TODO).
#ifndef GABBY_HTTP_SERVER_H_
#define GABBY_HTTP_SERVER_H_

#include <atomic>
#include <memory>
#include <string>
#include <thread>

#include "http/thread_pool.h"
#include "http/types.h"
#include "utils/pointers.h"

namespace gabby::http {

struct ServerConfig {
    int port = 8080;             // 0 = ephemeral (tests)
    int read_timeout_millis = 5000;
    int write_timeout_millis = 10000;
    // Between keep-alive requests an idle connection pins a pool worker
    // while it waits for the next request line, so the idle wait must be
    // much shorter than the in-request read timeout or a handful of idle
    // clients starves new connections on a fixed-size pool.
    int idle_timeout_millis = 1000;
    int workers = 4;
    int max_queue = 0;           // 0 = 2 * workers
    size_t max_body_bytes = 32 << 20;  // 413 above this
};

class HttpServer {
   public:
    explicit HttpServer(const ServerConfig& config);
    ~HttpServer();

    HttpServer(const HttpServer&) = delete;
    HttpServer& operator=(const HttpServer&) = delete;

    // Binds, listens, spawns the listener thread + worker pool.
    void Start(Handler handler);
    // Blocks until Stop() completes the drain.
    void Wait();
    // Signals the listener to exit (self-pipe) and blocks until it has.
    void Stop();

    int port() const { return port_.load(); }

   private:
    void Listen();
    void HandleConnection(OwnedFd client, const std::string& addr);

    ServerConfig config_;
    Handler handler_;
    OwnedFd listen_fd_;
    OwnedFd pipe_read_, pipe_write_;   // self-pipe shutdown trick
    std::atomic<int> port_{0};
    std::atomic<bool> run_{false};
    std::atomic<bool> running_{false};
    std::thread listener_;
    std::unique_ptr<ThreadPool> pool_;
};

// Exposed for tests: parses the request line + headers from the stream,
// leaving the body unread. Throws BadRequestException on malformed input,
// TimeoutException if the socket read times out.
Request ParseRequest(FILE* stream, const std::string& addr);

}  // namespace gabby::http

#endif  // GABBY_HTTP_SERVER_H_
