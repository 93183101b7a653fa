#include "http/server.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cerrno>
#include <cstring>
#include <sstream>

#include "json/json.h"
#include "utils/logging.h"

namespace gabby::http {
namespace {

constexpr size_t kMaxLineLen = 8192;
constexpr size_t kMaxHeaders = 100;

// Reads one CRLF-terminated line (without the CRLF). Distinguishes timeout
// (EAGAIN on a socket with SO_RCVTIMEO) from disconnect/garbage.
std::string ReadLine(FILE* stream) {
    std::string line;
    for (;;) {
        int c = std::fgetc(stream);
        if (c == EOF) {
            if (ferror(stream) && (errno == EAGAIN || errno == EWOULDBLOCK)) {
                throw TimeoutException("read timed out");
            }
            throw BadRequestException("unexpected end of request");
        }
        if (c == '\n') {
            if (!line.empty() && line.back() == '\r') line.pop_back();
            return line;
        }
        if (line.size() >= kMaxLineLen) {
            throw BadRequestException("request line too long");
        }
        line += static_cast<char>(c);
    }
}

void SetTimeout(int fd, int which, int millis) {
    struct timeval tv;
    tv.tv_sec = millis / 1000;
    tv.tv_usec = (millis % 1000) * 1000;
    if (setsockopt(fd, SOL_SOCKET, which, &tv, sizeof(tv)) != 0) {
        throw SystemError(errno);
    }
}

// Writes the full buffer to the raw fd. stdio cannot switch a "r+" socket
// stream from reading to writing (it demands a seek, ESPIPE on sockets), so
// all response bytes bypass the FILE* and go straight to the fd.
// MSG_NOSIGNAL: a vanished client must surface as an error, not SIGPIPE.
void SendAll(int fd, const char* data, size_t len) {
    size_t off = 0;
    while (off < len) {
        ssize_t n = send(fd, data + off, len - off, MSG_NOSIGNAL);
        if (n < 0) {
            if (errno == EINTR) continue;
            if (errno == EAGAIN || errno == EWOULDBLOCK) {
                throw TimeoutException("write timed out");
            }
            throw SystemError(errno);
        }
        off += static_cast<size_t>(n);
    }
}

// Buffered-or-chunked response writer over the connection socket.
class SocketWriter : public ResponseWriter {
   public:
    explicit SocketWriter(int fd) : fd_(fd) {}

    void WriteStatus(StatusCode code) override {
        if (committed_) {
            LOG(WARN) << "status after body committed; ignored";
            return;
        }
        status_ = code;
    }

    void WriteHeader(const std::string& key, const std::string& value) override {
        if (committed_) {
            LOG(WARN) << "header after body committed; ignored";
            return;
        }
        headers_ += key + ": " + value + "\r\n";
    }

    void WriteData(const std::string& data) override {
        if (chunked_) throw InternalError("WriteData after WriteChunk");
        body_ += data;
    }

    void WriteChunk(const std::string& data) override {
        if (!committed_) {
            chunked_ = true;
            SendHead("Transfer-Encoding: chunked\r\n");
        }
        if (data.empty()) return;  // empty chunk would terminate the stream
        char len[20];
        std::snprintf(len, sizeof(len), "%zx\r\n", data.size());
        Send(len);
        Send(data);
        Send("\r\n");
    }

    void Flush() override {
        if (chunked_) {
            Send("0\r\n\r\n");
        } else {
            if (!committed_) {
                SendHead("Content-Length: " + std::to_string(body_.size()) +
                         "\r\n");
            }
            Send(body_);
        }
    }

    StatusCode status() const { return status_; }
    size_t bytes_sent() const { return bytes_; }
    bool committed() const { return committed_; }
    void set_keep_alive(bool v) { keep_alive_ = v; }

   private:
    void SendHead(const std::string& framing) {
        Send("HTTP/1.1 " + to_string(status_) + " " + StatusText(status_) +
             "\r\n");
        Send(headers_);
        Send(framing);
        Send(keep_alive_ ? "Connection: keep-alive\r\n\r\n"
                         : "Connection: close\r\n\r\n");
        committed_ = true;
    }

    void Send(const std::string& data) {
        if (data.empty()) return;
        SendAll(fd_, data.data(), data.size());
        bytes_ += data.size();
    }

    int fd_;
    StatusCode status_ = StatusCode::OK;
    std::string headers_;
    std::string body_;
    bool committed_ = false;
    bool chunked_ = false;
    bool keep_alive_ = false;
    size_t bytes_ = 0;
};

// Wraps the connection stream so handler body reads are COUNTED and
// BOUNDED by Content-Length: keep-alive must know how much body the
// handler left unread (to drain it before the next request) and must
// never let a handler read past its body into a pipelined request.
// Unbuffered cookie stream -> reads pass through one byte at a time to
// the (buffered) connection FILE*, preserving errno (EAGAIN -> timeout).
class BodyStream {
   public:
    BodyStream(FILE* inner, size_t limit) : inner_(inner), limit_(limit) {
        cookie_io_functions_t io{};
        io.read = &BodyStream::CookieRead;
        stream_ = fopencookie(this, "r", io);
        if (stream_ != nullptr) setvbuf(stream_, nullptr, _IONBF, 0);
    }
    ~BodyStream() {
        if (stream_ != nullptr) fclose(stream_);
    }
    BodyStream(const BodyStream&) = delete;
    BodyStream& operator=(const BodyStream&) = delete;

    FILE* stream() { return stream_; }

    // Consumes whatever the handler left unread; false on EOF/timeout.
    bool DrainRemainder() {
        while (consumed_ < limit_) {
            if (std::fgetc(inner_) == EOF) return false;
            consumed_++;
        }
        return true;
    }

   private:
    static ssize_t CookieRead(void* cookie, char* buf, size_t n) {
        auto* b = static_cast<BodyStream*>(cookie);
        if (n == 0 || b->consumed_ >= b->limit_) return 0;  // body exhausted
        int ch = std::fgetc(b->inner_);
        if (ch == EOF) return -1;  // errno preserved for the caller
        buf[0] = static_cast<char>(ch);
        b->consumed_++;
        return 1;
    }

    FILE* inner_;
    size_t limit_;
    size_t consumed_ = 0;
    FILE* stream_ = nullptr;
};

// Best-effort error response; never throws.
void MustSend(int fd, StatusCode code, const std::string& msg) {
    std::ostringstream body;
    body << "{\"error\":{\"code\":" << to_string(code) << ",\"message\":";
    json::EscapeString(body, msg);
    body << "}}";
    std::string b = body.str();
    std::ostringstream os;
    os << "HTTP/1.1 " << to_string(code) << " " << StatusText(code) << "\r\n"
       << "Content-Type: application/json\r\n"
       << "Content-Length: " << b.size() << "\r\n"
       << "Connection: close\r\n\r\n"
       << b;
    std::string s = os.str();
    try {
        SendAll(fd, s.data(), s.size());
    } catch (const std::exception&) {
        // best-effort: the client may already be gone
    }
}

// Discards unread request bytes before close. Closing with data still in
// the receive buffer makes the kernel send RST, which can destroy the
// response before the client reads it. Bounded: short timeout, 64 KB cap.
void DrainBeforeClose(int fd) {
    shutdown(fd, SHUT_WR);  // FIN: we are done writing
    struct timeval tv{0, 200000};  // 200 ms
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    char buf[4096];
    size_t total = 0;
    while (total < 64 * 1024) {
        ssize_t n = recv(fd, buf, sizeof(buf), 0);
        if (n <= 0) break;
        total += static_cast<size_t>(n);
    }
}

}  // namespace

Request ParseRequest(FILE* stream, const std::string& addr) {
    Request req;
    req.addr = addr;
    req.stream = stream;

    std::string line = ReadLine(stream);
    std::istringstream is(line);
    std::string method, target, version;
    is >> method >> target >> version;
    if (method.empty() || target.empty() || version.empty()) {
        throw BadRequestException("malformed request line: " + line);
    }
    if (method == "GET") {
        req.method = Method::GET;
    } else if (method == "POST") {
        req.method = Method::POST;
    } else {
        throw MethodNotAllowedException("unsupported method: " + method);
    }
    if (target.empty() || target[0] != '/') {
        throw BadRequestException("bad request target: " + target);
    }
    if (version.rfind("HTTP/1.", 0) != 0) {
        throw BadRequestException("bad HTTP version: " + version);
    }
    bool http11 = version != "HTTP/1.0";
    if (auto q = target.find('?'); q != std::string::npos) {
        req.path = target.substr(0, q);
        req.query = target.substr(q + 1);
    } else {
        req.path = target;
    }

    for (size_t n = 0;; n++) {
        std::string h = ReadLine(stream);
        if (h.empty()) break;
        if (n >= kMaxHeaders) throw BadRequestException("too many headers");
        auto colon = h.find(':');
        if (colon == std::string::npos) {
            throw BadRequestException("malformed header: " + h);
        }
        std::string key = h.substr(0, colon);
        size_t vstart = colon + 1;
        while (vstart < h.size() && h[vstart] == ' ') vstart++;
        size_t vend = h.size();
        while (vend > vstart && (h[vend - 1] == ' ' || h[vend - 1] == '\r')) {
            vend--;
        }
        for (auto& c : key) c = static_cast<char>(std::tolower(c));
        req.headers[key] = h.substr(vstart, vend - vstart);
    }
    std::string conn;
    if (auto it = req.headers.find("connection"); it != req.headers.end()) {
        conn = it->second;
        for (auto& c : conn) c = static_cast<char>(std::tolower(c));
    }
    req.keep_alive = http11 ? conn != "close" : conn == "keep-alive";
    return req;
}

HttpServer::HttpServer(const ServerConfig& config) : config_(config) {
    int fds[2];
    if (pipe(fds) != 0) throw SystemError(errno);
    pipe_read_ = OwnedFd(fds[0]);
    pipe_write_ = OwnedFd(fds[1]);
}

HttpServer::~HttpServer() {
    if (run_.load()) Stop();
    if (listener_.joinable()) listener_.join();
}

void HttpServer::Start(Handler handler) {
    handler_ = std::move(handler);

    int fd = socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) throw SystemError(errno);
    listen_fd_ = OwnedFd(fd);
    int one = 1;
    setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));

    struct sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_ANY);
    addr.sin_port = htons(static_cast<uint16_t>(config_.port));
    if (bind(fd, reinterpret_cast<struct sockaddr*>(&addr), sizeof(addr)) != 0) {
        throw SystemError(errno);
    }
    if (listen(fd, SOMAXCONN) != 0) throw SystemError(errno);

    // recover the ephemeral port for port-0 tests
    socklen_t len = sizeof(addr);
    if (getsockname(fd, reinterpret_cast<struct sockaddr*>(&addr), &len) != 0) {
        throw SystemError(errno);
    }
    port_.store(ntohs(addr.sin_port));

    pool_ = std::make_unique<ThreadPool>(config_.workers, config_.max_queue);
    run_.store(true);
    running_.store(true);
    listener_ = std::thread([this] { Listen(); });
    LOG(INFO) << "listening on port " << port_.load() << " with "
              << pool_->workers() << " workers";
}

void HttpServer::Wait() {
    if (listener_.joinable()) listener_.join();
    pool_.reset();  // joins workers after draining in-flight tasks
}

void HttpServer::Stop() {
    if (!run_.exchange(false)) return;
    char b = 'x';
    [[maybe_unused]] ssize_t n = write(pipe_write_.get(), &b, 1);
    // wait for the listener to acknowledge before returning
    running_.wait(true);
}

void HttpServer::Listen() {
    struct pollfd fds[2];
    fds[0].fd = listen_fd_.get();
    fds[0].events = POLLIN;
    fds[1].fd = pipe_read_.get();
    fds[1].events = POLLIN;

    while (run_.load()) {
        int rc = poll(fds, 2, -1);
        if (rc < 0) {
            if (errno == EINTR) continue;
            LOG(ERROR) << "poll: " << std::strerror(errno);
            break;
        }
        if (fds[1].revents & POLLIN) break;  // shutdown pipe
        if (!(fds[0].revents & POLLIN)) continue;

        struct sockaddr_in peer{};
        socklen_t len = sizeof(peer);
        int cfd = accept(listen_fd_.get(),
                         reinterpret_cast<struct sockaddr*>(&peer), &len);
        if (cfd < 0) {
            if (errno == EINTR || errno == ECONNABORTED) continue;
            LOG(ERROR) << "accept: " << std::strerror(errno);
            continue;
        }
        char ip[INET_ADDRSTRLEN];
        inet_ntop(AF_INET, &peer.sin_addr, ip, sizeof(ip));
        std::string addr = std::string(ip) + ":" +
                           std::to_string(ntohs(peer.sin_port));

        auto client = std::make_shared<OwnedFd>(cfd);
        bool queued = pool_->TryOffer([this, client, addr]() mutable {
            HandleConnection(std::move(*client), addr);
        });
        if (!queued) {
            // shed load without tying up the listener: the canned response
            // fits in the socket buffer, so this cannot block meaningfully
            LOG(WARN) << "worker queue full, shedding " << addr;
            static const char k429[] =
                "HTTP/1.1 429 Too Many Requests\r\n"
                "Content-Length: 0\r\nConnection: close\r\n\r\n";
            [[maybe_unused]] ssize_t n =
                send(client->get(), k429, sizeof(k429) - 1, MSG_DONTWAIT);
        }
    }
    running_.store(false);
    running_.notify_all();
}

void HttpServer::HandleConnection(OwnedFd client, const std::string& addr) {
    try {
        SetTimeout(client.get(), SO_RCVTIMEO, config_.read_timeout_millis);
        SetTimeout(client.get(), SO_SNDTIMEO, config_.write_timeout_millis);
    } catch (const std::exception& e) {
        LOG(ERROR) << "setsockopt: " << e.what();
        return;
    }
    // FILE* wraps the fd for buffered READS only (request line, headers,
    // size-bounded body parse); all writes go straight to the fd.
    FILE* f = fdopen(client.get(), "r");
    if (!f) {
        LOG(ERROR) << "fdopen: " << std::strerror(errno);
        return;
    }
    int fd = client.Release();  // stream owns the fd now
    OwnedStream stream(f);

    // HTTP/1.1 keep-alive: serve requests off this connection until the
    // client closes, asks to close, errors, or the per-connection cap.
    // Responses are always framed (Content-Length or chunked), and
    // BodyStream accounts for unread body bytes between requests.
    constexpr int kMaxRequestsPerConnection = 128;
    for (int served = 0; served < kMaxRequestsPerConnection; served++) {
        if (served > 0) {
            // idle reused connection: EOF or timeout while WAITING for the
            // next request is a quiet close, not a 408 (nothing in flight).
            // The wait runs under the SHORT idle timeout — this blocking
            // peek pins a pool worker, and at the full read timeout a few
            // idle keep-alive clients could starve new connections.
            try {
                SetTimeout(fd, SO_RCVTIMEO, config_.idle_timeout_millis);
            } catch (const std::exception&) {
                break;
            }
            int c = std::fgetc(f);
            if (c == EOF) break;
            std::ungetc(c, f);
            try {
                SetTimeout(fd, SO_RCVTIMEO, config_.read_timeout_millis);
            } catch (const std::exception&) {
                break;
            }
        }
        std::string method = "?", path = "?";
        SocketWriter writer(fd);
        bool keep = false;
        try {
            Request req = ParseRequest(f, addr);
            method = to_string(req.method);
            path = req.path;
            keep = req.keep_alive && served + 1 < kMaxRequestsPerConnection;
            size_t content_length = 0;
            if (auto cl = req.Header("content-length")) {
                content_length = req.ContentLength();
                if (content_length > config_.max_body_bytes) {
                    throw HttpException(StatusCode::PAYLOAD_TOO_LARGE,
                                        "body too large");
                }
            }
            BodyStream body(f, content_length);
            if (body.stream() == nullptr) {
                throw InternalError("fopencookie failed");
            }
            req.stream = body.stream();
            writer.set_keep_alive(keep);
            handler_(req, writer);
            writer.Flush();
            LOG(INFO) << addr << " " << method << " " << path << " -> "
                      << to_string(writer.status()) << " ("
                      << writer.bytes_sent() << " bytes)";
            if (keep && !body.DrainRemainder()) break;
        } catch (const json::JSONError& e) {
            LOG(INFO) << addr << " " << method << " " << path << " -> 400 ("
                      << e.what() << ")";
            if (!writer.committed()) {
                MustSend(fd, StatusCode::BAD_REQUEST, e.what());
            }
            keep = false;
        } catch (const HttpException& e) {
            LOG(INFO) << addr << " " << method << " " << path << " -> "
                      << to_string(e.status()) << " (" << e.what() << ")";
            if (!writer.committed()) MustSend(fd, e.status(), e.what());
            keep = false;
        } catch (const std::exception& e) {
            LOG(ERROR) << addr << " " << method << " " << path << " -> 500 ("
                       << e.what() << ")";
            if (!writer.committed()) {
                MustSend(fd, StatusCode::INTERNAL_SERVER_ERROR, e.what());
            }
            keep = false;
        }
        if (!keep) break;
    }
    DrainBeforeClose(fd);
}

}  // namespace gabby::http
