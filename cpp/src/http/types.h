// HTTP request/response types shared by server, router, and service.
//
// Same capability as /root/reference/src/http/types.h:15-103 (StatusCode,
// HttpException hierarchy, Method, Request with the body left on the
// connection stream, abstract ResponseWriter, Handler). Extended with the
// status codes the reference left as TODOs (405, 429/503 backpressure —
// /root/reference/README.md:32) and with chunked streaming support on
// ResponseWriter for SSE token streaming.
#ifndef GABBY_HTTP_TYPES_H_
#define GABBY_HTTP_TYPES_H_

#include <cstdio>
#include <functional>
#include <map>
#include <optional>
#include <stdexcept>
#include <string>

namespace gabby::http {

enum class StatusCode : int {
    OK = 200,
    BAD_REQUEST = 400,
    NOT_FOUND = 404,
    METHOD_NOT_ALLOWED = 405,
    REQUEST_TIMEOUT = 408,
    PAYLOAD_TOO_LARGE = 413,
    TOO_MANY_REQUESTS = 429,
    INTERNAL_SERVER_ERROR = 500,
    SERVICE_UNAVAILABLE = 503,
};

std::string to_string(StatusCode code);
const char* StatusText(StatusCode code);

class HttpException : public std::runtime_error {
   public:
    HttpException(StatusCode status, const std::string& msg)
        : std::runtime_error(msg), status_(status) {}
    StatusCode status() const { return status_; }

   private:
    StatusCode status_;
};

class BadRequestException : public HttpException {
   public:
    explicit BadRequestException(const std::string& msg)
        : HttpException(StatusCode::BAD_REQUEST, msg) {}
};

class NotFoundException : public HttpException {
   public:
    explicit NotFoundException(const std::string& msg)
        : HttpException(StatusCode::NOT_FOUND, msg) {}
};

class MethodNotAllowedException : public HttpException {
   public:
    explicit MethodNotAllowedException(const std::string& msg)
        : HttpException(StatusCode::METHOD_NOT_ALLOWED, msg) {}
};

class TimeoutException : public HttpException {
   public:
    explicit TimeoutException(const std::string& msg)
        : HttpException(StatusCode::REQUEST_TIMEOUT, msg) {}
};

class OverloadedException : public HttpException {
   public:
    explicit OverloadedException(const std::string& msg)
        : HttpException(StatusCode::TOO_MANY_REQUESTS, msg) {}
};

class InternalError : public HttpException {
   public:
    explicit InternalError(const std::string& msg)
        : HttpException(StatusCode::INTERNAL_SERVER_ERROR, msg) {}
};

enum class Method { GET, POST };

std::string to_string(Method m);

struct Request {
    std::string addr;                          // peer "ip:port"
    Method method = Method::GET;
    std::string path;                          // path only, no query
    std::string query;                         // raw query string ("" if none)
    std::map<std::string, std::string> headers;  // lower-cased keys
    FILE* stream = nullptr;  // body readable here, bounded by Content-Length
    // HTTP/1.1 default unless "Connection: close"; HTTP/1.0 only with
    // an explicit "Connection: keep-alive"
    bool keep_alive = false;

    std::optional<std::string> Header(const std::string& name) const;
    // Content-Length as size_t; throws BadRequestException if absent/bad.
    size_t ContentLength() const;
};

// Response sink. Status + headers are committed by the first body write.
class ResponseWriter {
   public:
    virtual ~ResponseWriter() = default;
    virtual void WriteStatus(StatusCode code) = 0;
    virtual void WriteHeader(const std::string& key,
                             const std::string& value) = 0;
    // Buffered whole-body write: body accumulates, Content-Length is set
    // automatically at flush. May be called multiple times (appends).
    virtual void WriteData(const std::string& data) = 0;
    // Switches to chunked transfer-encoding and sends one chunk immediately
    // (for SSE / token streaming). Mutually exclusive with WriteData.
    virtual void WriteChunk(const std::string& data) = 0;
    virtual void Flush() = 0;
};

using Handler = std::function<void(Request&, ResponseWriter&)>;

}  // namespace gabby::http

#endif  // GABBY_HTTP_TYPES_H_
