#include "http/types.h"

namespace gabby::http {

const char* StatusText(StatusCode code) {
    switch (code) {
        case StatusCode::OK: return "OK";
        case StatusCode::BAD_REQUEST: return "Bad Request";
        case StatusCode::NOT_FOUND: return "Not Found";
        case StatusCode::METHOD_NOT_ALLOWED: return "Method Not Allowed";
        case StatusCode::REQUEST_TIMEOUT: return "Request Timeout";
        case StatusCode::PAYLOAD_TOO_LARGE: return "Payload Too Large";
        case StatusCode::TOO_MANY_REQUESTS: return "Too Many Requests";
        case StatusCode::INTERNAL_SERVER_ERROR: return "Internal Server Error";
        case StatusCode::SERVICE_UNAVAILABLE: return "Service Unavailable";
    }
    return "Unknown";
}

std::string to_string(StatusCode code) {
    return std::to_string(static_cast<int>(code));
}

std::string to_string(Method m) { return m == Method::GET ? "GET" : "POST"; }

std::optional<std::string> Request::Header(const std::string& name) const {
    std::string key;
    key.reserve(name.size());
    for (char c : name) key += static_cast<char>(std::tolower(c));
    auto it = headers.find(key);
    if (it == headers.end()) return std::nullopt;
    return it->second;
}

size_t Request::ContentLength() const {
    auto v = Header("content-length");
    if (!v) throw BadRequestException("missing Content-Length");
    try {
        long long n = std::stoll(*v);
        if (n < 0) throw BadRequestException("negative Content-Length");
        return static_cast<size_t>(n);
    } catch (const HttpException&) {
        throw;
    } catch (const std::exception&) {
        throw BadRequestException("bad Content-Length: " + *v);
    }
}

}  // namespace gabby::http
