#include "http/test_client.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cerrno>
#include <cstring>
#include <sstream>

#include "json/parser.h"
#include "utils/logging.h"

namespace gabby::http {

ClientSocket::ClientSocket(int port) {
    for (int attempt = 0;; attempt++) {
        int fd = socket(AF_INET, SOCK_STREAM, 0);
        if (fd < 0) throw SystemError(errno);
        struct sockaddr_in addr{};
        addr.sin_family = AF_INET;
        addr.sin_port = htons(static_cast<uint16_t>(port));
        inet_pton(AF_INET, "127.0.0.1", &addr.sin_addr);
        if (connect(fd, reinterpret_cast<struct sockaddr*>(&addr),
                    sizeof(addr)) == 0) {
            fd_ = OwnedFd(fd);
            return;
        }
        int err = errno;
        close(fd);
        if (attempt >= 3 || (err != ECONNABORTED && err != ECONNREFUSED)) {
            throw SystemError(err);
        }
        usleep(10000);
    }
}

void ClientSocket::Write(const std::string& data) {
    size_t off = 0;
    while (off < data.size()) {
        ssize_t n = send(fd_.get(), data.data() + off, data.size() - off, 0);
        if (n < 0) {
            if (errno == EINTR) continue;
            throw SystemError(errno);
        }
        off += static_cast<size_t>(n);
    }
}

std::string ClientSocket::ReadAll() {
    std::string out;
    char buf[4096];
    for (;;) {
        ssize_t n = recv(fd_.get(), buf, sizeof(buf), 0);
        if (n < 0) {
            if (errno == EINTR) continue;
            if (errno == ECONNRESET) return out;  // server closed hard
            throw SystemError(errno);
        }
        if (n == 0) return out;
        out.append(buf, static_cast<size_t>(n));
    }
}

bool ClientSocket::ReadSome(char* buf, size_t n) {
    for (;;) {
        ssize_t r = recv(fd_.get(), buf, n, 0);
        if (r < 0) {
            if (errno == EINTR) continue;
            if (errno == ECONNRESET) return false;
            throw SystemError(errno);
        }
        return r > 0;
    }
}

void ClientSocket::CloseWrite() { shutdown(fd_.get(), SHUT_WR); }

ClientResponse ParseResponse(const std::string& raw) {
    ClientResponse resp;
    auto head_end = raw.find("\r\n\r\n");
    if (head_end == std::string::npos) {
        throw std::runtime_error("no header terminator in response");
    }
    std::istringstream head(raw.substr(0, head_end));
    std::string line;
    std::getline(head, line);
    // "HTTP/1.1 200 OK"
    auto sp1 = line.find(' ');
    resp.status = std::stoi(line.substr(sp1 + 1));
    while (std::getline(head, line)) {
        if (!line.empty() && line.back() == '\r') line.pop_back();
        auto colon = line.find(':');
        if (colon == std::string::npos) continue;
        std::string key = line.substr(0, colon);
        for (auto& c : key) c = static_cast<char>(std::tolower(c));
        size_t v = colon + 1;
        while (v < line.size() && line[v] == ' ') v++;
        resp.headers[key] = line.substr(v);
    }
    std::string body = raw.substr(head_end + 4);
    if (resp.headers.count("transfer-encoding") &&
        resp.headers["transfer-encoding"] == "chunked") {
        // de-chunk
        std::string out;
        size_t pos = 0;
        for (;;) {
            auto eol = body.find("\r\n", pos);
            if (eol == std::string::npos) break;
            size_t len = std::stoul(body.substr(pos, eol - pos), nullptr, 16);
            if (len == 0) break;
            out += body.substr(eol + 2, len);
            pos = eol + 2 + len + 2;
        }
        resp.body = out;
    } else {
        resp.body = body;
    }
    return resp;
}

ClientResponse Call(int port, const std::string& method,
                    const std::string& path, const std::string& body,
                    const std::map<std::string, std::string>& headers) {
    ClientSocket sock(port);
    std::ostringstream req;
    // one-shot client: ask the server to close so ReadAll() terminates
    // at EOF (keep-alive paths are tested with raw ClientSocket)
    req << method << " " << path << " HTTP/1.1\r\n"
        << "Host: 127.0.0.1\r\n"
        << "Connection: close\r\n"
        << "User-Agent: gabby-test\r\n";
    for (const auto& [k, v] : headers) req << k << ": " << v << "\r\n";
    if (!body.empty() || method == "POST") {
        req << "Content-Length: " << body.size() << "\r\n";
    }
    req << "\r\n" << body;
    sock.Write(req.str());
    return ParseResponse(sock.ReadAll());
}

std::pair<int, json::ValuePtr> PostJson(int port, const std::string& path,
                                        const std::string& body) {
    ClientResponse resp = Call(port, "POST", path, body,
                               {{"Content-Type", "application/json"}});
    json::ValuePtr parsed =
        resp.body.empty() ? json::Value::nil() : json::Parse(resp.body);
    return {resp.status, parsed};
}

}  // namespace gabby::http
