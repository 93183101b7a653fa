// Test-only blocking HTTP client for loopback integration tests.
// Counterpart of /root/reference/src/http/test_client.h:1-41 (raw socket
// writes so tests can also act as pathological clients).
#ifndef GABBY_HTTP_TEST_CLIENT_H_
#define GABBY_HTTP_TEST_CLIENT_H_

#include <map>
#include <string>

#include "json/json.h"
#include "utils/pointers.h"

namespace gabby::http {

// Unbuffered client socket: raw connect/write/read, for adversarial tests.
class ClientSocket {
   public:
    explicit ClientSocket(int port);
    void Write(const std::string& data);
    std::string ReadAll();      // until server closes
    // Reads up to n bytes (blocking); false on EOF. For keep-alive tests
    // that must read exactly one framed response.
    bool ReadSome(char* buf, size_t n);
    void CloseWrite();          // half-close (shutdown SHUT_WR)
    int fd() const { return fd_.get(); }

   private:
    OwnedFd fd_;
};

struct ClientResponse {
    int status = 0;
    std::map<std::string, std::string> headers;  // lower-cased keys
    std::string body;
};

ClientResponse ParseResponse(const std::string& raw);

// One-shot request/response over a fresh connection.
ClientResponse Call(int port, const std::string& method,
                    const std::string& path, const std::string& body = "",
                    const std::map<std::string, std::string>& headers = {});

// POSTs a JSON body and parses the response body as JSON.
std::pair<int, json::ValuePtr> PostJson(int port, const std::string& path,
                                        const std::string& body);

}  // namespace gabby::http

#endif  // GABBY_HTTP_TEST_CLIENT_H_
