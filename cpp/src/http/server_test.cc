// Socket-level integration tests: a real HttpServer on port 0 driven by raw
// client sockets, including pathological clients. Taxonomy follows
// /root/reference/src/http/server_test.cc:30-203 (connect-and-hang-up, slow
// writer -> 408, happy path with header echo, concurrency sweep).
#include "http/server.h"

#include <chrono>
#include <thread>

#include "http/test_client.h"
#include "test/test.h"

namespace gabby::http {
namespace {

// RAII server wrapper on an ephemeral port.
class TestServer {
   public:
    explicit TestServer(Handler handler, ServerConfig config = {}) {
        config.port = 0;
        config.workers = config.workers ? config.workers : 4;
        server_ = std::make_unique<HttpServer>(config);
        server_->Start(std::move(handler));
    }
    ~TestServer() {
        server_->Stop();
        server_->Wait();
    }
    int port() const { return server_->port(); }

   private:
    std::unique_ptr<HttpServer> server_;
};

Handler EchoHandler() {
    return [](Request& req, ResponseWriter& resp) {
        resp.WriteStatus(StatusCode::OK);
        if (auto v = req.Header("x-echo")) resp.WriteHeader("x-echo", *v);
        resp.WriteData("path=" + req.path);
    };
}

TEST(Server, HappyPath) {
    TestServer server(EchoHandler());
    auto resp = Call(server.port(), "GET", "/hello", "",
                     {{"X-Echo", "ping"}});
    EXPECT_EQ(resp.status, 200);
    EXPECT_EQ(resp.headers["x-echo"], "ping");
    EXPECT_EQ(resp.headers["connection"], "close");
    EXPECT_EQ(resp.body, "path=/hello");
    // buffered responses carry Content-Length (the reference omits it)
    EXPECT_EQ(resp.headers["content-length"], std::to_string(resp.body.size()));
}

TEST(Server, QueryStringSplit) {
    TestServer server([](Request& req, ResponseWriter& resp) {
        resp.WriteData(req.path + "|" + req.query);
    });
    auto resp = Call(server.port(), "GET", "/p?a=1&b=2");
    EXPECT_EQ(resp.body, "/p|a=1&b=2");
}

TEST(Server, ClientHangsUpImmediately) {
    TestServer server(EchoHandler());
    { ClientSocket sock(server.port()); }  // connect, say nothing, vanish
    // server must keep serving afterwards
    auto resp = Call(server.port(), "GET", "/after");
    EXPECT_EQ(resp.status, 200);
}

TEST(Server, SlowWriterGets408) {
    ServerConfig config;
    config.read_timeout_millis = 150;
    TestServer server(EchoHandler(), config);
    ClientSocket sock(server.port());
    sock.Write("GET /slow HTTP/1.1\r\n");  // never finish the request
    std::string raw = sock.ReadAll();
    EXPECT_SUBSTR(raw, "408");
}

TEST(Server, MalformedRequestLineIs400) {
    TestServer server(EchoHandler());
    ClientSocket sock(server.port());
    sock.Write("NONSENSE\r\n\r\n");
    sock.CloseWrite();
    EXPECT_SUBSTR(sock.ReadAll(), "400");
}

TEST(Server, UnsupportedMethodIs405) {
    TestServer server(EchoHandler());
    ClientSocket sock(server.port());
    sock.Write("DELETE / HTTP/1.1\r\n\r\n");
    sock.CloseWrite();
    EXPECT_SUBSTR(sock.ReadAll(), "405");
}

TEST(Server, HandlerExceptionMapsToStatus) {
    TestServer server([](Request& req, ResponseWriter&) {
        if (req.path == "/bad") throw BadRequestException("nope");
        if (req.path == "/boom") throw std::runtime_error("kaboom");
        throw NotFoundException("gone");
    });
    EXPECT_EQ(Call(server.port(), "GET", "/bad").status, 400);
    EXPECT_EQ(Call(server.port(), "GET", "/boom").status, 500);
    EXPECT_EQ(Call(server.port(), "GET", "/missing").status, 404);
}

TEST(Server, OversizedBodyIs413) {
    ServerConfig config;
    config.max_body_bytes = 16;
    TestServer server(EchoHandler(), config);
    auto resp = Call(server.port(), "POST", "/p",
                     std::string(64, 'x'));
    EXPECT_EQ(resp.status, 413);
}

TEST(Server, ChunkedStreaming) {
    TestServer server([](Request&, ResponseWriter& resp) {
        resp.WriteStatus(StatusCode::OK);
        resp.WriteHeader("Content-Type", "text/event-stream");
        resp.WriteChunk("one ");
        resp.WriteChunk("two ");
        resp.WriteChunk("three");
    });
    auto resp = Call(server.port(), "GET", "/stream");
    EXPECT_EQ(resp.status, 200);
    EXPECT_EQ(resp.headers["transfer-encoding"], "chunked");
    EXPECT_EQ(resp.body, "one two three");
}

TEST(Server, ConcurrencySweep) {
    // 1..4 workers x 8 clients x 5 requests, all must be 200
    for (int workers = 1; workers <= 4; workers++) {
        ServerConfig config;
        config.workers = workers;
        config.max_queue = 64;  // plenty: this test wants no shedding
        TestServer server(EchoHandler(), config);
        std::vector<std::thread> clients;
        std::atomic<int> ok{0};
        for (int c = 0; c < 8; c++) {
            clients.emplace_back([&] {
                for (int r = 0; r < 5; r++) {
                    if (Call(server.port(), "GET", "/c").status == 200) {
                        ok.fetch_add(1);
                    }
                }
            });
        }
        for (auto& t : clients) t.join();
        EXPECT_EQ(ok.load(), 40);
    }
}

// Reads exactly ONE Content-Length-framed response off the socket (for
// keep-alive tests, where ReadAll() would block until idle timeout).
std::string ReadOneResponse(ClientSocket& sock) {
    std::string raw;
    char c;
    while (raw.find("\r\n\r\n") == std::string::npos) {
        if (!sock.ReadSome(&c, 1)) return raw;
        raw += c;
    }
    auto cl_pos = raw.find("Content-Length: ");
    size_t cl = cl_pos == std::string::npos
                    ? 0
                    : std::stoul(raw.substr(cl_pos + 16));
    size_t have = raw.size() - (raw.find("\r\n\r\n") + 4);
    for (size_t i = have; i < cl; i++) {
        if (!sock.ReadSome(&c, 1)) break;
        raw += c;
    }
    return raw;
}

TEST(Server, KeepAliveServesSequentialRequests) {
    TestServer server(EchoHandler());
    ClientSocket sock(server.port());
    for (int i = 0; i < 3; i++) {
        sock.Write("GET /r" + std::to_string(i) +
                   " HTTP/1.1\r\nHost: t\r\n\r\n");
        std::string raw = ReadOneResponse(sock);
        EXPECT_SUBSTR(raw, "200 OK");
        EXPECT_SUBSTR(raw, "Connection: keep-alive");
        EXPECT_SUBSTR(raw, "path=/r" + std::to_string(i));
    }
    // explicit close honored
    sock.Write("GET /last HTTP/1.1\r\nHost: t\r\nConnection: close\r\n\r\n");
    std::string raw = ReadOneResponse(sock);
    EXPECT_SUBSTR(raw, "Connection: close");
    EXPECT_EQ(sock.ReadAll(), "");  // server closes after the response
}

TEST(Server, PipelinedRequestsOneConnection) {
    // both requests written BEFORE reading anything; two responses in order
    TestServer server(EchoHandler());
    ClientSocket sock(server.port());
    sock.Write(
        "GET /one HTTP/1.1\r\nHost: t\r\n\r\n"
        "GET /two HTTP/1.1\r\nHost: t\r\nConnection: close\r\n\r\n");
    std::string first = ReadOneResponse(sock);
    std::string second = ReadOneResponse(sock);
    EXPECT_SUBSTR(first, "path=/one");
    EXPECT_SUBSTR(second, "path=/two");
}

TEST(Server, KeepAliveDrainsUnreadBody) {
    // handler never reads the POST body; the server must still drain it
    // so the next request on the connection parses cleanly
    TestServer server(EchoHandler());
    ClientSocket sock(server.port());
    std::string body(300, 'b');
    sock.Write("POST /ignore-body HTTP/1.1\r\nHost: t\r\nContent-Length: " +
               std::to_string(body.size()) + "\r\n\r\n" + body);
    EXPECT_SUBSTR(ReadOneResponse(sock), "path=/ignore-body");
    sock.Write("GET /after HTTP/1.1\r\nHost: t\r\nConnection: close\r\n\r\n");
    EXPECT_SUBSTR(ReadOneResponse(sock), "path=/after");
}

TEST(Server, HandlerCannotReadPastItsBody) {
    // a handler that tries to read MORE than Content-Length must hit EOF,
    // not steal bytes from the next pipelined request
    TestServer server([](Request& req, ResponseWriter& resp) {
        std::string got;
        int c;
        while ((c = std::fgetc(req.stream)) != EOF) {
            got += static_cast<char>(c);
        }
        resp.WriteData("got=" + got);
    });
    ClientSocket sock(server.port());
    sock.Write(
        "POST /a HTTP/1.1\r\nHost: t\r\nContent-Length: 3\r\n\r\nabc"
        "POST /b HTTP/1.1\r\nHost: t\r\nContent-Length: 3\r\n"
        "Connection: close\r\n\r\nxyz");
    EXPECT_SUBSTR(ReadOneResponse(sock), "got=abc");
    EXPECT_SUBSTR(ReadOneResponse(sock), "got=xyz");
}

TEST(Server, SlowReaderGets408OnWrite) {
    // the reference's slow-reader case (its server_test.cc:95-125): a 16 MB
    // response to a client that stops reading must trip SO_SNDTIMEO ->
    // write timeout, not wedge the worker
    ServerConfig config;
    config.write_timeout_millis = 200;
    std::atomic<bool> threw{false};
    TestServer server(
        [&](Request&, ResponseWriter& resp) {
            resp.WriteStatus(StatusCode::OK);
            resp.WriteData(std::string(16 << 20, 'x'));
        },
        config);
    {
        ClientSocket sock(server.port());
        sock.Write("GET /big HTTP/1.1\r\nHost: t\r\nConnection: close\r\n\r\n");
        // read a token amount, then stall without closing; the socket
        // buffers fill and the server's send() must time out
        char buf[1024];
        EXPECT_TRUE(sock.ReadSome(buf, sizeof(buf)));
        std::this_thread::sleep_for(std::chrono::milliseconds(900));
    }
    // the worker must be free again: a healthy request completes
    auto resp = Call(server.port(), "GET", "/after");
    EXPECT_EQ(resp.status, 200);
    (void)threw;
}

TEST(Server, GracefulStopUnblocksWait) {
    auto server = std::make_unique<HttpServer>(ServerConfig{.port = 0});
    server->Start(EchoHandler());
    std::thread stopper([&] {
        std::this_thread::sleep_for(std::chrono::milliseconds(50));
        server->Stop();
    });
    server->Wait();  // must return after Stop
    stopper.join();
}

}  // namespace
}  // namespace gabby::http
