// Router tests with an in-memory fake ResponseWriter — the same fake-writer
// pattern as /root/reference/src/http/router_test.cc:21-33.
#include "http/router.h"

#include "test/test.h"

namespace gabby::http {
namespace {

class FakeWriter : public ResponseWriter {
   public:
    void WriteStatus(StatusCode code) override { status = code; }
    void WriteHeader(const std::string& k, const std::string& v) override {
        headers[k] = v;
    }
    void WriteData(const std::string& d) override { data += d; }
    void WriteChunk(const std::string& d) override { chunks.push_back(d); }
    void Flush() override { flushed = true; }

    StatusCode status = StatusCode::OK;
    std::map<std::string, std::string> headers;
    std::string data;
    std::vector<std::string> chunks;
    bool flushed = false;
};

Request Req(const std::string& path) {
    Request r;
    r.path = path;
    return r;
}

TEST(Router, FirstFullMatchWins) {
    auto handler = Router::Builder()
                       .route("/a", [](Request&, ResponseWriter& w) {
                           w.WriteData("A");
                       })
                       .route("/a.*", [](Request&, ResponseWriter& w) {
                           w.WriteData("B");
                       })
                       .build();
    FakeWriter w1, w2;
    Request r1 = Req("/a"), r2 = Req("/abc");
    handler(r1, w1);
    handler(r2, w2);
    EXPECT_EQ(w1.data, "A");
    EXPECT_EQ(w2.data, "B");
}

TEST(Router, RequiresFullMatch) {
    auto handler = Router::Builder()
                       .route("/x", [](Request&, ResponseWriter& w) {
                           w.WriteData("X");
                       })
                       .build();
    FakeWriter w;
    Request r = Req("/x/y");
    EXPECT_THROWS(handler(r, w), NotFoundException);
}

TEST(Router, NoRouteIs404) {
    auto handler = Router::Builder().build();
    FakeWriter w;
    Request r = Req("/nope");
    EXPECT_THROWS(handler(r, w), NotFoundException);
}

}  // namespace
}  // namespace gabby::http
