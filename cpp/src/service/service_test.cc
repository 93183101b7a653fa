// Service-level integration tests: full HTTP stack with a dependency-
// injected fake generator — the canonical fake-at-the-Generator-seam
// pattern from /root/reference/src/service_test.cc:18-57 — plus streaming,
// statusz, and protocol-violation cases.
#include "service/service.h"

#include <memory>
#include <mutex>

#include "http/test_client.h"
#include "json/parser.h"
#include "test/test.h"

namespace gabby {
namespace {

class SimpleGenerator : public Generator {
   public:
    void Generate(const GenRequest& req,
                  const std::function<void(const GenChunk&)>& emit) override {
        {
            // RunNWay invokes the generator from N concurrent choice
            // threads by design; the fixture's capture must be guarded
            std::lock_guard<std::mutex> lock(mu_);
            last_request = req;
        }
        if (req.stream) {
            for (const std::string word : {"hello ", "from ", "fake"}) {
                GenChunk c;
                c.delta = word;
                if (req.logprobs) {
                    // one token per delta, like the engine's emit path
                    c.tokens.push_back(word);
                    c.token_logprobs.push_back(-0.25);
                    if (req.top_logprobs > 0) {
                        c.top_logprobs.push_back(
                            {{word, -0.25}, {"alt", -1.5}});
                    }
                }
                emit(c);
            }
        } else {
            GenChunk c;
            c.delta = "hello from fake";
            emit(c);
        }
        GenChunk done;
        done.done = true;
        done.finish_reason = "stop";
        done.prompt_tokens = 7;
        done.completion_tokens = 3;
        emit(done);
    }
    std::string model_id() const override { return "fake-model"; }

    GenRequest last_request;

   private:
    std::mutex mu_;
};

class TestService {
   public:
    TestService() : generator_(std::make_shared<SimpleGenerator>()) {
        ServiceConfig config;
        config.server.port = 0;
        config.server.workers = 2;
        service_ = std::make_unique<InferenceService>(config, generator_);
        service_->Start();
    }
    ~TestService() {
        service_->Stop();
        service_->Wait();
    }
    int port() const { return service_->port(); }
    SimpleGenerator& generator() { return *generator_; }
    InferenceService& service() { return *service_; }

   private:
    std::shared_ptr<SimpleGenerator> generator_;
    std::unique_ptr<InferenceService> service_;
};

constexpr const char* kChatBody = R"({
    "model": "m1",
    "messages": [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"}
    ],
    "temperature": 0.5,
    "max_tokens": 32
})";

TEST(Service, HealthCheck) {
    TestService svc;
    auto [status, body] = http::PostJson(svc.port(), "/healthz", "{}");
    // note: healthz accepts GET too; PostJson exercises POST routing
    EXPECT_EQ(status, 200);
    EXPECT_EQ(body->as_object().at("status")->as_string(), "ok");
}

TEST(Service, ReadyzGate) {
    TestService svc;
    // starts ready (plain C++ embedders serve immediately)
    auto [s0, b0] = http::PostJson(svc.port(), "/readyz", "{}");
    EXPECT_EQ(s0, 200);
    EXPECT_EQ(b0->as_object().at("status")->as_string(), "ready");
    // a warming embedder flips it off: 503, while /healthz stays 200
    svc.service().SetReady(false);
    auto [s1, b1] = http::PostJson(svc.port(), "/readyz", "{}");
    EXPECT_EQ(s1, 503);
    EXPECT_EQ(b1->as_object().at("status")->as_string(), "warming");
    auto [s2, b2] = http::PostJson(svc.port(), "/healthz", "{}");
    EXPECT_EQ(s2, 200);
    svc.service().SetReady(true);
    auto [s3, b3] = http::PostJson(svc.port(), "/readyz", "{}");
    EXPECT_EQ(s3, 200);
}

TEST(Service, ChatCompletion) {
    TestService svc;
    auto [status, body] = http::PostJson(svc.port(), "/v1/chat/completions",
                                         kChatBody);
    EXPECT_EQ(status, 200);
    const auto& obj = body->as_object();
    EXPECT_EQ(obj.at("object")->as_string(), "chat.completion");
    EXPECT_EQ(obj.at("model")->as_string(), "m1");
    const auto& choice = obj.at("choices")->as_array().at(0)->as_object();
    EXPECT_EQ(choice.at("finish_reason")->as_string(), "stop");
    const auto& msg = choice.at("message")->as_object();
    EXPECT_EQ(msg.at("role")->as_string(), "assistant");
    EXPECT_EQ(msg.at("content")->as_string(), "hello from fake");
    const auto& usage = obj.at("usage")->as_object();
    EXPECT_EQ(usage.at("prompt_tokens")->as_number(), 7.0);
    EXPECT_EQ(usage.at("completion_tokens")->as_number(), 3.0);
    EXPECT_EQ(usage.at("total_tokens")->as_number(), 10.0);

    // the generator saw the extracted request
    const GenRequest& seen = svc.generator().last_request;
    EXPECT_EQ(seen.messages.size(), size_t{2});
    EXPECT_EQ(seen.messages[0].role, "system");
    EXPECT_EQ(seen.messages[1].content, "hi");
    EXPECT_FLOAT_EQ(seen.temperature, 0.5, 1e-9);
    EXPECT_EQ(seen.max_tokens, 32);
}

TEST(Service, Streaming) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "stream": true})";
    auto resp = http::Call(svc.port(), "POST", "/v1/chat/completions", body,
                           {{"Content-Type", "application/json"}});
    EXPECT_EQ(resp.status, 200);
    EXPECT_EQ(resp.headers["content-type"], "text/event-stream");
    EXPECT_EQ(resp.headers["transfer-encoding"], "chunked");
    EXPECT_SUBSTR(resp.body, "chat.completion.chunk");
    EXPECT_SUBSTR(resp.body, "\"content\":\"hello \"");
    EXPECT_SUBSTR(resp.body, "\"finish_reason\":\"stop\"");
    EXPECT_SUBSTR(resp.body, "data: [DONE]");
}

TEST(Service, ProtocolViolations) {
    TestService svc;
    // GET not allowed
    EXPECT_EQ(http::Call(svc.port(), "GET", "/v1/chat/completions").status,
              405);
    // malformed JSON
    auto [s1, b1] = http::PostJson(svc.port(), "/v1/chat/completions", "{nope");
    EXPECT_EQ(s1, 400);
    EXPECT_SUBSTR(json::to_string(*b1), "error");
    // missing messages
    auto [s2, _] = http::PostJson(svc.port(), "/v1/chat/completions",
                                  R"({"model": "m"})");
    EXPECT_EQ(s2, 400);
    // last message must be user
    auto [s3, _2] = http::PostJson(
        svc.port(), "/v1/chat/completions",
        R"({"messages": [{"role": "assistant", "content": "x"}]})");
    EXPECT_EQ(s3, 400);
    // temperature out of range
    auto [s4, _3] = http::PostJson(
        svc.port(), "/v1/chat/completions",
        R"({"messages": [{"role": "user", "content": "x"}],
            "temperature": 9.0})");
    EXPECT_EQ(s4, 400);
    // unknown route
    auto [s5, _4] = http::PostJson(svc.port(), "/v2/nope", "{}");
    EXPECT_EQ(s5, 404);
}

TEST(Service, StatuszAndModels) {
    TestService svc;
    http::PostJson(svc.port(), "/v1/chat/completions", kChatBody);
    auto resp = http::Call(svc.port(), "GET", "/statusz");
    EXPECT_EQ(resp.status, 200);
    auto parsed = json::Parse(resp.body);  // keep the tree alive
    const auto& obj = parsed->as_object();
    EXPECT_EQ(obj.at("requests")->as_number(), 1.0);
    EXPECT_EQ(obj.at("completion_tokens")->as_number(), 3.0);
    EXPECT_EQ(obj.at("model")->as_string(), "fake-model");

    auto models = http::Call(svc.port(), "GET", "/v1/models");
    EXPECT_EQ(models.status, 200);
    auto mparsed = json::Parse(models.body);
    const auto& mobj = mparsed->as_object();
    EXPECT_EQ(mobj.at("data")->as_array().at(0)->as_object()
                  .at("id")->as_string(),
              "fake-model");
}

TEST(Service, MetricszPrometheusFormat) {
    TestService svc;
    http::PostJson(svc.port(), "/v1/chat/completions", kChatBody);
    auto resp = http::Call(svc.port(), "GET", "/metricsz");
    EXPECT_EQ(resp.status, 200);
    EXPECT_SUBSTR(resp.headers.at("content-type"), "text/plain");
    EXPECT_SUBSTR(resp.body, "# TYPE gabby_requests_total counter");
    EXPECT_SUBSTR(resp.body, "gabby_requests_total 1");
    EXPECT_SUBSTR(resp.body, "gabby_completion_tokens_total 3");
    EXPECT_SUBSTR(resp.body, "gabby_generate_seconds_total");
}

TEST(Service, LegacyCompletions) {
    TestService svc;
    auto [status, body] = http::PostJson(
        svc.port(), "/v1/completions",
        R"({"model": "m1", "prompt": "Once upon", "max_tokens": 8})");
    EXPECT_EQ(status, 200);
    const auto& obj = body->as_object();
    EXPECT_EQ(obj.at("object")->as_string(), "text_completion");
    const auto& choice = obj.at("choices")->as_array().at(0)->as_object();
    EXPECT_EQ(choice.at("text")->as_string(), "hello from fake");
    EXPECT_EQ(choice.at("finish_reason")->as_string(), "stop");
    // the generator saw raw mode
    EXPECT_TRUE(svc.generator().last_request.raw);
    EXPECT_EQ(svc.generator().last_request.raw_prompt, "Once upon");
    // missing prompt -> 400
    auto [s2, _] = http::PostJson(svc.port(), "/v1/completions",
                                  R"({"model": "m"})");
    EXPECT_EQ(s2, 400);
}

TEST(Service, CompletionsEcho) {
    TestService svc;
    auto [status, body] = http::PostJson(
        svc.port(), "/v1/completions",
        R"({"prompt": "Once upon", "echo": true, "max_tokens": 8})");
    EXPECT_EQ(status, 200);
    const auto& choice =
        body->as_object().at("choices")->as_array().at(0)->as_object();
    // echo prepends the prompt to the completion text
    EXPECT_EQ(choice.at("text")->as_string(), "Once uponhello from fake");

    // streaming: the prompt leads the stream as its own chunk
    auto resp = http::Call(
        svc.port(), "POST", "/v1/completions",
        R"({"prompt": "hi>", "echo": true, "stream": true})",
        {{"Content-Type", "application/json"}});
    EXPECT_EQ(resp.status, 200);
    size_t echo_pos = resp.body.find("\"text\":\"hi>\"");
    size_t gen_pos = resp.body.find("\"text\":\"hello \"");
    EXPECT_TRUE(echo_pos != std::string::npos);
    EXPECT_TRUE(gen_pos != std::string::npos && echo_pos < gen_pos);
}

TEST(Service, LegacyCompletionsStreaming) {
    TestService svc;
    auto resp = http::Call(
        svc.port(), "POST", "/v1/completions",
        R"({"prompt": "hi", "stream": true, "max_tokens": 8})",
        {{"Content-Type", "application/json"}});
    EXPECT_EQ(resp.status, 200);
    EXPECT_EQ(resp.headers["content-type"], "text/event-stream");
    EXPECT_SUBSTR(resp.body, "text_completion");
    EXPECT_SUBSTR(resp.body, "\"text\":\"hello \"");
    EXPECT_SUBSTR(resp.body, "data: [DONE]");
}

TEST(Service, ExtractRequestDefaults) {
    auto body = json::Parse(
        R"({"messages": [{"role": "user", "content": "q"}]})");
    GenRequest req = ExtractRequest(*body);
    EXPECT_EQ(req.messages.size(), size_t{1});
    EXPECT_FLOAT_EQ(req.temperature, -1, 1e-9);
    EXPECT_FLOAT_EQ(req.top_p, -1, 1e-9);
    EXPECT_EQ(req.max_tokens, -1);
    EXPECT_FALSE(req.stream);
}

TEST(Service, MaxCompletionTokensAlias) {
    // OpenAI's renamed field is accepted; it wins over legacy max_tokens
    auto body = json::Parse(
        R"({"messages": [{"role": "user", "content": "q"}],
            "max_tokens": 8, "max_completion_tokens": 5})");
    GenRequest req = ExtractRequest(*body);
    EXPECT_EQ(req.max_tokens, 5);
    auto body2 = json::Parse(
        R"({"messages": [{"role": "user", "content": "q"}],
            "max_completion_tokens": 7})");
    EXPECT_EQ(ExtractRequest(*body2).max_tokens, 7);
}


TEST(Service, MultipleChoices) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "n": 3})";
    auto [status, resp] = http::PostJson(svc.port(), "/v1/chat/completions",
                                         body);
    EXPECT_EQ(status, 200);
    const auto& obj = resp->as_object();
    const auto& choices = obj.at("choices")->as_array();
    EXPECT_EQ(choices.size(), size_t{3});
    for (size_t i = 0; i < 3; i++) {
        const auto& c = choices.at(i)->as_object();
        EXPECT_EQ(c.at("index")->as_number(), static_cast<double>(i));
        EXPECT_EQ(c.at("message")->as_object().at("content")->as_string(),
                  "hello from fake");
        EXPECT_EQ(c.at("finish_reason")->as_string(), "stop");
    }
    // usage: prompt charged once, completions summed across choices
    const auto& usage = obj.at("usage")->as_object();
    EXPECT_EQ(usage.at("prompt_tokens")->as_number(), 7.0);
    EXPECT_EQ(usage.at("completion_tokens")->as_number(), 9.0);
}

TEST(Service, MultipleChoicesStreaming) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "n": 2, "stream": true})";
    auto resp = http::Call(svc.port(), "POST", "/v1/chat/completions", body,
                           {{"Content-Type", "application/json"}});
    EXPECT_EQ(resp.status, 200);
    // both choice indices appear in the SSE stream, one [DONE] at the end
    EXPECT_SUBSTR(resp.body, "\"index\":0");
    EXPECT_SUBSTR(resp.body, "\"index\":1");
    EXPECT_SUBSTR(resp.body, "data: [DONE]");
    size_t done_count = 0;
    for (size_t p = resp.body.find("[DONE]"); p != std::string::npos;
         p = resp.body.find("[DONE]", p + 1)) {
        done_count++;
    }
    EXPECT_EQ(done_count, size_t{1});
    // two finish_reason chunks (one per choice)
    size_t fin_count = 0;
    for (size_t p = resp.body.find("\"finish_reason\":\"stop\"");
         p != std::string::npos;
         p = resp.body.find("\"finish_reason\":\"stop\"", p + 1)) {
        fin_count++;
    }
    EXPECT_EQ(fin_count, size_t{2});
}

TEST(Service, StreamUsageChunk) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "stream": true,
                           "stream_options": {"include_usage": true}})";
    auto resp = http::Call(svc.port(), "POST", "/v1/chat/completions", body,
                           {{"Content-Type", "application/json"}});
    EXPECT_EQ(resp.status, 200);
    // one final pre-[DONE] chunk: empty choices + usage totals
    EXPECT_SUBSTR(resp.body, "\"choices\":[]");
    EXPECT_SUBSTR(resp.body, "\"total_tokens\"");
    size_t usage_pos = resp.body.find("\"usage\"");
    size_t done_pos = resp.body.find("data: [DONE]");
    EXPECT_TRUE(usage_pos != std::string::npos && usage_pos < done_pos);
}

TEST(Service, StreamOptionsRequiresStream) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "stream_options": {"include_usage": true}})";
    auto resp = http::Call(svc.port(), "POST", "/v1/chat/completions", body,
                           {{"Content-Type", "application/json"}});
    EXPECT_EQ(resp.status, 400);
}

TEST(Service, BadNRejected) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "n": 99})";
    auto [status, resp] = http::PostJson(svc.port(), "/v1/chat/completions",
                                         body);
    EXPECT_EQ(status, 400);
}

TEST(Service, StreamedLogprobs) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "stream": true, "logprobs": true})";
    auto resp = http::Call(svc.port(), "POST", "/v1/chat/completions", body,
                           {{"Content-Type", "application/json"}});
    EXPECT_EQ(resp.status, 200);
    // each delta chunk carries the logprobs of the tokens it delivered
    EXPECT_SUBSTR(resp.body, "\"logprobs\":{\"content\":[{");
    EXPECT_SUBSTR(resp.body, "\"logprob\":-0.25");
    EXPECT_SUBSTR(resp.body, "\"token\":\"hello \"");
}

TEST(Service, TopLogprobs) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "stream": true, "logprobs": true,
                           "top_logprobs": 2})";
    auto resp = http::Call(svc.port(), "POST", "/v1/chat/completions", body,
                           {{"Content-Type", "application/json"}});
    EXPECT_EQ(resp.status, 200);
    EXPECT_EQ(svc.generator().last_request.top_logprobs, 2);
    // OpenAI full shape: each token entry carries its top-k alternatives
    EXPECT_SUBSTR(resp.body, "\"top_logprobs\":[{");
    EXPECT_SUBSTR(resp.body, "\"token\":\"alt\"");
    EXPECT_SUBSTR(resp.body, "\"logprob\":-1.5");
}

TEST(Service, TopLogprobsRequiresLogprobs) {
    TestService svc;
    // OpenAI: top_logprobs without logprobs=true is a client error
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "top_logprobs": 3})";
    auto [status, resp] = http::PostJson(svc.port(), "/v1/chat/completions",
                                         body);
    EXPECT_EQ(status, 400);
    // and the range is 0-20
    std::string big = R"({"messages": [{"role": "user", "content": "hi"}],
                          "logprobs": true, "top_logprobs": 21})";
    auto [status2, resp2] = http::PostJson(svc.port(),
                                           "/v1/chat/completions", big);
    EXPECT_EQ(status2, 400);
}

TEST(Service, PriorityAndDeadlinePassthrough) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "priority": 3, "deadline_ms": 2500})";
    auto [status, resp] = http::PostJson(svc.port(), "/v1/chat/completions",
                                         body);
    EXPECT_EQ(status, 200);
    EXPECT_EQ(svc.generator().last_request.priority, 3);
    EXPECT_FLOAT_EQ(svc.generator().last_request.deadline_ms, 2500.0, 1e-9);
    // defaults when absent
    std::string plain = R"({"messages": [{"role": "user", "content": "hi"}]})";
    auto [status2, resp2] = http::PostJson(svc.port(),
                                           "/v1/chat/completions", plain);
    EXPECT_EQ(status2, 200);
    EXPECT_EQ(svc.generator().last_request.priority, 0);
    EXPECT_FLOAT_EQ(svc.generator().last_request.deadline_ms, 0.0, 1e-9);
}

TEST(Service, PenaltiesAndLogitBiasPassthrough) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "presence_penalty": -1.5,
                           "frequency_penalty": 0.25,
                           "repetition_penalty": 1.4,
                           "logit_bias": {"17": 4.5, "33": -10}})";
    auto [status, resp] = http::PostJson(svc.port(), "/v1/chat/completions",
                                         body);
    EXPECT_EQ(status, 200);
    const auto& req = svc.generator().last_request;
    EXPECT_FLOAT_EQ(req.presence_penalty, -1.5, 1e-9);
    EXPECT_FLOAT_EQ(req.frequency_penalty, 0.25, 1e-9);
    EXPECT_FLOAT_EQ(req.repetition_penalty, 1.4, 1e-9);
    EXPECT_EQ(req.logit_bias.size(), size_t{2});
    EXPECT_FLOAT_EQ(req.logit_bias.at("17"), 4.5, 1e-9);
    EXPECT_FLOAT_EQ(req.logit_bias.at("33"), -10.0, 1e-9);
    // out of range -> 400
    auto [s2, _] = http::PostJson(
        svc.port(), "/v1/chat/completions",
        R"({"messages": [{"role": "user", "content": "hi"}],
            "repetition_penalty": 0})");
    EXPECT_EQ(s2, 400);
}

TEST(Service, SeedPassthrough) {
    TestService svc;
    std::string body = R"({"messages": [{"role": "user", "content": "hi"}],
                           "seed": 12345})";
    auto [status, resp] = http::PostJson(svc.port(), "/v1/chat/completions",
                                         body);
    EXPECT_EQ(status, 200);
    EXPECT_EQ(svc.generator().last_request.seed, 12345LL);
    std::string neg = R"({"messages": [{"role": "user", "content": "hi"}],
                          "seed": -4})";
    auto [status2, resp2] = http::PostJson(svc.port(),
                                           "/v1/chat/completions", neg);
    EXPECT_EQ(status2, 400);
}

TEST(Service, BadPenaltiesRejected) {
    TestService svc;
    for (const std::string bad :
         {R"("presence_penalty": 2.5)", R"("frequency_penalty": -3)",
          R"("logit_bias": {"5": 200})", R"("logit_bias": {"x": 1})"}) {
        std::string body =
            R"({"messages": [{"role": "user", "content": "hi"}], )" + bad +
            "}";
        auto [status, resp] = http::PostJson(svc.port(),
                                             "/v1/chat/completions", body);
        EXPECT_EQ(status, 400);
    }
}

TEST(Service, BadPriorityAndDeadlineRejected) {
    TestService svc;
    std::string big = R"({"messages": [{"role": "user", "content": "hi"}],
                          "priority": 99})";
    auto [status, resp] = http::PostJson(svc.port(), "/v1/chat/completions",
                                         big);
    EXPECT_EQ(status, 400);
    std::string zero = R"({"messages": [{"role": "user", "content": "hi"}],
                           "deadline_ms": 0})";
    auto [status2, resp2] = http::PostJson(svc.port(),
                                           "/v1/chat/completions", zero);
    EXPECT_EQ(status2, 400);
}

}  // namespace
}  // namespace gabby
