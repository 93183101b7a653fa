// InferenceService: OpenAI-compatible serving API over the HTTP runtime.
//
// Same capability as /root/reference/src/service.h:19-40 (routes /healthz +
// /v1/chat/completions, request extraction, OpenAI response envelope, the
// Generator seam for dependency injection in tests) with the reference's
// TODOs implemented: SSE streaming (`"stream": true`), /statusz metrics,
// /v1/models, real token usage accounting (the reference hard-codes a stub
// envelope, /root/reference/src/service.cc:79-101), and full message-list
// extraction instead of exactly-one-system+one-user.
#ifndef GABBY_SERVICE_SERVICE_H_
#define GABBY_SERVICE_SERVICE_H_

#include <atomic>
#include <functional>
#include <map>
#include <memory>
#include <string>
#include <vector>

#include "http/server.h"
#include "json/json.h"

namespace gabby {

struct Message {
    std::string role;
    std::string content;
};

// Extracted, validated chat-completion request (protocol-agnostic).
struct GenRequest {
    std::vector<Message> messages;  // chat mode (raw_prompt empty)
    std::string raw_prompt;         // legacy /v1/completions mode
    bool raw = false;               // true: no chat template
    std::string model;
    double temperature = -1;   // <0 = engine default
    double top_p = -1;
    int top_k = -1;
    int max_tokens = -1;
    bool stream = false;
    // OpenAI stream_options.include_usage: when streaming, send one
    // final chunk (before [DONE]) with empty choices and usage totals
    bool include_usage = false;
    // OpenAI completions `echo`: prepend the prompt text to the output
    // (first stream chunk / start of `text`); legacy endpoint only
    bool echo = false;
    bool logprobs = false;          // return per-token logprobs (OpenAI)
    int top_logprobs = 0;           // 1-20: also return the top-k
                                    // alternatives per token (OpenAI;
                                    // requires logprobs=true)
    std::vector<std::string> stop;  // stop sequences (OpenAI "stop")
    // OpenAI `n`: number of choices. Each choice is its OWN generator
    // call run concurrently — the engine's continuous batching lands them
    // in separate slots whose decode shares one weight stream, so n
    // choices cost ~one choice of wall-clock when slots are free. (The
    // alternative — fanning one slot out on-device — would need per-choice
    // KV forks and a variable-width sampler; rejected as a poor trade
    // against slots the engine already has.)
    int n = 1;
    // scheduling extensions (non-OpenAI, documented in README): higher
    // priority admits first; deadline_ms > 0 is a relative completion
    // budget (queue expiry -> 408, mid-generation expiry -> finish
    // reason "deadline" with the text generated so far)
    int priority = 0;
    double deadline_ms = 0;
    // OpenAI sampling penalties: [-2, 2] each (0 = off) and logit_bias
    // {token-id -> bias in [-100, 100]}, applied on-device by the engine
    double presence_penalty = 0;
    double frequency_penalty = 0;
    // extension (HF/vLLM-style): multiplicative penalty on tokens seen
    // in the prompt or sampled so far; 1.0 = off
    double repetition_penalty = 1.0;
    std::map<std::string, double> logit_bias;
    // OpenAI `seed`: best-effort reproducible sampling; -1 = unset
    long long seed = -1;
};

// One unit of generator output. Non-streaming engines emit a single chunk
// with done=true and the full text in `delta`.
struct GenChunk {
    std::string delta;
    bool done = false;
    std::string finish_reason = "stop";  // valid when done
    int prompt_tokens = 0;               // valid when done
    int completion_tokens = 0;           // valid when done
    // valid when done and the request asked for logprobs: one entry per
    // generated token (parallel arrays)
    std::vector<std::string> tokens;
    std::vector<double> token_logprobs;
    // per generated token, its distribution's top-k alternatives
    // (request asked for top_logprobs; parallel to `tokens`)
    std::vector<std::vector<std::pair<std::string, double>>> top_logprobs;
};

// THE engine seam (reference: Generator at
// /root/reference/src/inference/generator.h:30-34). `emit` may be called
// multiple times; the final call must have done=true.
class Generator {
   public:
    virtual ~Generator() = default;
    virtual void Generate(const GenRequest& req,
                          const std::function<void(const GenChunk&)>& emit) = 0;
    virtual std::string model_id() const { return "gabby-tpu"; }
    // Optional engine-side metrics: a JSON object string merged into
    // /statusz under "engine", or "" for none.
    virtual std::string stats_json() const { return ""; }
};

struct ServiceMetrics {
    std::atomic<uint64_t> requests{0};
    std::atomic<uint64_t> failures{0};
    std::atomic<uint64_t> prompt_tokens{0};
    std::atomic<uint64_t> completion_tokens{0};
    std::atomic<uint64_t> gen_micros{0};   // total time inside Generate
};

struct ServiceConfig {
    http::ServerConfig server;
};

class InferenceService {
   public:
    InferenceService(const ServiceConfig& config,
                     std::shared_ptr<Generator> generator);

    void Start();
    void Wait();
    void Stop();
    int port() const { return server_.port(); }
    const ServiceMetrics& metrics() const { return metrics_; }

    // Readiness gate for /readyz. The service starts READY (a plain C++
    // server with an injected generator can serve immediately); an embedder
    // that must warm its engine first (compile the serving programs —
    // gabby_tpu.server) calls SetReady(false) before Start() and flips it
    // true after the rehearsal. /healthz stays pure liveness either way.
    void SetReady(bool ready) {
        ready_.store(ready, std::memory_order_relaxed);
    }
    bool ready() const { return ready_.load(std::memory_order_relaxed); }

    // Exposed for tests.
    void ChatCompletions(http::Request& req, http::ResponseWriter& resp);
    void Completions(http::Request& req, http::ResponseWriter& resp);
    void HealthCheck(http::Request& req, http::ResponseWriter& resp);
    void Readyz(http::Request& req, http::ResponseWriter& resp);
    void Statusz(http::Request& req, http::ResponseWriter& resp);
    void Metricsz(http::Request& req, http::ResponseWriter& resp);
    void Models(http::Request& req, http::ResponseWriter& resp);

   private:
    // Shared n-way request runner: fans the request out over `n` generator
    // calls (concurrent threads for n > 1 — each choice rides its own
    // engine slot), streaming indexed SSE chunks or building the n-choice
    // response envelope.
    void RunNWay(const GenRequest& gen_req, http::ResponseWriter& resp,
                 const std::string& id, const std::string& model,
                 const char* object,
                 json::ValuePtr (*make_choice)(int, const std::string&,
                                               const GenChunk&),
                 json::ValuePtr (*make_chunk)(const std::string&,
                                              const std::string&, int,
                                              const GenChunk&, bool,
                                              const std::string&),
                 const std::function<void(const GenChunk&)>& record);

    http::HttpServer server_;
    std::shared_ptr<Generator> generator_;
    ServiceMetrics metrics_;
    std::atomic<uint64_t> next_id_{1};
    std::atomic<bool> ready_{true};
};

// Parses + validates a chat-completion body (already-parsed JSON).
// Throws BadRequestException on protocol violations.
GenRequest ExtractRequest(const json::Value& body);

// Parses a legacy text-completion body ("prompt" instead of "messages").
GenRequest ExtractCompletionRequest(const json::Value& body);

}  // namespace gabby

#endif  // GABBY_SERVICE_SERVICE_H_
