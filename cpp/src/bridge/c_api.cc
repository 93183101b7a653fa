#include "bridge/c_api.h"

#include <memory>
#include <sstream>
#include <string>

#include "json/parser.h"
#include "service/service.h"
#include "utils/logging.h"

namespace {

thread_local std::string g_last_error;

using gabby::GenChunk;
using gabby::GenRequest;
using gabby::json::Value;
using gabby::json::ValuePtr;

// Adapts the C callback to the C++ Generator seam.
class CallbackGenerator : public gabby::Generator {
   public:
    CallbackGenerator(gabby_generate_fn generate, void* user_data,
                      std::string model_id)
        : generate_(generate),
          user_data_(user_data),
          model_id_(std::move(model_id)) {}

    std::string model_id() const override { return model_id_; }

    void set_stats(gabby_stats_fn stats, void* stats_data) {
        stats_ = stats;
        stats_data_ = stats_data;
    }

    std::string stats_json() const override {
        if (!stats_) return "";
        char buf[8192];
        size_t n = stats_(stats_data_, buf, sizeof(buf));
        return std::string(buf, n > sizeof(buf) ? 0 : n);
    }

    void Generate(const GenRequest& req,
                  const std::function<void(const GenChunk&)>& emit) override {
        std::string request_json = Serialize(req);

        struct EmitCtx {
            const std::function<void(const GenChunk&)>* emit;
            std::string error;
            bool aborted = false;
            int error_status = 500;
        } ctx{&emit, {}, false, 500};

        auto emit_tramp = [](void* vctx, const char* chunk_json,
                             size_t len) -> int {
            auto* c = static_cast<EmitCtx*>(vctx);
            try {
                ValuePtr v = gabby::json::Parse(std::string(chunk_json, len));
                const auto& obj = v->as_object();
                if (auto it = obj.find("error"); it != obj.end()) {
                    c->error = it->second->as_string();
                    // engine-declared client errors (e.g. context length
                    // exceeded) carry {"status": 400}
                    if (auto st = obj.find("status"); st != obj.end()) {
                        c->error_status =
                            static_cast<int>(st->second->as_number());
                    }
                    return 0;
                }
                GenChunk chunk;
                if (auto it = obj.find("delta"); it != obj.end()) {
                    chunk.delta = it->second->as_string();
                }
                if (auto it = obj.find("done"); it != obj.end()) {
                    chunk.done = it->second->as_boolean();
                }
                // per-token logprobs ride on ANY chunk: streamed deltas
                // carry the tokens they deliver; the final chunk of a
                // non-streaming request carries the full arrays
                if (auto it = obj.find("token_logprobs");
                    it != obj.end() && !it->second->is(gabby::json::Type::NIL)) {
                    for (const auto& v : it->second->as_array()) {
                        chunk.token_logprobs.push_back(v->as_number());
                    }
                }
                if (auto it = obj.find("tokens");
                    it != obj.end() && !it->second->is(gabby::json::Type::NIL)) {
                    for (const auto& v : it->second->as_array()) {
                        chunk.tokens.push_back(v->as_string());
                    }
                }
                // top-k alternatives per token (requests that asked for
                // top_logprobs): [[{token, logprob}, ...], ...] parallel
                // to `tokens`
                if (auto it = obj.find("top_logprobs");
                    it != obj.end() && !it->second->is(gabby::json::Type::NIL)) {
                    for (const auto& row : it->second->as_array()) {
                        std::vector<std::pair<std::string, double>> alts;
                        for (const auto& e : row->as_array()) {
                            const auto& eo = e->as_object();
                            alts.emplace_back(
                                eo.at("token")->as_string(),
                                eo.at("logprob")->as_number());
                        }
                        chunk.top_logprobs.push_back(std::move(alts));
                    }
                }
                if (chunk.done) {
                    if (auto it = obj.find("finish_reason"); it != obj.end()) {
                        chunk.finish_reason = it->second->as_string();
                    }
                    if (auto it = obj.find("prompt_tokens"); it != obj.end()) {
                        chunk.prompt_tokens =
                            static_cast<int>(it->second->as_number());
                    }
                    if (auto it = obj.find("completion_tokens");
                        it != obj.end()) {
                        chunk.completion_tokens =
                            static_cast<int>(it->second->as_number());
                    }
                }
                (*c->emit)(chunk);
                return 0;
            } catch (const std::exception& e) {
                c->error = e.what();
                c->aborted = true;
                return 1;  // stop the engine: we can't deliver its output
            }
        };

        int rc = generate_(user_data_, request_json.data(),
                           request_json.size(), &ctx, emit_tramp);
        if (!ctx.error.empty()) {
            if (ctx.error_status == 400) {
                throw gabby::http::BadRequestException(ctx.error);
            }
            if (ctx.error_status == 408) {
                // deadline expired while queued: the reference's timeout
                // discipline (408) applied to the scheduler's deadline
                throw gabby::http::HttpException(
                    gabby::http::StatusCode::REQUEST_TIMEOUT, ctx.error);
            }
            throw gabby::http::InternalError(ctx.error);
        }
        if (rc != 0) {
            throw gabby::http::InternalError("engine error (rc=" +
                                             std::to_string(rc) + ")");
        }
    }

   private:
    static std::string Serialize(const GenRequest& req) {
        std::vector<ValuePtr> msgs;
        for (const auto& m : req.messages) {
            msgs.push_back(Value::object({
                {"role", Value::string(m.role)},
                {"content", Value::string(m.content)},
            }));
        }
        std::vector<ValuePtr> stop;
        for (const auto& s : req.stop) stop.push_back(Value::string(s));
        std::map<std::string, ValuePtr> bias;
        for (const auto& [tok, b] : req.logit_bias) {
            bias[tok] = Value::number(b);
        }
        auto v = Value::object({
            {"messages", Value::array(std::move(msgs))},
            {"raw", Value::boolean(req.raw)},
            {"prompt", Value::string(req.raw_prompt)},
            {"model", Value::string(req.model)},
            {"temperature", Value::number(req.temperature)},
            {"top_p", Value::number(req.top_p)},
            {"top_k", Value::number(req.top_k)},
            {"max_tokens", Value::number(req.max_tokens)},
            {"stream", Value::boolean(req.stream)},
            {"logprobs", Value::boolean(req.logprobs)},
            {"top_logprobs", Value::number(req.top_logprobs)},
            {"priority", Value::number(req.priority)},
            {"deadline_ms", Value::number(req.deadline_ms)},
            {"presence_penalty", Value::number(req.presence_penalty)},
            {"frequency_penalty", Value::number(req.frequency_penalty)},
            {"repetition_penalty", Value::number(req.repetition_penalty)},
            {"seed", Value::number(static_cast<double>(req.seed))},
            {"logit_bias", Value::object(std::move(bias))},
            {"stop", Value::array(std::move(stop))},
        });
        return gabby::json::to_string(*v);
    }

    gabby_generate_fn generate_;
    void* user_data_;
    std::string model_id_;
    gabby_stats_fn stats_ = nullptr;
    void* stats_data_ = nullptr;
};

}  // namespace

struct GabbyServer {
    std::unique_ptr<gabby::InferenceService> service;
    std::shared_ptr<CallbackGenerator> generator;
};

extern "C" {

GabbyServer* gabby_server_create(const GabbyServerConfig* config,
                                 gabby_generate_fn generate, void* user_data,
                                 const char* model_id) {
    try {
        gabby::ServiceConfig sc;
        sc.server.port = config->port;
        if (config->read_timeout_millis > 0) {
            sc.server.read_timeout_millis = config->read_timeout_millis;
        }
        if (config->write_timeout_millis > 0) {
            sc.server.write_timeout_millis = config->write_timeout_millis;
        }
        if (config->workers > 0) sc.server.workers = config->workers;
        if (config->max_queue > 0) sc.server.max_queue = config->max_queue;
        gabby::SetGlobalLogLevel(
            static_cast<gabby::LogLevel>(config->log_level));

        auto gen = std::make_shared<CallbackGenerator>(
            generate, user_data, model_id ? model_id : "gabby-tpu");
        auto* server = new GabbyServer;
        server->generator = gen;
        server->service =
            std::make_unique<gabby::InferenceService>(sc, std::move(gen));
        return server;
    } catch (const std::exception& e) {
        g_last_error = e.what();
        return nullptr;
    }
}

void gabby_server_set_stats(GabbyServer* server, gabby_stats_fn stats,
                            void* user_data) {
    server->generator->set_stats(stats, user_data);
}

void gabby_server_set_ready(GabbyServer* server, int ready) {
    server->service->SetReady(ready != 0);
}

int gabby_server_start(GabbyServer* server) {
    try {
        server->service->Start();
        return server->service->port();
    } catch (const std::exception& e) {
        g_last_error = e.what();
        return -1;
    }
}

int gabby_server_port(const GabbyServer* server) {
    return server->service->port();
}

void gabby_server_stop(GabbyServer* server) { server->service->Stop(); }

void gabby_server_wait(GabbyServer* server) { server->service->Wait(); }

void gabby_server_destroy(GabbyServer* server) { delete server; }

const char* gabby_last_error(void) { return g_last_error.c_str(); }

}  // extern "C"
