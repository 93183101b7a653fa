// Standalone serving binary.
//
// Same capability as /root/reference/src/main.cc:31-124: flag parsing with
// the same flags (--port, --read_timeout_millis, --write_timeout_millis,
// --workers, --model-dir, --info/--warn/--debug), SIGINT/SIGTERM graceful
// shutdown, Start/Wait lifecycle. Without a Python engine attached, this
// binary serves the protocol with an echo generator (the reference's own
// generator is a canned-string stub, /root/reference/src/inference/
// generator.cc:33-38); the production path embeds this front-end under the
// JAX engine via bridge/c_api.h (python -m gabby_tpu.server).
#include <unistd.h>

#include <csignal>
#include <iostream>
#include <thread>

#include "inference/config.h"
#include "service/service.h"
#include "utils/flags.h"
#include "utils/logging.h"

namespace gabby {
namespace {

InferenceService* g_service = nullptr;

void HandleSignal(int) {
    if (g_service) g_service->Stop();
}

// Placeholder engine for native-only runs: echoes the last user message.
class EchoGenerator : public Generator {
   public:
    void Generate(const GenRequest& req,
                  const std::function<void(const GenChunk&)>& emit) override {
        const std::string& prompt = req.messages.back().content;
        std::string text = "hey this is gabby-tpu; you said: " + prompt;
        if (req.stream) {
            // stream word-by-word so SSE paths are exercised natively
            size_t start = 0;
            while (start < text.size()) {
                size_t end = text.find(' ', start);
                if (end == std::string::npos) end = text.size();
                GenChunk c;
                c.delta = text.substr(start, end - start + 1);
                emit(c);
                start = end + 1;
            }
        } else {
            GenChunk c;
            c.delta = text;
            emit(c);
        }
        GenChunk done;
        done.done = true;
        done.finish_reason = "stop";
        done.prompt_tokens = static_cast<int>(prompt.size() / 4);
        done.completion_tokens = static_cast<int>(text.size() / 4);
        emit(done);
    }
    std::string model_id() const override { return "gabby-echo"; }
};

int Run(int argc, char** argv) {
    ServiceConfig config;
    config.server.workers =
        std::max(1u, std::thread::hardware_concurrency() - 1);
    std::string model_dir;
    bool info = false, warn = false, debug = false;

    Flags flags;
    flags.Int("port", &config.server.port, "listen port (default 8080)")
        .Int("read_timeout_millis", &config.server.read_timeout_millis,
             "socket read timeout")
        .Int("write_timeout_millis", &config.server.write_timeout_millis,
             "socket write timeout")
        .Int("workers", &config.server.workers, "worker threads")
        .Str("model-dir", &model_dir, "model asset directory")
        .Bool("info", &info, "log level INFO")
        .Bool("warn", &warn, "log level WARN")
        .Bool("debug", &debug, "log level DEBUG");
    try {
        flags.Parse(argc, argv);
    } catch (const FlagError& e) {
        std::cerr << e.what() << "\n" << flags.Usage(argv[0]);
        return 2;
    }
    if (debug) SetGlobalLogLevel(LogLevel::DEBUG);
    else if (info) SetGlobalLogLevel(LogLevel::INFO);
    else if (warn) SetGlobalLogLevel(LogLevel::WARN);

    if (model_dir.empty()) {
        if (auto found = inference::FindDefaultModelDir()) model_dir = *found;
    }
    if (!model_dir.empty()) {
        // validate the assets end-to-end (configs parse, tensors resolve)
        auto cfg = inference::LoadConfig(model_dir);
        LOG(INFO) << "model assets OK: " << model_dir << " ("
                  << cfg.safetensors->names().size() << " tensors)";
    }

    InferenceService service(config, std::make_shared<EchoGenerator>());
    g_service = &service;
    std::signal(SIGINT, HandleSignal);
    std::signal(SIGTERM, HandleSignal);
    service.Start();
    std::cout << "listening on port " << service.port() << std::endl;
    service.Wait();
    return 0;
}

}  // namespace
}  // namespace gabby

int main(int argc, char** argv) {
    try {
        return gabby::Run(argc, argv);
    } catch (const std::exception& e) {
        std::cerr << "fatal: " << e.what() << "\n";
        return 1;
    }
}
