#include "inference/config.h"

#include <cstdlib>
#include <filesystem>

#include "json/parser.h"
#include "utils/logging.h"

namespace gabby::inference {

namespace fs = std::filesystem;

namespace {
json::ValuePtr ParseOptional(const fs::path& path) {
    if (!fs::exists(path)) return json::Value::nil();
    return json::ParseFile(path.string());
}
}  // namespace

InferenceConfig LoadConfig(const std::string& dir) {
    fs::path d(dir);
    InferenceConfig cfg;
    cfg.config = json::ParseFile((d / "config.json").string());
    cfg.generation_config = ParseOptional(d / "generation_config.json");
    cfg.special_tokens_map = ParseOptional(d / "special_tokens_map.json");
    cfg.tokenizer_config = json::ParseFile((d / "tokenizer_config.json").string());
    cfg.tokenizer = json::ParseFile((d / "tokenizer.json").string());
    cfg.safetensors = Safetensors::LoadFile((d / "model.safetensors").string());
    return cfg;
}

std::optional<std::string> FindDefaultModelDir() {
    const char* home = std::getenv("HOME");
    if (!home) return std::nullopt;
    fs::path snapshots =
        fs::path(home) / ".cache/huggingface/hub" /
        "models--meta-llama--Llama-3.2-1B-Instruct" / "snapshots";
    std::error_code ec;
    if (!fs::is_directory(snapshots, ec)) return std::nullopt;
    for (const auto& entry : fs::directory_iterator(snapshots, ec)) {
        if (entry.is_directory()) return entry.path().string();
    }
    return std::nullopt;
}

}  // namespace gabby::inference
