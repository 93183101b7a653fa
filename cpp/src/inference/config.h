// Model-asset loader: the five HuggingFace JSON configs + safetensors.
// Same capability as /root/reference/src/inference/config.h:12-24
// (LoadConfig aggregating config.json, generation_config.json,
// special_tokens_map.json, tokenizer_config.json, tokenizer.json and the
// mmap'd model.safetensors; FindDefaultModelDir scanning the HF hub cache).
#ifndef GABBY_INFERENCE_CONFIG_H_
#define GABBY_INFERENCE_CONFIG_H_

#include <optional>
#include <string>

#include "inference/safetensors.h"
#include "json/json.h"

namespace gabby::inference {

struct InferenceConfig {
    json::ValuePtr config;
    json::ValuePtr generation_config;
    json::ValuePtr special_tokens_map;
    json::ValuePtr tokenizer_config;
    json::ValuePtr tokenizer;
    std::optional<Safetensors> safetensors;
};

// Loads all assets from a model directory. generation_config.json and
// special_tokens_map.json are optional (nil when absent); config.json,
// tokenizer.json, tokenizer_config.json and model.safetensors are required.
InferenceConfig LoadConfig(const std::string& dir);

// First snapshot under the HF hub cache for Llama-3.2-1B-Instruct, or
// nullopt. Mirrors /root/reference/src/inference/config.cc:30-56.
std::optional<std::string> FindDefaultModelDir();

}  // namespace gabby::inference

#endif  // GABBY_INFERENCE_CONFIG_H_
