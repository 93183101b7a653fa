// Byte-level BPE tokenizer driven by a HuggingFace tokenizer.json.
//
// Real implementation of the component the reference stubs
// (/root/reference/src/inference/tokenizer.cc:6-8 returns {}): byte-level
// vocab + ranked merges, added special tokens, Llama-3 chat framing, and
// byte-level decode. Pre-tokenization implements the Llama-3 tiktoken-style
// split pattern with a hand-rolled codepoint scanner (std::regex has no
// Unicode property classes): exact for ASCII; non-ASCII codepoints are
// classified letter/space by compact range tables covering the common
// planes (Latin-1 supplement through CJK), which matches the HF tokenizer
// on typical text. The Python tokenizer (gabby_tpu/tokenizer.py) is the
// full-fidelity implementation used by the serving engine; this native one
// serves the C++-only binary and keeps the native surface complete.
#ifndef GABBY_INFERENCE_TOKENIZER_H_
#define GABBY_INFERENCE_TOKENIZER_H_

#include <map>
#include <string>
#include <unordered_map>
#include <vector>

#include "json/json.h"

namespace gabby::inference {

struct Message;  // fwd (service uses its own; tokenizer is standalone)

class Tokenizer {
   public:
    // Builds from a parsed tokenizer.json DOM (model.vocab, model.merges,
    // added_tokens).
    static Tokenizer FromJson(const json::Value& tokenizer_json);

    // Text -> ids. When allow_special, added tokens appearing literally in
    // the text map to their ids; otherwise they are BPE'd as plain text.
    std::vector<int> Encode(const std::string& text,
                            bool allow_special = true) const;

    // Ids -> text (byte-level decode; invalid ids are dropped).
    std::string Decode(const std::vector<int>& ids) const;

    int TokenId(const std::string& token) const;  // throws if unknown
    size_t vocab_size() const;

    // Llama-3-Instruct chat framing: <|begin_of_text|> + per-message
    // headers, ending with an open assistant header.
    std::vector<int> ChatPromptIds(
        const std::vector<std::pair<std::string, std::string>>&
            role_content) const;
    std::vector<int> StopIds() const;

   private:
    Tokenizer() = default;

    std::vector<int> Bpe(const std::string& mapped_word) const;
    std::vector<std::string> Pretokenize(const std::string& text) const;

    std::unordered_map<std::string, int> vocab_;
    std::unordered_map<std::string, int> added_;
    std::map<std::pair<std::string, std::string>, int> ranks_;
    std::unordered_map<int, std::string> id_to_token_;
    std::unordered_map<int, std::string> id_to_added_;
    std::vector<std::string> added_by_length_;  // longest first
};

}  // namespace gabby::inference

#endif  // GABBY_INFERENCE_TOKENIZER_H_
