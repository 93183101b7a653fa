// C++ BPE tokenizer tests against an inline fixture (the reference's
// tokenizer tests assert stub behavior only — /root/reference/src/
// inference/tokenizer_test.cc asserts empty output). Cross-language parity
// with the Python tokenizer is tested from pytest via the tokenize CLI
// (tests/test_cpp_tokenizer.py).
#include "inference/tokenizer.h"

#include <cstdlib>
#include <fstream>

#include "inference/config.h"
#include "json/parser.h"
#include "test/test.h"
#include "utils/logging.h"

namespace gabby::inference {
namespace {

// Tiny byte-level BPE: vocab covers ASCII letters/space mapped bytes plus
// a few merges ("he", "ll", "hell", "llo").
Tokenizer Fixture() {
    // byte-level printable mapping: 'h'->'h', ' ' -> U+0120 ("Ġ")
    std::string json = R"({
      "model": {
        "type": "BPE",
        "vocab": {
          "h": 1, "e": 2, "l": 3, "o": 4, "w": 5, "r": 6, "d": 7,
          "Ġ": 8, "he": 9, "ll": 10, "hell": 11, "hello": 12,
          "Ġw": 13, "1": 14, "2": 15, "3": 16, "4": 17, ",": 18
        },
        "merges": ["h e", "l l", "he ll", "hell o", "Ġ w"]
      },
      "added_tokens": [
        {"id": 100, "content": "<|begin_of_text|>"},
        {"id": 101, "content": "<|start_header_id|>"},
        {"id": 102, "content": "<|end_header_id|>"},
        {"id": 103, "content": "<|eot_id|>"},
        {"id": 104, "content": "<|end_of_text|>"}
      ]
    })";
    return Tokenizer::FromJson(*json::Parse(json));
}

TEST(Tokenizer, EncodeAppliesMergesByRank) {
    auto t = Fixture();
    // "hello" -> h e l l o -> he ll o -> hell o -> hello
    std::vector<int> ids = t.Encode("hello");
    EXPECT_EQ(ids.size(), size_t{1});
    EXPECT_EQ(ids[0], 12);
}

TEST(Tokenizer, SpacePrefixesNextWord) {
    auto t = Fixture();
    // "hello world": pretokenizer yields ["hello", " world"]; " w" merges
    std::vector<int> ids = t.Encode("hello world");
    EXPECT_TRUE(ids.size() >= 3);
    EXPECT_EQ(ids[0], 12);   // "hello"
    EXPECT_EQ(ids[1], 13);   // "Ġw"
}

TEST(Tokenizer, DigitsSplitInThrees) {
    auto t = Fixture();
    // "1234" -> ["123", "4"] per \p{N}{1,3}
    std::vector<int> ids = t.Encode("1234");
    EXPECT_EQ(ids.size(), size_t{4});  // no digit merges in fixture: 1 2 3 | 4
}

TEST(Tokenizer, DecodeRoundTrips) {
    auto t = Fixture();
    std::string text = "hello world";
    EXPECT_EQ(t.Decode(t.Encode(text)), text);
}

TEST(Tokenizer, SpecialTokensLiteral) {
    auto t = Fixture();
    auto ids = t.Encode("<|begin_of_text|>hello<|eot_id|>");
    EXPECT_EQ(ids.size(), size_t{3});
    EXPECT_EQ(ids[0], 100);
    EXPECT_EQ(ids[1], 12);
    EXPECT_EQ(ids[2], 103);
    // with allow_special=false the specials must NOT map to their ids
    auto plain = t.Encode("<|eot_id|>", false);
    for (int id : plain) EXPECT_FALSE(id == 103);
}

TEST(Tokenizer, ChatFormat) {
    auto t = Fixture();
    auto ids = t.ChatPromptIds({{"user", "hello"}});
    EXPECT_EQ(ids.front(), 100);                       // <|begin_of_text|>
    EXPECT_EQ(ids[1], 101);                            // <|start_header_id|>
    // ends with an OPEN assistant header (no trailing eot)
    EXPECT_FALSE(ids.back() == 103);
    // exactly one eot: the user message terminator
    int eots = 0;
    for (int id : ids) eots += id == 103;
    EXPECT_EQ(eots, 1);
    auto stops = t.StopIds();
    EXPECT_EQ(stops.size(), size_t{2});  // eot_id + end_of_text
}

// Real-asset gate (the reference's fixture-dependent tokenizer tests run
// against the CI-downloaded checkpoint via GlobalConfig —
// /root/reference/src/test/env.h:8, src/test/test_main.cc:9-19). This
// test auto-discovers the model — GABBY_MODEL_DIR, then the HF hub
// cache — and degrades to a no-op when absent, so it lights up wherever
// the real 128k-vocab tokenizer.json exists without extra wiring.
// Exact-id parity vs HF `tokenizers` lives in pytest
// (tests/test_real_model.py); this covers the native loader + roundtrip.
TEST(Tokenizer, RealVocabRoundTrip) {
    std::string dir;
    if (const char* env = std::getenv("GABBY_MODEL_DIR")) dir = env;
    if (dir.empty()) {
        if (auto found = FindDefaultModelDir()) dir = *found;
    }
    std::string path = dir + "/tokenizer.json";
    if (dir.empty() || !std::ifstream(path).good()) {
        LOG(INFO) << "Tokenizer.RealVocabRoundTrip: no real model assets "
                     "(set GABBY_MODEL_DIR) — skipping";
        return;
    }
    auto t = Tokenizer::FromJson(*json::ParseFile(path));
    const std::string samples[] = {
        "hello world",
        "Hello, World! 123",
        "naïve café — résumé",
        "日本語のテキストと中文文本",
        "Привет мир Γειά σου κόσμε",
        "🙂🚀 emoji soup 🎉",
        "x = f(x_1, y[2]) * 3.14159e-10",
    };
    for (const auto& s : samples) {
        auto ids = t.Encode(s, /*allow_special=*/false);
        EXPECT_TRUE(!ids.empty());
        EXPECT_EQ(t.Decode(ids), s);
    }
    // Llama-3 specials must resolve to their published ids
    auto bos = t.Encode("<|begin_of_text|>");
    EXPECT_EQ(bos.size(), size_t{1});
    EXPECT_EQ(bos[0], 128000);
    auto eot = t.Encode("<|eot_id|>");
    EXPECT_EQ(eot.size(), size_t{1});
    EXPECT_EQ(eot[0], 128009);
}

}  // namespace
}  // namespace gabby::inference
