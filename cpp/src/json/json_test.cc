// JSON tree + parser tests; taxonomy follows
// /root/reference/src/json/parser_test.cc:9-86 (literals, equality, a
// realistic chat payload) plus escape-decoding and bound-enforcement cases.
#include <cstring>

#include "json/json.h"
#include "json/parser.h"
#include "test/test.h"

namespace gabby::json {

TEST(Json, ScalarsRoundTrip) {
    EXPECT_TRUE(*Parse("42") == *Value::number(42));
    EXPECT_TRUE(*Parse("-3.5e2") == *Value::number(-350));
    EXPECT_TRUE(*Parse("true") == *Value::boolean(true));
    EXPECT_TRUE(*Parse("false") == *Value::boolean(false));
    EXPECT_TRUE(*Parse("null") == *Value::nil());
    EXPECT_TRUE(*Parse("\"hi\"") == *Value::string("hi"));
}

TEST(Json, Containers) {
    auto v = Parse(R"([1, "two", [3], {"four": 4}, null])");
    const auto& arr = v->as_array();
    EXPECT_EQ(arr.size(), size_t{5});
    EXPECT_EQ(arr[0]->as_number(), 2.0 - 1.0);
    EXPECT_EQ(arr[1]->as_string(), "two");
    EXPECT_EQ(arr[2]->as_array()[0]->as_number(), 3.0);
    EXPECT_EQ(arr[3]->as_object().at("four")->as_number(), 4.0);
    EXPECT_TRUE(arr[4]->is(Type::NIL));
}

TEST(Json, DeepEquality) {
    auto a = Parse(R"({"x": [1, {"y": true}], "z": "s"})");
    auto b = Parse(R"({"z": "s", "x": [1, {"y": true}]})");
    auto c = Parse(R"({"z": "s", "x": [1, {"y": false}]})");
    EXPECT_TRUE(*a == *b);
    EXPECT_FALSE(*a == *c);
}

TEST(Json, ChatCompletionPayload) {
    auto v = Parse(R"({
        "model": "llama-3.2-1b",
        "messages": [
            {"role": "system", "content": "you are helpful"},
            {"role": "user", "content": "hi there"}
        ],
        "temperature": 0.7,
        "stream": false
    })");
    const auto& obj = v->as_object();
    EXPECT_EQ(obj.at("model")->as_string(), "llama-3.2-1b");
    EXPECT_EQ(obj.at("messages")->as_array().size(), size_t{2});
    EXPECT_FLOAT_EQ(obj.at("temperature")->as_number(), 0.7, 1e-9);
    EXPECT_FALSE(obj.at("stream")->as_boolean());
}

TEST(Json, EscapesDecode) {
    // the reference strips backslashes without decoding; we decode fully
    auto v = Parse(R"("line1\nline2\ttab \"q\" \\ A é 😀")");
    EXPECT_EQ(v->as_string(),
              std::string("line1\nline2\ttab \"q\" \\ A \xc3\xa9 "
                          "\xf0\x9f\x98\x80"));
}

TEST(Json, EscapesEncode) {
    auto s = to_string(*Value::string("a\"b\\c\nd\x01"));
    EXPECT_EQ(s, std::string("\"a\\\"b\\\\c\\nd\\u0001\""));
}

TEST(Json, PrintRoundTrip) {
    auto v = Parse(R"({"a": [1, 2.5], "b": {"c": null}, "d": "x\ny"})");
    auto v2 = Parse(to_string(*v));
    EXPECT_TRUE(*v == *v2);
}

TEST(Json, Errors) {
    EXPECT_THROWS(Parse("{"), ParsingError);
    EXPECT_THROWS(Parse("[1,]"), ParsingError);
    EXPECT_THROWS(Parse("{\"a\" 1}"), ParsingError);
    EXPECT_THROWS(Parse("nul"), ParsingError);
    EXPECT_THROWS(Parse("1 2"), ParsingError);     // trailing data
    EXPECT_THROWS(Parse(""), ParsingError);
    EXPECT_THROWS(Parse("\"\\u12"), ParsingError);
    EXPECT_THROWS(Value::number(1)->as_string(), TypeError);
    EXPECT_THROWS(Parse("{}")->as_object().at("k"), std::out_of_range);
}

TEST(Json, DepthCap) {
    std::string deep(kMaxDepth + 2, '[');
    EXPECT_THROWS(Parse(deep), ParsingError);
}

TEST(Json, SizeBoundedStreamParse) {
    // parse exactly `size` bytes off a FILE*, leaving the rest unread —
    // the mechanism that parses request bodies straight off the socket
    std::string data = "{\"n\": 1}EXTRA";
    FILE* f = fmemopen(data.data(), data.size(), "r");
    auto v = Parse(f, 8);
    EXPECT_EQ(v->as_object().at("n")->as_number(), 1.0);
    char rest[8] = {0};
    size_t n = fread(rest, 1, sizeof(rest), f);
    EXPECT_EQ(std::string(rest, n), "EXTRA");
    fclose(f);
}

TEST(Json, TrailingWhitespaceOk) {
    EXPECT_TRUE(*Parse("  {\"a\": 1}  \n") ==
                *Value::object({{"a", Value::number(1)}}));
}

}  // namespace gabby::json
