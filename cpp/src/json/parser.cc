#include "json/parser.h"

#include <cctype>
#include <cerrno>
#include <cstring>

#include "utils/logging.h"
#include "utils/pointers.h"

namespace gabby::json {
namespace {

// Reads at most `size` bytes from the FILE*, one char of lookahead.
class Scanner {
   public:
    Scanner(FILE* f, size_t size) : f_(f), remaining_(size) {}

    // Next byte or -1 at the size bound / EOF. EAGAIN (socket read timeout)
    // surfaces as a ParsingError so the server can map it to 408 upstream.
    int Get() {
        if (remaining_ == 0) return -1;
        int c = std::fgetc(f_);
        if (c == EOF) {
            if (ferror(f_) && errno == EAGAIN) {
                throw ParsingError("timed out reading body");
            }
            return -1;
        }
        remaining_--;
        return c;
    }

    int Peek() {
        if (look_ < 0) look_ = Get();
        return look_;
    }

    int Next() {
        if (look_ >= 0) {
            int c = look_;
            look_ = -1;
            return c;
        }
        return Get();
    }

    size_t remaining() const { return remaining_ + (look_ >= 0 ? 1 : 0); }

   private:
    FILE* f_;
    size_t remaining_;
    int look_ = -1;
};

void AppendUtf8(std::string& out, unsigned int cp) {
    if (cp < 0x80) {
        out += static_cast<char>(cp);
    } else if (cp < 0x800) {
        out += static_cast<char>(0xC0 | (cp >> 6));
        out += static_cast<char>(0x80 | (cp & 0x3F));
    } else if (cp < 0x10000) {
        out += static_cast<char>(0xE0 | (cp >> 12));
        out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
        out += static_cast<char>(0x80 | (cp & 0x3F));
    } else {
        out += static_cast<char>(0xF0 | (cp >> 18));
        out += static_cast<char>(0x80 | ((cp >> 12) & 0x3F));
        out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
        out += static_cast<char>(0x80 | (cp & 0x3F));
    }
}

class Parser {
   public:
    explicit Parser(Scanner& sc) : sc_(sc) {}

    ValuePtr ParseValue(int depth = 0) {
        if (depth > kMaxDepth) throw ParsingError("nesting too deep");
        SkipWs();
        int c = sc_.Peek();
        switch (c) {
            case -1: throw ParsingError("unexpected end of input");
            case '{': return ParseObject(depth);
            case '[': return ParseArray(depth);
            case '"': return Value::string(ParseString());
            case 't': Expect("true"); return Value::boolean(true);
            case 'f': Expect("false"); return Value::boolean(false);
            case 'n': Expect("null"); return Value::nil();
            default: return ParseNumber();
        }
    }

    void SkipWs() {
        int c;
        while ((c = sc_.Peek()) == ' ' || c == '\t' || c == '\n' || c == '\r') {
            sc_.Next();
        }
    }

   private:
    void Expect(const char* word) {
        for (const char* p = word; *p; p++) {
            int c = sc_.Next();
            if (c != *p) {
                throw ParsingError(std::string("expected '") + word + "'");
            }
        }
    }

    char Consume(char want) {
        int c = sc_.Next();
        if (c != want) {
            throw ParsingError(std::string("expected '") + want + "', got " +
                               (c < 0 ? "EOF" : std::string(1, char(c))));
        }
        return want;
    }

    std::string ParseString() {
        Consume('"');
        std::string out;
        for (;;) {
            int c = sc_.Next();
            if (c < 0) throw ParsingError("unterminated string");
            if (c == '"') return out;
            if (c != '\\') {
                out += static_cast<char>(c);
                continue;
            }
            int e = sc_.Next();
            switch (e) {
                case '"': out += '"'; break;
                case '\\': out += '\\'; break;
                case '/': out += '/'; break;
                case 'n': out += '\n'; break;
                case 't': out += '\t'; break;
                case 'r': out += '\r'; break;
                case 'b': out += '\b'; break;
                case 'f': out += '\f'; break;
                case 'u': {
                    unsigned int cp = ParseHex4();
                    // decode surrogate pair if present
                    if (cp >= 0xD800 && cp <= 0xDBFF) {
                        if (sc_.Next() == '\\' && sc_.Next() == 'u') {
                            unsigned int lo = ParseHex4();
                            if (lo >= 0xDC00 && lo <= 0xDFFF) {
                                cp = 0x10000 + ((cp - 0xD800) << 10) +
                                     (lo - 0xDC00);
                            } else {
                                throw ParsingError("invalid low surrogate");
                            }
                        } else {
                            throw ParsingError("lone high surrogate");
                        }
                    }
                    AppendUtf8(out, cp);
                    break;
                }
                default: throw ParsingError("bad escape");
            }
        }
    }

    unsigned int ParseHex4() {
        unsigned int v = 0;
        for (int i = 0; i < 4; i++) {
            int c = sc_.Next();
            if (c >= '0' && c <= '9') v = v * 16 + (c - '0');
            else if (c >= 'a' && c <= 'f') v = v * 16 + (c - 'a' + 10);
            else if (c >= 'A' && c <= 'F') v = v * 16 + (c - 'A' + 10);
            else throw ParsingError("bad \\u escape");
        }
        return v;
    }

    ValuePtr ParseNumber() {
        std::string s;
        int c = sc_.Peek();
        if (c == '-') s += static_cast<char>(sc_.Next());
        bool digits = false;
        auto take_digits = [&] {
            while (std::isdigit(sc_.Peek())) {
                s += static_cast<char>(sc_.Next());
                digits = true;
            }
        };
        take_digits();
        if (sc_.Peek() == '.') {
            s += static_cast<char>(sc_.Next());
            take_digits();
        }
        if (!digits) throw ParsingError("invalid number");
        if (sc_.Peek() == 'e' || sc_.Peek() == 'E') {
            s += static_cast<char>(sc_.Next());
            if (sc_.Peek() == '+' || sc_.Peek() == '-') {
                s += static_cast<char>(sc_.Next());
            }
            if (!std::isdigit(sc_.Peek())) throw ParsingError("bad exponent");
            while (std::isdigit(sc_.Peek())) s += static_cast<char>(sc_.Next());
        }
        try {
            return Value::number(std::stod(s));
        } catch (const std::exception&) {
            throw ParsingError("invalid number: " + s);
        }
    }

    ValuePtr ParseArray(int depth) {
        Consume('[');
        std::vector<ValuePtr> items;
        SkipWs();
        if (sc_.Peek() == ']') {
            sc_.Next();
            return Value::array(std::move(items));
        }
        for (;;) {
            items.push_back(ParseValue(depth + 1));
            SkipWs();
            int c = sc_.Next();
            if (c == ']') return Value::array(std::move(items));
            if (c != ',') throw ParsingError("expected ',' or ']'");
        }
    }

    ValuePtr ParseObject(int depth) {
        Consume('{');
        std::map<std::string, ValuePtr> fields;
        SkipWs();
        if (sc_.Peek() == '}') {
            sc_.Next();
            return Value::object(std::move(fields));
        }
        for (;;) {
            SkipWs();
            std::string key = ParseString();
            SkipWs();
            Consume(':');
            fields[std::move(key)] = ParseValue(depth + 1);
            SkipWs();
            int c = sc_.Next();
            if (c == '}') return Value::object(std::move(fields));
            if (c != ',') throw ParsingError("expected ',' or '}'");
        }
    }

    Scanner& sc_;
};

}  // namespace

ValuePtr Parse(FILE* f, size_t size) {
    Scanner sc(f, size);
    Parser p(sc);
    ValuePtr v = p.ParseValue();
    p.SkipWs();
    if (sc.remaining() > 0) {
        throw ParsingError("trailing data after JSON value");
    }
    return v;
}

ValuePtr Parse(const std::string& s) {
    if (s.empty()) throw ParsingError("unexpected end of input");
    FILE* f = fmemopen(const_cast<char*>(s.data()), s.size(), "r");
    if (!f) throw SystemError(errno);
    OwnedStream owned(f);
    return Parse(f, s.size());
}

ValuePtr ParseFile(const std::string& path) {
    OwnedStream f = Fopen(path, "r");
    std::fseek(f.get(), 0, SEEK_END);
    long size = std::ftell(f.get());
    std::fseek(f.get(), 0, SEEK_SET);
    if (size < 0) throw SystemError(errno);
    return Parse(f.get(), static_cast<size_t>(size));
}

}  // namespace gabby::json
