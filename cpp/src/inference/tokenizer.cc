#include "inference/tokenizer.h"

#include <algorithm>
#include <stdexcept>

namespace gabby::inference {
namespace {

// ---- GPT-2 byte <-> printable-unicode mapping -------------------------

std::string EncodeUtf8(unsigned int cp) {
    std::string out;
    if (cp < 0x80) {
        out += static_cast<char>(cp);
    } else if (cp < 0x800) {
        out += static_cast<char>(0xC0 | (cp >> 6));
        out += static_cast<char>(0x80 | (cp & 0x3F));
    } else {
        out += static_cast<char>(0xE0 | (cp >> 12));
        out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
        out += static_cast<char>(0x80 | (cp & 0x3F));
    }
    return out;
}

// byte value -> the printable codepoint the HF byte-level vocab uses
const std::vector<std::string>& ByteToUnicode() {
    static const std::vector<std::string> table = [] {
        std::vector<bool> keep(256, false);
        for (int b = '!'; b <= '~'; b++) keep[b] = true;
        for (int b = 0xA1; b <= 0xAC; b++) keep[b] = true;
        for (int b = 0xAE; b <= 0xFF; b++) keep[b] = true;
        std::vector<std::string> t(256);
        int n = 0;
        for (int b = 0; b < 256; b++) {
            t[b] = keep[b] ? EncodeUtf8(b) : EncodeUtf8(256 + n++);
        }
        return t;
    }();
    return table;
}

// printable codepoint (as UTF-8 string) -> original byte
const std::unordered_map<std::string, uint8_t>& UnicodeToByte() {
    static const std::unordered_map<std::string, uint8_t> table = [] {
        std::unordered_map<std::string, uint8_t> t;
        const auto& b2u = ByteToUnicode();
        for (int b = 0; b < 256; b++) t[b2u[b]] = static_cast<uint8_t>(b);
        return t;
    }();
    return table;
}

// ---- codepoint scanning + classification ------------------------------

// Decodes the UTF-8 codepoint at text[i]; advances i past it.
unsigned int NextCodepoint(const std::string& s, size_t& i) {
    unsigned char c = s[i];
    if (c < 0x80) {
        i += 1;
        return c;
    }
    if ((c >> 5) == 0x6 && i + 1 < s.size()) {
        unsigned int cp = (c & 0x1F) << 6 | (s[i + 1] & 0x3F);
        i += 2;
        return cp;
    }
    if ((c >> 4) == 0xE && i + 2 < s.size()) {
        unsigned int cp =
            (c & 0x0F) << 12 | (s[i + 1] & 0x3F) << 6 | (s[i + 2] & 0x3F);
        i += 3;
        return cp;
    }
    if ((c >> 3) == 0x1E && i + 3 < s.size()) {
        unsigned int cp = (c & 0x07) << 18 | (s[i + 1] & 0x3F) << 12 |
                          (s[i + 2] & 0x3F) << 6 | (s[i + 3] & 0x3F);
        i += 4;
        return cp;
    }
    i += 1;  // invalid byte: treat as Latin-1
    return c;
}

// Exact Unicode category tables (generated from the Unicode database by
// tools/gen_unicode_tables.py) for the classes the Llama-3 split pattern
// uses — \p{L}, \p{N}, \s. Binary search over ~650 ranges; ASCII
// fast-pathed.
#include "inference/unicode_tables.inc"

template <size_t N>
bool InRanges(const CpRange (&table)[N], unsigned int cp) {
    size_t lo = 0, hi = N;
    while (lo < hi) {
        size_t mid = (lo + hi) / 2;
        if (cp < table[mid].lo) {
            hi = mid;
        } else if (cp > table[mid].hi) {
            lo = mid + 1;
        } else {
            return true;
        }
    }
    return false;
}

bool IsSpaceCp(unsigned int cp) {
    if (cp < 0x80) {
        return cp == ' ' || (cp >= 0x09 && cp <= 0x0D) ||
               (cp >= 0x1C && cp <= 0x1F);
    }
    return InRanges(kSpaceRanges, cp);
}

// \p{N}: all Unicode number categories (Nd/Nl/No), matching what the
// reference HF tokenizer's regex engine does — NOT just ASCII digits.
bool IsDigitCp(unsigned int cp) {
    if (cp < 0x80) return cp >= '0' && cp <= '9';
    return InRanges(kNumberRanges, cp);
}

bool IsLetterCp(unsigned int cp) {
    if (cp < 0x80) {
        return (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z');
    }
    return InRanges(kLetterRanges, cp);
}

struct Cp {
    unsigned int cp;
    size_t begin, end;  // byte span in the source string
};

std::vector<Cp> Codepoints(const std::string& s) {
    std::vector<Cp> out;
    size_t i = 0;
    while (i < s.size()) {
        size_t b = i;
        unsigned int cp = NextCodepoint(s, i);
        out.push_back({cp, b, i});
    }
    return out;
}

bool IsAsciiLower(unsigned int c) { return c >= 'a' && c <= 'z'; }

// Case-insensitive match of a contraction suffix at cps[i] ('s 't 're ...).
size_t MatchContraction(const std::vector<Cp>& cps, size_t i) {
    if (cps[i].cp != '\'' || i + 1 >= cps.size()) return 0;
    auto lower = [&](size_t j) {
        unsigned int c = cps[j].cp;
        return c >= 'A' && c <= 'Z' ? c + 32 : c;
    };
    unsigned int c1 = lower(i + 1);
    if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') return 2;
    if (i + 2 < cps.size()) {
        unsigned int c2 = lower(i + 2);
        if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
            (c1 == 'l' && c2 == 'l')) {
            return 3;
        }
    }
    return 0;
}

}  // namespace

// Hand-rolled matcher for the Llama-3 split pattern (in order):
//   (?i:'s|'t|'re|'ve|'m|'ll|'d)        contractions
//   [^\r\n\p{L}\p{N}]?\p{L}+            optional prefix + letters
//   \p{N}{1,3}                          1-3 digits
//   ?[^\s\p{L}\p{N}]+[\r\n]*            punctuation run (opt. space)
//   \s*[\r\n]+                          newline runs
//   \s+(?!\S)                           trailing whitespace
//   \s+                                 whitespace (keeps last as prefix)
std::vector<std::string> Tokenizer::Pretokenize(const std::string& text) const {
    std::vector<Cp> cps = Codepoints(text);
    std::vector<std::string> out;
    size_t i = 0;
    auto slice = [&](size_t a, size_t b) {
        return text.substr(cps[a].begin, cps[b - 1].end - cps[a].begin);
    };
    while (i < cps.size()) {
        // contraction
        if (size_t n = MatchContraction(cps, i); n > 0) {
            out.push_back(slice(i, i + n));
            i += n;
            continue;
        }
        unsigned int c = cps[i].cp;
        // optional non-letter/digit/CR/LF prefix + letters
        {
            size_t j = i;
            bool prefix = !IsLetterCp(c) && !IsDigitCp(c) && c != '\r' &&
                          c != '\n';
            size_t start_letters = prefix ? j + 1 : j;
            if (start_letters < cps.size() &&
                IsLetterCp(cps[start_letters].cp)) {
                size_t k = start_letters;
                while (k < cps.size() && IsLetterCp(cps[k].cp)) k++;
                out.push_back(slice(i, k));
                i = k;
                continue;
            }
        }
        // 1-3 digits
        if (IsDigitCp(c)) {
            size_t k = i;
            while (k < cps.size() && k < i + 3 && IsDigitCp(cps[k].cp)) k++;
            out.push_back(slice(i, k));
            i = k;
            continue;
        }
        // ' ?[^\s\p{L}\p{N}]+[\r\n]*'
        {
            size_t j = i;
            if (cps[j].cp == ' ' && j + 1 < cps.size()) j++;
            if (j < cps.size() && !IsSpaceCp(cps[j].cp) &&
                !IsLetterCp(cps[j].cp) && !IsDigitCp(cps[j].cp)) {
                size_t k = j;
                while (k < cps.size() && !IsSpaceCp(cps[k].cp) &&
                       !IsLetterCp(cps[k].cp) && !IsDigitCp(cps[k].cp)) {
                    k++;
                }
                while (k < cps.size() &&
                       (cps[k].cp == '\r' || cps[k].cp == '\n')) {
                    k++;
                }
                out.push_back(slice(i, k));
                i = k;
                continue;
            }
        }
        // '\s*[\r\n]+'
        if (IsSpaceCp(c)) {
            size_t k = i;
            while (k < cps.size() && IsSpaceCp(cps[k].cp) &&
                   cps[k].cp != '\r' && cps[k].cp != '\n') {
                k++;
            }
            if (k < cps.size() && (cps[k].cp == '\r' || cps[k].cp == '\n')) {
                while (k < cps.size() &&
                       (cps[k].cp == '\r' || cps[k].cp == '\n')) {
                    k++;
                }
                out.push_back(slice(i, k));
                i = k;
                continue;
            }
            // '\s+(?!\S)' then '\s+': a whitespace run followed by
            // non-space gives its LAST space up to prefix the next token
            // (the letter/punct rules above consume it; a lone space
            // before a digit stands alone)
            size_t ws_end = i;
            while (ws_end < cps.size() && IsSpaceCp(cps[ws_end].cp)) ws_end++;
            if (ws_end == cps.size()) {          // trailing whitespace
                out.push_back(slice(i, ws_end));
                i = ws_end;
            } else if (ws_end - i > 1) {         // run minus the last space
                out.push_back(slice(i, ws_end - 1));
                i = ws_end - 1;
            } else {                             // lone space before digit
                out.push_back(slice(i, i + 1));
                i += 1;
            }
            continue;
        }
        // fallback: single codepoint
        out.push_back(slice(i, i + 1));
        i += 1;
    }
    return out;
}

Tokenizer Tokenizer::FromJson(const json::Value& tokenizer_json) {
    Tokenizer t;
    const auto& root = tokenizer_json.as_object();
    const auto& model = root.at("model")->as_object();
    for (const auto& [token, id] : model.at("vocab")->as_object()) {
        int i = static_cast<int>(id->as_number());
        t.vocab_[token] = i;
        t.id_to_token_[i] = token;
    }
    if (auto it = model.find("merges"); it != model.end()) {
        int rank = 0;
        for (const auto& m : it->second->as_array()) {
            std::string a, b;
            if (m->is(json::Type::STR)) {
                const std::string& s = m->as_string();
                auto sp = s.find(' ');
                a = s.substr(0, sp);
                b = s.substr(sp + 1);
            } else {
                a = m->as_array().at(0)->as_string();
                b = m->as_array().at(1)->as_string();
            }
            t.ranks_[{a, b}] = rank++;
        }
    }
    if (auto it = root.find("added_tokens"); it != root.end()) {
        for (const auto& tok : it->second->as_array()) {
            const auto& obj = tok->as_object();
            int id = static_cast<int>(obj.at("id")->as_number());
            const std::string& content = obj.at("content")->as_string();
            t.added_[content] = id;
            t.id_to_added_[id] = content;
            t.added_by_length_.push_back(content);
        }
        std::sort(t.added_by_length_.begin(), t.added_by_length_.end(),
                  [](const std::string& a, const std::string& b) {
                      return a.size() > b.size();
                  });
    }
    return t;
}

std::vector<int> Tokenizer::Bpe(const std::string& mapped) const {
    // split into codepoints, then merge by rank
    std::vector<std::string> parts;
    size_t i = 0;
    while (i < mapped.size()) {
        size_t b = i;
        NextCodepoint(mapped, i);
        parts.push_back(mapped.substr(b, i - b));
    }
    while (parts.size() > 1) {
        int best_rank = -1;
        size_t best_i = 0;
        for (size_t j = 0; j + 1 < parts.size(); j++) {
            auto it = ranks_.find({parts[j], parts[j + 1]});
            if (it != ranks_.end() &&
                (best_rank < 0 || it->second < best_rank)) {
                best_rank = it->second;
                best_i = j;
            }
        }
        if (best_rank < 0) break;
        parts[best_i] += parts[best_i + 1];
        parts.erase(parts.begin() + best_i + 1);
    }
    std::vector<int> ids;
    ids.reserve(parts.size());
    for (const auto& p : parts) {
        auto it = vocab_.find(p);
        if (it != vocab_.end()) ids.push_back(it->second);
    }
    return ids;
}

std::vector<int> Tokenizer::Encode(const std::string& text,
                                   bool allow_special) const {
    std::vector<int> ids;
    // split out literal special tokens first (longest match wins)
    std::vector<std::pair<std::string, bool>> segments;  // (text, is_special)
    if (allow_special && !added_by_length_.empty()) {
        size_t pos = 0;
        while (pos < text.size()) {
            size_t best = std::string::npos;
            const std::string* best_tok = nullptr;
            for (const auto& tok : added_by_length_) {
                size_t f = text.find(tok, pos);
                if (f != std::string::npos &&
                    (best == std::string::npos || f < best)) {
                    best = f;
                    best_tok = &tok;
                }
            }
            if (!best_tok) break;
            if (best > pos) segments.push_back({text.substr(pos, best - pos),
                                                false});
            segments.push_back({*best_tok, true});
            pos = best + best_tok->size();
        }
        if (pos < text.size()) segments.push_back({text.substr(pos), false});
    } else {
        segments.push_back({text, false});
    }

    const auto& b2u = ByteToUnicode();
    for (const auto& [seg, special] : segments) {
        if (special) {
            ids.push_back(added_.at(seg));
            continue;
        }
        for (const std::string& piece : Pretokenize(seg)) {
            std::string mapped;
            for (unsigned char b : piece) mapped += b2u[b];
            std::vector<int> sub = Bpe(mapped);
            ids.insert(ids.end(), sub.begin(), sub.end());
        }
    }
    return ids;
}

std::string Tokenizer::Decode(const std::vector<int>& ids) const {
    std::string bytes;
    const auto& u2b = UnicodeToByte();
    for (int id : ids) {
        if (auto it = id_to_added_.find(id); it != id_to_added_.end()) {
            bytes += it->second;
            continue;
        }
        auto it = id_to_token_.find(id);
        if (it == id_to_token_.end()) continue;
        const std::string& tok = it->second;
        size_t i = 0;
        while (i < tok.size()) {
            size_t b = i;
            NextCodepoint(tok, i);
            auto bit = u2b.find(tok.substr(b, i - b));
            if (bit != u2b.end()) bytes += static_cast<char>(bit->second);
        }
    }
    return bytes;
}

int Tokenizer::TokenId(const std::string& token) const {
    if (auto it = added_.find(token); it != added_.end()) return it->second;
    if (auto it = vocab_.find(token); it != vocab_.end()) return it->second;
    throw std::runtime_error("unknown token: " + token);
}

size_t Tokenizer::vocab_size() const { return vocab_.size() + added_.size(); }

std::vector<int> Tokenizer::ChatPromptIds(
    const std::vector<std::pair<std::string, std::string>>& role_content)
    const {
    std::vector<int> ids;
    auto header = [&](const std::string& role) {
        ids.push_back(TokenId("<|start_header_id|>"));
        auto r = Encode(role, false);
        ids.insert(ids.end(), r.begin(), r.end());
        ids.push_back(TokenId("<|end_header_id|>"));
        auto nl = Encode("\n\n", false);
        ids.insert(ids.end(), nl.begin(), nl.end());
    };
    ids.push_back(TokenId("<|begin_of_text|>"));
    for (const auto& [role, content] : role_content) {
        header(role);
        // strip() to match the chat template
        size_t a = content.find_first_not_of(" \t\r\n");
        size_t b = content.find_last_not_of(" \t\r\n");
        std::string stripped =
            a == std::string::npos ? "" : content.substr(a, b - a + 1);
        auto c = Encode(stripped, false);
        ids.insert(ids.end(), c.begin(), c.end());
        ids.push_back(TokenId("<|eot_id|>"));
    }
    header("assistant");
    return ids;
}

std::vector<int> Tokenizer::StopIds() const {
    std::vector<int> out;
    for (const char* t : {"<|eot_id|>", "<|end_of_text|>", "<|eom_id|>"}) {
        if (auto it = added_.find(t); it != added_.end()) {
            out.push_back(it->second);
        }
    }
    return out;
}

}  // namespace gabby::inference
