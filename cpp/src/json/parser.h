// Size-bounded streaming JSON parser.
//
// Same capability as the reference's scanner + recursive-descent parser
// (/root/reference/src/json/parser.h:70-72, parser.cc:214-269): parses
// exactly `size` bytes off a FILE* — which is how request bodies are read
// straight off the socket bounded by Content-Length — plus string and file
// entry points. Upgrades over the reference: escape sequences are actually
// decoded (\n, \t, \uXXXX -> UTF-8, surrogate pairs; the reference just
// strips the backslash), and a configurable nesting-depth cap guards
// against stack exhaustion from adversarial bodies.
#ifndef GABBY_JSON_PARSER_H_
#define GABBY_JSON_PARSER_H_

#include <cstdio>
#include <string>

#include "json/json.h"

namespace gabby::json {

inline constexpr int kMaxDepth = 128;

// Parses exactly `size` bytes from `f`. Throws ParsingError on malformed
// input or if non-whitespace trailing data remains within the size bound.
ValuePtr Parse(FILE* f, size_t size);

// Parses a complete string.
ValuePtr Parse(const std::string& s);

// Parses a whole file.
ValuePtr ParseFile(const std::string& path);

}  // namespace gabby::json

#endif  // GABBY_JSON_PARSER_H_
