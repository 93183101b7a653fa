// Tokenizer CLI: encode stdin with a tokenizer.json, print ids (one line
// per input line) — the cross-language parity harness drives this from
// pytest against the Python tokenizer (tests/test_cpp_tokenizer.py).
//
// usage: gabby_tokenize <tokenizer.json> [--decode]
#include <iostream>
#include <sstream>
#include <string>

#include "inference/tokenizer.h"
#include "json/parser.h"

int main(int argc, char** argv) {
    if (argc < 2) {
        std::cerr << "usage: " << argv[0] << " <tokenizer.json> [--decode]\n";
        return 2;
    }
    bool decode = argc > 2 && std::string(argv[2]) == "--decode";
    auto tok = gabby::inference::Tokenizer::FromJson(
        *gabby::json::ParseFile(argv[1]));

    std::string line;
    while (std::getline(std::cin, line)) {
        if (decode) {
            std::vector<int> ids;
            std::istringstream is(line);
            int id;
            while (is >> id) ids.push_back(id);
            std::cout << tok.Decode(ids) << "\n";
        } else {
            bool first = true;
            for (int id : tok.Encode(line)) {
                if (!first) std::cout << " ";
                first = false;
                std::cout << id;
            }
            std::cout << "\n";
        }
    }
    return 0;
}
