// Minimal argv flag parsing: --name value and --name=value forms.
//
// Same capability as the reference's ParseIntFlag/ParseStrFlag scan
// (/root/reference/src/main.cc:45-92), factored into a reusable helper that
// also supports bool switches; unknown flags raise (the reference hard-exits).
#ifndef GABBY_UTILS_FLAGS_H_
#define GABBY_UTILS_FLAGS_H_

#include <map>
#include <optional>
#include <stdexcept>
#include <string>
#include <vector>

namespace gabby {

class FlagError : public std::runtime_error {
   public:
    explicit FlagError(const std::string& msg) : std::runtime_error(msg) {}
};

class Flags {
   public:
    Flags& Int(const std::string& name, int* out, const std::string& help);
    Flags& Str(const std::string& name, std::string* out,
               const std::string& help);
    Flags& Bool(const std::string& name, bool* out, const std::string& help);

    // Parses argv; throws FlagError on unknown flags / bad values.
    void Parse(int argc, char** argv);
    std::string Usage(const std::string& prog) const;

   private:
    enum class Kind { INT, STR, BOOL };
    struct Spec {
        Kind kind;
        void* out;
        std::string help;
    };
    std::map<std::string, Spec> specs_;
    std::vector<std::string> order_;
};

}  // namespace gabby

#endif  // GABBY_UTILS_FLAGS_H_
