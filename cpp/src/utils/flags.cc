#include "utils/flags.h"

#include <sstream>

namespace gabby {

Flags& Flags::Int(const std::string& name, int* out, const std::string& help) {
    specs_[name] = Spec{Kind::INT, out, help};
    order_.push_back(name);
    return *this;
}

Flags& Flags::Str(const std::string& name, std::string* out,
                  const std::string& help) {
    specs_[name] = Spec{Kind::STR, out, help};
    order_.push_back(name);
    return *this;
}

Flags& Flags::Bool(const std::string& name, bool* out,
                   const std::string& help) {
    specs_[name] = Spec{Kind::BOOL, out, help};
    order_.push_back(name);
    return *this;
}

void Flags::Parse(int argc, char** argv) {
    for (int i = 1; i < argc; i++) {
        std::string arg = argv[i];
        if (arg.rfind("--", 0) != 0) {
            throw FlagError("unexpected argument: " + arg);
        }
        std::string name = arg.substr(2);
        std::optional<std::string> inline_val;
        if (auto eq = name.find('='); eq != std::string::npos) {
            inline_val = name.substr(eq + 1);
            name = name.substr(0, eq);
        }
        auto it = specs_.find(name);
        if (it == specs_.end()) throw FlagError("unknown flag: --" + name);
        const Spec& spec = it->second;
        if (spec.kind == Kind::BOOL && !inline_val) {
            *static_cast<bool*>(spec.out) = true;
            continue;
        }
        std::string val;
        if (inline_val) {
            val = *inline_val;
        } else {
            if (i + 1 >= argc) throw FlagError("missing value for --" + name);
            val = argv[++i];
        }
        switch (spec.kind) {
            case Kind::INT:
                try {
                    *static_cast<int*>(spec.out) = std::stoi(val);
                } catch (const std::exception&) {
                    throw FlagError("bad int for --" + name + ": " + val);
                }
                break;
            case Kind::STR:
                *static_cast<std::string*>(spec.out) = val;
                break;
            case Kind::BOOL:
                *static_cast<bool*>(spec.out) = (val == "true" || val == "1");
                break;
        }
    }
}

std::string Flags::Usage(const std::string& prog) const {
    std::ostringstream os;
    os << "usage: " << prog << " [flags]\n";
    for (const auto& name : order_) {
        os << "  --" << name << "\t" << specs_.at(name).help << "\n";
    }
    return os.str();
}

}  // namespace gabby
