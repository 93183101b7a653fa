#include "test/test.h"

namespace gabby::test {

std::vector<TestCase>& Registry() {
    static std::vector<TestCase> cases;
    return cases;
}

namespace detail {

[[noreturn]] void Fail(const char* file, int line, const std::string& msg) {
    std::ostringstream os;
    os << file << ":" << line << ": " << msg;
    throw TestFailure(os.str());
}

}  // namespace detail

int RunAll(const std::string& filter) {
    int failures = 0;
    int ran = 0;
    for (const auto& tc : Registry()) {
        if (!filter.empty() && tc.name.find(filter) == std::string::npos) {
            continue;
        }
        ran++;
        try {
            tc.fn();
            std::cout << "[ OK ] " << tc.name << "\n";
        } catch (const std::exception& e) {
            failures++;
            std::cout << "[FAIL] " << tc.name << ": " << e.what() << "\n";
        } catch (...) {
            failures++;
            std::cout << "[FAIL] " << tc.name << ": unknown exception\n";
        }
    }
    std::cout << ran << " tests, " << failures << " failures\n";
    return failures;
}

}  // namespace gabby::test
