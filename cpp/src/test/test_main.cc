// Serial test runner; exit code = failure count (capped for the shell).
// Counterpart of /root/reference/src/test/test_main.cc:22-35.
#include <string>

#include "test/test.h"

int main(int argc, char** argv) {
    std::string filter = argc > 1 ? argv[1] : "";
    int failures = gabby::test::RunAll(filter);
    return failures > 125 ? 125 : failures;
}
