// Self-registering test framework.
//
// Same capability as the reference's (/root/reference/src/test/test.h:69-118):
// TEST(Suite, Case) macro registering into a global list, exception-isolated
// serial runner, EXPECT_* assertions. Two reference defects fixed here:
// EXPECT_SUBSTR actually checks find() != npos (the reference's `>= 0` on a
// size_t is always true), and failed EXPECT_EQ prints the VALUES, not the
// argument spellings.
#ifndef GABBY_TEST_TEST_H_
#define GABBY_TEST_TEST_H_

#include <cmath>
#include <functional>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

namespace gabby::test {

class TestFailure : public std::runtime_error {
   public:
    explicit TestFailure(const std::string& msg) : std::runtime_error(msg) {}
};

struct TestCase {
    std::string name;
    std::function<void()> fn;
};

std::vector<TestCase>& Registry();

struct Registrar {
    Registrar(std::string name, std::function<void()> fn) {
        Registry().push_back({std::move(name), std::move(fn)});
    }
};

// Runs all registered tests (optionally filtered by substring); returns the
// number of failures.
int RunAll(const std::string& filter = "");

namespace detail {

template <typename T>
std::string Repr(const T& v) {
    std::ostringstream os;
    os << v;
    return os.str();
}

[[noreturn]] void Fail(const char* file, int line, const std::string& msg);

}  // namespace detail
}  // namespace gabby::test

#define TEST(suite, case_name)                                              \
    static void gabby_test_##suite##_##case_name();                         \
    static ::gabby::test::Registrar gabby_reg_##suite##_##case_name(        \
        #suite "." #case_name, gabby_test_##suite##_##case_name);           \
    static void gabby_test_##suite##_##case_name()

#define EXPECT_TRUE(cond)                                                  \
    do {                                                                   \
        if (!(cond))                                                       \
            ::gabby::test::detail::Fail(__FILE__, __LINE__,                \
                                        "expected true: " #cond);          \
    } while (0)

#define EXPECT_FALSE(cond)                                                 \
    do {                                                                   \
        if (cond)                                                          \
            ::gabby::test::detail::Fail(__FILE__, __LINE__,                \
                                        "expected false: " #cond);         \
    } while (0)

#define EXPECT_EQ(a, b)                                                      \
    do {                                                                     \
        const auto& va = (a);                                                \
        const auto& vb = (b);                                                \
        if (!(va == vb))                                                     \
            ::gabby::test::detail::Fail(                                     \
                __FILE__, __LINE__,                                          \
                std::string(#a " == " #b "\n  left:  ") +                    \
                    ::gabby::test::detail::Repr(va) + "\n  right: " +        \
                    ::gabby::test::detail::Repr(vb));                        \
    } while (0)

#define EXPECT_FLOAT_EQ(a, b, eps)                                           \
    do {                                                                     \
        double va = (a), vb = (b);                                           \
        if (std::abs(va - vb) > (eps))                                       \
            ::gabby::test::detail::Fail(                                     \
                __FILE__, __LINE__,                                          \
                std::string(#a " ~= " #b ": ") + std::to_string(va) +        \
                    " vs " + std::to_string(vb));                            \
    } while (0)

#define EXPECT_SUBSTR(haystack, needle)                                      \
    do {                                                                     \
        std::string h = (haystack), n = (needle);                            \
        if (h.find(n) == std::string::npos)                                  \
            ::gabby::test::detail::Fail(                                     \
                __FILE__, __LINE__,                                          \
                "expected substring \"" + n + "\" in \"" + h + "\"");        \
    } while (0)

#define EXPECT_THROWS(expr, exc_type)                                        \
    do {                                                                     \
        bool caught = false;                                                 \
        try {                                                                \
            (void)(expr);                                                    \
        } catch (const exc_type&) {                                          \
            caught = true;                                                   \
        }                                                                    \
        if (!caught)                                                         \
            ::gabby::test::detail::Fail(__FILE__, __LINE__,                  \
                                        "expected " #expr " to throw "       \
                                        #exc_type);                          \
    } while (0)

#endif  // GABBY_TEST_TEST_H_
