// Tests for flags, logging level plumbing, and RAII pointers.
#include <unistd.h>

#include "test/test.h"
#include "utils/flags.h"
#include "utils/logging.h"
#include "utils/pointers.h"

namespace gabby {
namespace {

TEST(Flags, ParsesAllForms) {
    int port = 8080;
    std::string model;
    bool debug = false;
    Flags flags;
    flags.Int("port", &port, "p").Str("model-dir", &model, "m").Bool(
        "debug", &debug, "d");
    const char* argv[] = {"prog", "--port", "9090", "--model-dir=/tmp/m",
                          "--debug"};
    flags.Parse(5, const_cast<char**>(argv));
    EXPECT_EQ(port, 9090);
    EXPECT_EQ(model, "/tmp/m");
    EXPECT_TRUE(debug);
}

TEST(Flags, Errors) {
    int x = 0;
    Flags flags;
    flags.Int("x", &x, "");
    const char* unknown[] = {"prog", "--nope", "1"};
    EXPECT_THROWS(flags.Parse(3, const_cast<char**>(unknown)), FlagError);
    const char* badint[] = {"prog", "--x", "abc"};
    EXPECT_THROWS(flags.Parse(3, const_cast<char**>(badint)), FlagError);
    const char* missing[] = {"prog", "--x"};
    EXPECT_THROWS(flags.Parse(2, const_cast<char**>(missing)), FlagError);
    const char* positional[] = {"prog", "stray"};
    EXPECT_THROWS(flags.Parse(2, const_cast<char**>(positional)), FlagError);
}

TEST(Logging, ScopedLevelRestores) {
    LogLevel before = GlobalLogLevel();
    {
        ScopedLogLevel scoped(LogLevel::DEBUG);
        EXPECT_TRUE(GlobalLogLevel() == LogLevel::DEBUG);
    }
    EXPECT_TRUE(GlobalLogLevel() == before);
}

TEST(Pointers, OwnedFdMovesAndCloses) {
    int fds[2];
    EXPECT_EQ(pipe(fds), 0);
    int raw0 = fds[0];
    {
        OwnedFd a(fds[0]);
        OwnedFd b(fds[1]);
        OwnedFd c = std::move(a);
        EXPECT_FALSE(a.valid());
        EXPECT_TRUE(c.valid());
        EXPECT_EQ(c.get(), raw0);
    }
    // both ends closed now: writing to raw0 must fail
    EXPECT_TRUE(write(raw0, "x", 1) < 0);
}

TEST(Pointers, MmapReadsFile) {
    std::string path = "/tmp/gabby_mmap_test.bin";
    FILE* f = fopen(path.c_str(), "wb");
    fputs("hello mmap", f);
    fclose(f);
    OwnedMmap m = Mmap(path);
    EXPECT_EQ(m.size(), size_t{10});
    EXPECT_EQ(std::string(reinterpret_cast<const char*>(m.data()), 5),
              "hello");
    EXPECT_THROWS(Mmap("/nonexistent/nope"), SystemError);
}

}  // namespace
}  // namespace gabby
