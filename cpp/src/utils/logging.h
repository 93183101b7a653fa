// Logging + error utilities for the native serving front-end.
//
// Same capability as the reference's logging layer
// (/root/reference/src/utils/logging.h:13-65): a LOG(level) stream macro, a
// mutable global level, a scoped override for tests, and SystemError carrying
// errno + source location. Differences by design: the global level is an
// std::atomic (the reference mutates a plain int from multiple threads), and
// the level ordering is conventional (ERROR < WARN < INFO < DEBUG; the
// reference ranks WARN above INFO).
#ifndef GABBY_UTILS_LOGGING_H_
#define GABBY_UTILS_LOGGING_H_

#include <atomic>
#include <cstring>
#include <source_location>
#include <sstream>
#include <stdexcept>
#include <string>

namespace gabby {

enum class LogLevel : int {
    OFF = 0,
    ERROR = 1,
    WARN = 2,
    INFO = 3,
    DEBUG = 4,
};

LogLevel GlobalLogLevel();
void SetGlobalLogLevel(LogLevel level);

// RAII level override for tests.
class ScopedLogLevel {
   public:
    explicit ScopedLogLevel(LogLevel level) : prev_(GlobalLogLevel()) {
        SetGlobalLogLevel(level);
    }
    ~ScopedLogLevel() { SetGlobalLogLevel(prev_); }

   private:
    LogLevel prev_;
};

// Buffers one log line, flushes to stderr on destruction iff enabled.
class Logger {
   public:
    Logger(LogLevel level, const char* file, int line);
    ~Logger();

    template <typename T>
    Logger& operator<<(const T& v) {
        if (enabled_) buf_ << v;
        return *this;
    }

   private:
    bool enabled_;
    std::ostringstream buf_;
};

#define LOG(level) ::gabby::Logger(::gabby::LogLevel::level, __FILE__, __LINE__)

// Exception wrapping an errno with the throwing source location.
class SystemError : public std::runtime_error {
   public:
    explicit SystemError(
        int err, std::source_location loc = std::source_location::current())
        : std::runtime_error(std::string(loc.file_name()) + ":" +
                             std::to_string(loc.line()) + ": " +
                             std::strerror(err)),
          err_(err) {}
    int err() const { return err_; }

   private:
    int err_;
};

}  // namespace gabby

#endif  // GABBY_UTILS_LOGGING_H_
