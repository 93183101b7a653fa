#include "utils/logging.h"

#include <chrono>
#include <cstdio>
#include <ctime>

namespace gabby {
namespace {

std::atomic<int> g_level{static_cast<int>(LogLevel::OFF)};

const char* Basename(const char* path) {
    const char* base = path;
    for (const char* p = path; *p; p++) {
        if (*p == '/') base = p + 1;
    }
    return base;
}

const char* Name(LogLevel level) {
    switch (level) {
        case LogLevel::ERROR: return "E";
        case LogLevel::WARN: return "W";
        case LogLevel::INFO: return "I";
        case LogLevel::DEBUG: return "D";
        default: return "?";
    }
}

}  // namespace

LogLevel GlobalLogLevel() {
    return static_cast<LogLevel>(g_level.load(std::memory_order_relaxed));
}

void SetGlobalLogLevel(LogLevel level) {
    g_level.store(static_cast<int>(level), std::memory_order_relaxed);
}

Logger::Logger(LogLevel level, const char* file, int line)
    : enabled_(level <= GlobalLogLevel() && level != LogLevel::OFF) {
    if (!enabled_) return;
    auto now = std::chrono::system_clock::now();
    std::time_t secs = std::chrono::system_clock::to_time_t(now);
    auto ms = std::chrono::duration_cast<std::chrono::milliseconds>(
                  now.time_since_epoch())
                  .count() %
              1000;
    std::tm tm;
    localtime_r(&secs, &tm);
    char ts[32];
    std::strftime(ts, sizeof(ts), "%H:%M:%S", &tm);
    buf_ << Name(level) << ts << "." << ms / 100 << " " << Basename(file)
         << ":" << line << "] ";
}

Logger::~Logger() {
    if (!enabled_) return;
    buf_ << "\n";
    // single fputs: one write keeps concurrent lines unmangled
    std::fputs(buf_.str().c_str(), stderr);
}

}  // namespace gabby
