// RAII wrappers for POSIX resources: fds, FILE*, mmap'd regions.
//
// Same capability as /root/reference/src/utils/pointers.h:11-28 (OwnedFd,
// OwnedStream, OwnedMmap + Open/Fopen/Mmap helpers); this version keeps the
// fd by value inside a small struct instead of heap-allocating an int.
#ifndef GABBY_UTILS_POINTERS_H_
#define GABBY_UTILS_POINTERS_H_

#include <cstdint>
#include <cstdio>
#include <string>

namespace gabby {

// Moveable, non-copyable owned file descriptor.
class OwnedFd {
   public:
    OwnedFd() : fd_(-1) {}
    explicit OwnedFd(int fd) : fd_(fd) {}
    OwnedFd(OwnedFd&& o) noexcept : fd_(o.fd_) { o.fd_ = -1; }
    OwnedFd& operator=(OwnedFd&& o) noexcept;
    OwnedFd(const OwnedFd&) = delete;
    OwnedFd& operator=(const OwnedFd&) = delete;
    ~OwnedFd() { Reset(); }

    int get() const { return fd_; }
    bool valid() const { return fd_ >= 0; }
    int Release();   // give up ownership
    void Reset();    // close if open

   private:
    int fd_;
};

// Owned FILE* (fclose on destruction).
class OwnedStream {
   public:
    OwnedStream() : f_(nullptr) {}
    explicit OwnedStream(FILE* f) : f_(f) {}
    OwnedStream(OwnedStream&& o) noexcept : f_(o.f_) { o.f_ = nullptr; }
    OwnedStream& operator=(OwnedStream&& o) noexcept;
    OwnedStream(const OwnedStream&) = delete;
    OwnedStream& operator=(const OwnedStream&) = delete;
    ~OwnedStream() { Reset(); }

    FILE* get() const { return f_; }
    bool valid() const { return f_ != nullptr; }
    void Reset();

   private:
    FILE* f_;
};

// Owned read-only mmap'd region (munmap on destruction).
class OwnedMmap {
   public:
    OwnedMmap() : data_(nullptr), size_(0) {}
    OwnedMmap(uint8_t* data, size_t size) : data_(data), size_(size) {}
    OwnedMmap(OwnedMmap&& o) noexcept : data_(o.data_), size_(o.size_) {
        o.data_ = nullptr;
        o.size_ = 0;
    }
    OwnedMmap& operator=(OwnedMmap&& o) noexcept;
    OwnedMmap(const OwnedMmap&) = delete;
    OwnedMmap& operator=(const OwnedMmap&) = delete;
    ~OwnedMmap() { Reset(); }

    const uint8_t* data() const { return data_; }
    size_t size() const { return size_; }
    bool valid() const { return data_ != nullptr; }
    void Reset();

   private:
    uint8_t* data_;
    size_t size_;
};

// Throwing factories (SystemError on failure).
OwnedFd Open(const std::string& path);          // O_RDONLY
OwnedStream Fopen(const std::string& path, const char* mode);
OwnedMmap Mmap(const std::string& path);        // whole file, PROT_READ

}  // namespace gabby

#endif  // GABBY_UTILS_POINTERS_H_
