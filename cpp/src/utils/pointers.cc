#include "utils/pointers.h"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cerrno>

#include "utils/logging.h"

namespace gabby {

OwnedFd& OwnedFd::operator=(OwnedFd&& o) noexcept {
    if (this != &o) {
        Reset();
        fd_ = o.fd_;
        o.fd_ = -1;
    }
    return *this;
}

int OwnedFd::Release() {
    int fd = fd_;
    fd_ = -1;
    return fd;
}

void OwnedFd::Reset() {
    if (fd_ >= 0) ::close(fd_);
    fd_ = -1;
}

OwnedStream& OwnedStream::operator=(OwnedStream&& o) noexcept {
    if (this != &o) {
        Reset();
        f_ = o.f_;
        o.f_ = nullptr;
    }
    return *this;
}

void OwnedStream::Reset() {
    if (f_) std::fclose(f_);
    f_ = nullptr;
}

OwnedMmap& OwnedMmap::operator=(OwnedMmap&& o) noexcept {
    if (this != &o) {
        Reset();
        data_ = o.data_;
        size_ = o.size_;
        o.data_ = nullptr;
        o.size_ = 0;
    }
    return *this;
}

void OwnedMmap::Reset() {
    if (data_) ::munmap(data_, size_);
    data_ = nullptr;
    size_ = 0;
}

OwnedFd Open(const std::string& path) {
    int fd = ::open(path.c_str(), O_RDONLY);
    if (fd < 0) throw SystemError(errno);
    return OwnedFd(fd);
}

OwnedStream Fopen(const std::string& path, const char* mode) {
    FILE* f = std::fopen(path.c_str(), mode);
    if (!f) throw SystemError(errno);
    return OwnedStream(f);
}

OwnedMmap Mmap(const std::string& path) {
    OwnedFd fd = Open(path);
    struct stat st;
    if (fstat(fd.get(), &st) != 0) throw SystemError(errno);
    void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd.get(), 0);
    if (p == MAP_FAILED) throw SystemError(errno);
    return OwnedMmap(static_cast<uint8_t*>(p), st.st_size);
}

}  // namespace gabby
