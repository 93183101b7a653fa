// Zero-copy safetensors reader.
//
// Same capability as /root/reference/src/inference/safetensors.h:13-25
// (mmap the file, decode the 8-byte LE header length, parse the JSON
// header), EXTENDED to actually expose tensor bytes: the reference stores
// the mapping but has no data accessor (its mem_/data_offset_ are unused,
// /root/reference/src/inference/safetensors.h:19-24). TensorView points
// straight into the mmap — feeding host buffers to the engine zero-copy.
#ifndef GABBY_INFERENCE_SAFETENSORS_H_
#define GABBY_INFERENCE_SAFETENSORS_H_

#include <cstdint>
#include <map>
#include <string>
#include <vector>

#include "json/json.h"
#include "utils/pointers.h"

namespace gabby::inference {

struct TensorView {
    std::string dtype;            // "F32", "BF16", "I8", ...
    std::vector<int64_t> shape;
    const uint8_t* data = nullptr;
    size_t nbytes = 0;

    int64_t num_elements() const {
        int64_t n = 1;
        for (int64_t d : shape) n *= d;
        return n;
    }
};

class Safetensors {
   public:
    static Safetensors LoadFile(const std::string& path);

    const json::ValuePtr& header() const { return header_; }
    std::vector<std::string> names() const;
    bool contains(const std::string& name) const;
    TensorView tensor(const std::string& name) const;
    size_t data_size() const { return mem_.size() - data_offset_; }

   private:
    Safetensors(OwnedMmap mem, json::ValuePtr header, size_t data_offset)
        : mem_(std::move(mem)),
          header_(std::move(header)),
          data_offset_(data_offset) {}

    OwnedMmap mem_;
    json::ValuePtr header_;
    size_t data_offset_;
};

// Bytes per element for a safetensors dtype tag; throws on unknown tags.
size_t DtypeSize(const std::string& dtype);

}  // namespace gabby::inference

#endif  // GABBY_INFERENCE_SAFETENSORS_H_
