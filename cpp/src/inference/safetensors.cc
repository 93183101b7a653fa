#include "inference/safetensors.h"

#include <cstring>
#include <stdexcept>

#include "json/parser.h"
#include "utils/logging.h"

namespace gabby::inference {

size_t DtypeSize(const std::string& dtype) {
    if (dtype == "F64" || dtype == "I64" || dtype == "U64") return 8;
    if (dtype == "F32" || dtype == "I32" || dtype == "U32") return 4;
    if (dtype == "F16" || dtype == "BF16" || dtype == "I16" || dtype == "U16") {
        return 2;
    }
    if (dtype == "I8" || dtype == "U8" || dtype == "BOOL" ||
        dtype == "F8_E4M3" || dtype == "F8_E5M2") {
        return 1;
    }
    throw std::runtime_error("unknown safetensors dtype: " + dtype);
}

Safetensors Safetensors::LoadFile(const std::string& path) {
    OwnedMmap mem = Mmap(path);
    if (mem.size() < 8) {
        throw std::runtime_error("safetensors file too small: " + path);
    }
    uint64_t header_size = 0;
    std::memcpy(&header_size, mem.data(), 8);  // little-endian per spec
    if (8 + header_size > mem.size()) {
        throw std::runtime_error("safetensors header overruns file: " + path);
    }
    std::string header_str(reinterpret_cast<const char*>(mem.data() + 8),
                           header_size);
    json::ValuePtr header = json::Parse(header_str);
    LOG(INFO) << "loaded safetensors " << path << " ("
              << header->as_object().size() << " entries, "
              << mem.size() / 1e6 << " MB)";
    return Safetensors(std::move(mem), std::move(header), 8 + header_size);
}

std::vector<std::string> Safetensors::names() const {
    std::vector<std::string> out;
    for (const auto& [k, v] : header_->as_object()) {
        if (k != "__metadata__") out.push_back(k);
    }
    return out;
}

bool Safetensors::contains(const std::string& name) const {
    return header_->as_object().count(name) > 0 && name != "__metadata__";
}

TensorView Safetensors::tensor(const std::string& name) const {
    const auto& obj = header_->as_object();
    auto it = obj.find(name);
    if (it == obj.end()) {
        throw std::runtime_error("no such tensor: " + name);
    }
    const auto& entry = it->second->as_object();
    TensorView view;
    view.dtype = entry.at("dtype")->as_string();
    for (const auto& d : entry.at("shape")->as_array()) {
        view.shape.push_back(static_cast<int64_t>(d->as_number()));
    }
    const auto& offsets = entry.at("data_offsets")->as_array();
    size_t begin = static_cast<size_t>(offsets.at(0)->as_number());
    size_t end = static_cast<size_t>(offsets.at(1)->as_number());
    if (end < begin || data_offset_ + end > mem_.size()) {
        throw std::runtime_error("tensor offsets out of range: " + name);
    }
    view.data = mem_.data() + data_offset_ + begin;
    view.nbytes = end - begin;
    size_t expect = DtypeSize(view.dtype) *
                    static_cast<size_t>(view.num_elements());
    if (expect != view.nbytes) {
        throw std::runtime_error("tensor size mismatch: " + name);
    }
    return view;
}

}  // namespace gabby::inference
