// Safetensors reader tests against a file synthesized on the fly (no model
// download needed; the reference's tests require the real HF snapshot via a
// global fixture, /root/reference/src/test/test_main.cc:9-19).
#include "inference/safetensors.h"

#include <cstdio>
#include <cstring>
#include <vector>

#include "test/test.h"
#include "utils/logging.h"

namespace gabby::inference {
namespace {

// Writes a 2-tensor safetensors file: a [2,3] F32 and a [4] I8.
std::string WriteFixture() {
    std::string header =
        R"({"w":{"dtype":"F32","shape":[2,3],"data_offsets":[0,24]},)"
        R"("b":{"dtype":"I8","shape":[4],"data_offsets":[24,28]},)"
        R"("__metadata__":{"format":"pt"}})";
    std::string path = "/tmp/gabby_st_test.safetensors";
    FILE* f = fopen(path.c_str(), "wb");
    uint64_t n = header.size();
    fwrite(&n, 8, 1, f);
    fwrite(header.data(), 1, header.size(), f);
    float w[6] = {1, 2, 3, 4, 5, 6.5f};
    int8_t b[4] = {-1, 0, 1, 127};
    fwrite(w, 4, 6, f);
    fwrite(b, 1, 4, f);
    fclose(f);
    return path;
}

TEST(Safetensors, LoadsHeaderAndViews) {
    auto st = Safetensors::LoadFile(WriteFixture());
    EXPECT_EQ(st.names().size(), size_t{2});
    EXPECT_TRUE(st.contains("w"));
    EXPECT_TRUE(st.contains("b"));
    EXPECT_FALSE(st.contains("__metadata__"));

    TensorView w = st.tensor("w");
    EXPECT_EQ(w.dtype, "F32");
    EXPECT_EQ(w.shape.size(), size_t{2});
    EXPECT_EQ(w.num_elements(), int64_t{6});
    EXPECT_EQ(w.nbytes, size_t{24});
    float vals[6];
    std::memcpy(vals, w.data, 24);
    EXPECT_FLOAT_EQ(vals[5], 6.5, 1e-9);

    TensorView b = st.tensor("b");
    EXPECT_EQ(b.dtype, "I8");
    EXPECT_EQ(reinterpret_cast<const int8_t*>(b.data)[3], 127);
}

TEST(Safetensors, Errors) {
    auto st = Safetensors::LoadFile(WriteFixture());
    EXPECT_THROWS(st.tensor("missing"), std::runtime_error);
    EXPECT_THROWS(Safetensors::LoadFile("/nonexistent/x.safetensors"),
                  SystemError);
    EXPECT_THROWS(DtypeSize("BOGUS"), std::runtime_error);
}

}  // namespace
}  // namespace gabby::inference
