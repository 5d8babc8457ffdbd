// Golden-output generator for the kerasify coding-filter models: loads a
// kerasify .model, feeds deterministic pseudo-random feature rows, prints
// the outputs.  Links the reference's vendored kerasify implementation
// (build: g++ -O2 -I /root/reference/lib/kerasify tools/kerasify_golden.cpp
//  /root/reference/lib/kerasify/keras_model.cpp -o work/kerasify_golden).
#include "keras_model.h"
#include <cstdio>
#include <fstream>
#include <iterator>
#include <string>
#include <cstdint>

int main(int argc, char **argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s model in_dim\n", argv[0]); return 1; }
    // this fork's LoadModel takes the serialized bytes, not a path
    std::ifstream fh(argv[1], std::ios::binary);
    std::string blob((std::istreambuf_iterator<char>(fh)),
                     std::istreambuf_iterator<char>());
    KerasModel model;
    if (!model.LoadModel(blob)) { fprintf(stderr, "load failed\n"); return 1; }
    const int in_dim = atoi(argv[2]);
    uint64_t state = 42;
    for (int row = 0; row < 16; row++) {
        Tensor in(in_dim);
        for (int i = 0; i < in_dim; i++) {
            state = state * 6364136223846793005ULL + 1442695040888963407ULL;
            in.data_[i] = ((float)((state >> 33) & 0xFFFF) / 65536.0f - 0.5f) * 0.2f;
        }
        Tensor out;
        if (!model.Apply(&in, &out)) { fprintf(stderr, "apply failed\n"); return 1; }
        for (size_t j = 0; j < out.data_.size(); j++)
            printf("%.9g%c", out.data_[j], j + 1 == out.data_.size() ? '\n' : '\t');
    }
    return 0;
}
