// Dump ground truth from the reference's musical soft-clip kernel.
//
// softClipBlockAVX2 + musicalSoftClipScalar live in an anonymous
// namespace of audioengine/AudioEngine.Processing.DSPCoreDouble.cpp
// (lines 107-224); build_and_dump.sh extracts those two functions
// verbatim into /tmp/softclip_extract.inc at dump-build time (the
// reference code itself never enters the repo — only vectors do).
// Drives both the AVX2 4-lane path and the scalar tail (odd block
// sizes) across a grid of (threshold, knee, asymmetry) params.
#include <bit>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <immintrin.h>
#include <vector>

#ifndef jassert
#define jassert(x) ((void)0)
#endif
#include "dsp/math/FastTanhApprox.h"

namespace juce {
template <typename T>
inline T jlimit(T lo, T hi, T v) noexcept {
    return v < lo ? lo : (hi < v ? hi : v);
}
}  // namespace juce

inline double absNoLibm(double x) noexcept {  // AudioEngine.h:134
    const auto bits = std::bit_cast<uint64_t>(x) & 0x7FFFFFFFFFFFFFFFULL;
    return std::bit_cast<double>(bits);
}

#include "/tmp/softclip_extract.inc"

static void dump_array(const char* name, const double* a, size_t n,
                       bool last) {
    std::printf("  \"%s\": [", name);
    for (size_t i = 0; i < n; ++i)
        std::printf("%.17g%s", a[i], i + 1 < n ? "," : "");
    std::printf("]%s\n", last ? "" : ",");
}

int main() {
    constexpr int N = 1003;  // odd: exercises the scalar tail too
    std::vector<double> in(N);
    for (int i = 0; i < N; ++i)
        in[i] = 1.4 * std::sin(2.0 * M_PI * 997.0 * i / 48000.0)
              + 0.3 * std::sin(2.0 * M_PI * 53.0 * i / 48000.0);

    std::printf("{\n");
    dump_array("input", in.data(), N, false);

    // param grid: saturation 0.1 / 0.5 / 0.9 via the engine's derivation
    // (clipThreshold = 0.95 - 0.45 s, knee = 0.05 + 0.35 s, asym = 0.10 s,
    //  DSPCoreDouble.cpp:471-501)
    const double sats[3] = {0.1, 0.5, 0.9};
    for (int k = 0; k < 3; ++k) {
        const double s = sats[k];
        const double thr = 0.95 - 0.45 * s;
        const double knee = 0.05 + 0.35 * s;
        const double asym = 0.10 * s;
        std::vector<double> y(in);
        double prev = 0.0;
        softClipBlockAVX2(y.data(), N, thr, knee, asym, prev);
        char name[32];
        std::snprintf(name, sizeof name, "sat_%d", k);
        dump_array(name, y.data(), N, k == 2);
    }

    std::printf("}\n");
    return 0;
}
