// Ground-truth vectors from the reference's PsychoacousticDither.
//
// The stub mkl_vsl.h fails vslNewStream, so the reference runs its
// deterministic SplitMix64-seeded xorshift64* fallback RNG
// (PsychoacousticDither.h:37-50,477-489) — exact ground truth for
// psycho_dither + psycho_fallback_uniforms (convopeq_tpu/models/dither.py).
//
// Per-sample `process(x*headroom, channel)` is used (not the stereo
// block loop): the error-feedback trajectory is chaotic at the ULP
// level, so the pin requires g++'s codegen for the 12-term feedback sum
// to match XLA:CPU's bit-for-bit.  The single scalar inline instance
// here compiles to one deterministic mul+FMA chain; the stereo block
// loop's two interleaved expression instances vectorize asymmetrically
// (measured: L matched, R flipped at sample ~395).  The build flags
// that reproduce XLA:CPU arithmetic are recorded in build_and_dump.sh.
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <optional>
#include <vector>

#ifndef jassert
#define jassert(x) ((void)0)
#endif
#include "DspNumericPolicy.h"
#include "PsychoacousticDither.h"

static constexpr int N = 2048;
static constexpr double HEADROOM = 0.8912509381337456;  // -1 dBFS

static void dump_array(const char* name, const double* a, int n, bool last) {
    std::printf("  \"%s\": [", name);
    for (int i = 0; i < n; ++i)
        std::printf("%.17g%s", a[i], i + 1 < n ? "," : "");
    std::printf("]%s\n", last ? "" : ",");
}

int main() {
    std::vector<double> inL(N), inR(N);
    for (int i = 0; i < N; ++i) {
        inL[i] = 0.37 * std::sin(2.0 * M_PI * 997.0 * i / 48000.0)
               + 0.05 * std::sin(2.0 * M_PI * 31.0 * i / 48000.0);
        inR[i] = 0.29 * std::cos(2.0 * M_PI * 1471.0 * i / 48000.0);
    }

    std::printf("{\n");
    dump_array("input_l", inL.data(), N, false);
    dump_array("input_r", inR.data(), N, false);
    std::printf("  \"headroom\": %.17g,\n", HEADROOM);
    std::printf("  \"seed\": %llu,\n", 0xC0FFEEULL);

    const struct { double sr; int bits; } cfgs[] = {
        {48000.0, 16}, {48000.0, 24}, {384000.0, 24}};
    for (int c = 0; c < 3; ++c) {
        convo::PsychoacousticDither psy(uint64_t{0xC0FFEE});
        psy.prepare(cfgs[c].sr, cfgs[c].bits);
        std::vector<double> L(N), R(N);
        for (int i = 0; i < N; ++i) {
            L[i] = psy.process(inL[i] * HEADROOM, 0);
            R[i] = psy.process(inR[i] * HEADROOM, 1);
        }
        char nameL[64], nameR[64];
        std::snprintf(nameL, sizeof nameL, "psycho_%dk_%dbit_l",
                      (int)(cfgs[c].sr / 1000.0), cfgs[c].bits);
        std::snprintf(nameR, sizeof nameR, "psycho_%dk_%dbit_r",
                      (int)(cfgs[c].sr / 1000.0), cfgs[c].bits);
        dump_array(nameL, L.data(), N, false);
        dump_array(nameR, R.data(), N, c == 2);
    }

    std::printf("}\n");
    return 0;
}
