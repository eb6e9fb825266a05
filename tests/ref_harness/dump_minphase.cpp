// Ground-truth vector dump for the reference's loader-thread phase
// converters: convertToMinimumPhase
// (src/convolver/ConvolverProcessor.ResampleAndFallback.cpp:333-469) and
// convertToMixedPhaseFallback
// (src/convolver/ConvolverProcessor.MixedPhase.cpp:721-866), plus the
// Internal.h helpers they call (checkCancellation, unwrapPhaseRadians).
// The function bodies are extracted VERBATIM from the reference at
// dump-build time (see build_and_dump.sh); reference code never enters
// the repo — only the dumped vectors do.  DFTI/VML are provided by the
// portable stub headers (radix-2 FFT, exact elementwise ops).
//
// Every case dumps its exact input arrays, so the Python parity tests
// consume bit-identical inputs (no cross-libm drift).
#include <immintrin.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <vector>

#include <JuceHeader.h>
#include "AlignedAllocation.h"
#include "DftiHandle.h"
#include <mkl.h>
#include <mkl_vml.h>

namespace ConvolverProcessorInternal {
#include "/tmp/minphase_internal.inc"   // checkCancellation, unwrapPhaseRadians
#include "/tmp/minphase_extract.inc"    // convertToMinimumPhase
#include "/tmp/mixedfallback_extract.inc"  // convertToMixedPhaseFallback
}  // namespace ConvolverProcessorInternal

using ConvolverProcessorInternal::convertToMinimumPhase;
using ConvolverProcessorInternal::convertToMixedPhaseFallback;

// Deterministic xorshift64* uniform in [-0.5, 0.5) (shared with dump_nuc)
struct XS {
    uint64_t s;
    explicit XS(uint64_t seed) : s(seed) {}
    double next() {
        s ^= s >> 12;
        s ^= s << 25;
        s ^= s >> 27;
        const uint64_t r = s * 2685821657736338717ULL;
        return static_cast<double>(r >> 11) * (1.0 / 9007199254740992.0)
               - 0.5;
    }
};

static void dump_array(const char* name, const double* a, int n,
                       const char* tail) {
    std::printf("\"%s\": [", name);
    for (int i = 0; i < n; ++i)
        std::printf("%.17g%s", a[i], i + 1 < n ? "," : "");
    std::printf("]%s", tail);
}

static juce::AudioBuffer<double> make_buffer(
    const std::vector<std::vector<double>>& chans) {
    juce::AudioBuffer<double> b(static_cast<int>(chans.size()),
                                static_cast<int>(chans[0].size()));
    for (size_t c = 0; c < chans.size(); ++c)
        std::memcpy(b.getWritePointer(static_cast<int>(c)), chans[c].data(),
                    sizeof(double) * chans[c].size());
    return b;
}

// IR generators: decaying xorshift noise (well-conditioned spectrum),
// optionally with an early dominant spike so peakDelay is interesting.
static std::vector<double> noise_ir(uint64_t seed, int n, double tau,
                                    int spike_at, double spike) {
    XS rng(seed);
    std::vector<double> v(static_cast<size_t>(n));
    for (int i = 0; i < n; ++i)
        v[static_cast<size_t>(i)] =
            rng.next() * std::exp(-static_cast<double>(i) / tau);
    if (spike_at >= 0 && spike_at < n) v[static_cast<size_t>(spike_at)] += spike;
    return v;
}

int main() {
    struct MpCase {
        const char* name;
        std::vector<std::vector<double>> chans;
    };
    std::vector<MpCase> mp_cases;
    mp_cases.push_back({"mp_noise1000",
                        {noise_ir(0x1111, 1000, 300.0, 0, 2.0)}});
    mp_cases.push_back({"mp_nonpow2_777",
                        {noise_ir(0x2222, 777, 120.0, 37, 3.0)}});
    mp_cases.push_back({"mp_long4096",
                        {noise_ir(0x3333, 4096, 900.0, 5, 1.5)}});
    mp_cases.push_back({"mp_stereo500",
                        {noise_ir(0x4444, 500, 150.0, 0, 2.0),
                         noise_ir(0x5555, 500, 150.0, 3, 2.5)}});

    std::printf("{\n\"minphase\": [\n");
    std::vector<juce::AudioBuffer<double>> mp_results;
    for (size_t ci = 0; ci < mp_cases.size(); ++ci) {
        const auto& c = mp_cases[ci];
        auto lin = make_buffer(c.chans);
        auto mp = convertToMinimumPhase(lin, {}, nullptr);
        mp_results.push_back(mp);
        std::printf("{\"name\": \"%s\", \"channels\": %d, \"n\": %d,\n",
                    c.name, lin.getNumChannels(), lin.getNumSamples());
        for (int ch = 0; ch < lin.getNumChannels(); ++ch) {
            char key[32];
            std::snprintf(key, sizeof key, "input_%d", ch);
            dump_array(key, lin.getReadPointer(ch), lin.getNumSamples(),
                       ",\n");
            std::snprintf(key, sizeof key, "output_%d", ch);
            dump_array(key, mp.getReadPointer(ch), mp.getNumSamples(),
                       ch + 1 < lin.getNumChannels() ? ",\n" : "\n");
        }
        std::printf("}%s\n", ci + 1 < mp_cases.size() ? "," : "");
    }
    std::printf("],\n");

    // Mixed-phase fallback: linear + its own min-phase (as the loader
    // pipeline pairs them), across transition bands and channel counts.
    struct FbCase {
        const char* name;
        size_t mp_index;           // which mp case supplies (linear, minimum)
        double lo, hi;
    };
    const FbCase fb_cases[] = {
        {"fb_noise1000_200_700", 0, 200.0, 700.0},
        {"fb_nonpow2_1000_8000", 1, 1000.0, 8000.0},
        {"fb_long_250_2500", 2, 250.0, 2500.0},
        {"fb_stereo_300_3000", 3, 300.0, 3000.0},
    };
    const size_t n_fb = sizeof(fb_cases) / sizeof(fb_cases[0]);
    std::printf("\"fallback\": [\n");
    for (size_t ci = 0; ci < n_fb; ++ci) {
        const auto& c = fb_cases[ci];
        auto lin = make_buffer(mp_cases[c.mp_index].chans);
        const auto& mp = mp_results[c.mp_index];
        auto mixed = convertToMixedPhaseFallback(lin, mp, 48000.0, c.lo,
                                                 c.hi, 25.0, {}, nullptr);
        std::printf("{\"name\": \"%s\", \"mp_case\": \"%s\", "
                    "\"lo\": %g, \"hi\": %g, \"channels\": %d,\n",
                    c.name, mp_cases[c.mp_index].name, c.lo, c.hi,
                    mixed.getNumChannels());
        for (int ch = 0; ch < mixed.getNumChannels(); ++ch) {
            char key[32];
            std::snprintf(key, sizeof key, "output_%d", ch);
            dump_array(key, mixed.getReadPointer(ch), mixed.getNumSamples(),
                       ch + 1 < mixed.getNumChannels() ? ",\n" : "\n");
        }
        std::printf("}%s\n", ci + 1 < n_fb ? "," : "");
    }
    std::printf("]\n}\n");
    return 0;
}
