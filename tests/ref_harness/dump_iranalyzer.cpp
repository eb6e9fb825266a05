// Ground-truth vector dump for the reference's IRAnalyzer: compiles
// src/IRAnalyzer.cpp UNMODIFIED (self-contained radix-2 FFT; only JUCE
// surface is AudioBuffer/nextPowerOfTwo, provided by the stub header)
// and dumps estimateMaxFrequencyResponseGain over IR shapes that
// exercise the Tukey window, coherent-gain correction, the 65,536-sample
// analysis cap, and the 3-point Gaussian interpolation
// (src/IRAnalyzer.cpp:63-157, src/IRAnalyzer.h:19-50).
// Only the dumped vectors JSON is committed.
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <vector>

#include <JuceHeader.h>
#include "IRAnalyzer.h"

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

int main() {
    struct Case {
        const char* name;
        std::vector<double> ir;
    };
    std::vector<Case> cases;

    // flat-ish noise IR (peak near window gain)
    {
        XS r(0xA1);
        std::vector<double> v(3000);
        for (size_t i = 0; i < v.size(); ++i)
            v[i] = r.next() * std::exp(-static_cast<double>(i) / 600.0);
        cases.push_back({"noise3000", v});
    }
    // pure tone burst: sharp spectral peak between bins (Gaussian interp)
    {
        std::vector<double> v(4096);
        for (size_t i = 0; i < v.size(); ++i)
            v[i] = std::sin(2.0 * M_PI * 997.3 * static_cast<double>(i)
                            / 48000.0)
                   * 0.5;
        cases.push_back({"tone_offbin", v});
    }
    // two tones + noise floor
    {
        XS r(0xB2);
        std::vector<double> v(10000);
        for (size_t i = 0; i < v.size(); ++i) {
            const double t = static_cast<double>(i);
            v[i] = 0.4 * std::sin(2.0 * M_PI * t * 0.013)
                 + 0.3 * std::sin(2.0 * M_PI * t * 0.171)
                 + 0.01 * r.next();
        }
        cases.push_back({"twotone", v});
    }
    // longer than the 65,536 analysis cap (only the head is analyzed)
    {
        XS r(0xC3);
        std::vector<double> v(100000);
        for (size_t i = 0; i < v.size(); ++i)
            v[i] = r.next() * std::exp(-static_cast<double>(i) / 20000.0);
        // put a strong late tone AFTER the cap: must not affect the result
        for (size_t i = 70000; i < v.size(); ++i)
            v[i] += 0.8 * std::sin(2.0 * M_PI * static_cast<double>(i) * 0.02);
        cases.push_back({"long_capped", v});
    }
    // tiny IRs (edge: fftSize < 2 guard, small windows)
    cases.push_back({"one_tap", {0.7}});
    cases.push_back({"three_tap", {0.5, -0.25, 0.125}});
    // dirac (flat spectrum)
    {
        std::vector<double> v(512, 0.0);
        v[0] = 1.0;
        cases.push_back({"dirac512", v});
    }

    std::printf("{\n\"cases\": [\n");
    for (size_t ci = 0; ci < cases.size(); ++ci) {
        const auto& c = cases[ci];
        juce::AudioBuffer<double> b(1, static_cast<int>(c.ir.size()));
        for (size_t i = 0; i < c.ir.size(); ++i)
            b.getWritePointer(0)[i] = c.ir[i];
        const double g = IRAnalyzer::estimateMaxFrequencyResponseGain(b);
        std::printf("{\"name\": \"%s\", \"n\": %zu, \"gain\": %.17g,\n",
                    c.name, c.ir.size(), g);
        // dump at most the first 4096 samples; the rest is reproducible
        // from the generators above, but every case <= 10k dumps fully
        const int dn = c.ir.size() <= 10000 ? static_cast<int>(c.ir.size())
                                            : 0;
        if (dn) {
            dump_array("ir", c.ir.data(), dn, "\n");
        } else {
            std::printf("\"ir\": null\n");
        }
        std::printf("}%s\n", ci + 1 < cases.size() ? "," : "");
    }
    std::printf("]\n}\n");
    return 0;
}
