// Ground truth from the reference's ACTUAL resampler: the vendored
// r8brain-free-src CDSPResampler (MIT), driven with the exact parameters
// and chunk/flush/trim loop of src/IRDSP.cpp:1-142 (transBand=2.0,
// stopBandAtten=140 dB, linear phase, chunk 2048, getMaxOutLen sizing,
// nullptr flush loop).  Our ir/resample.py is an independent polyphase
// design meeting the same spec, NOT a port — so the parity test bounds
// in-band equivalence (both must reproduce the ideal bandlimited
// resample to ~stop-band depth for in-band signals), not bit equality.
#include <cmath>
#include <cstdio>
#include <cstring>
#include <vector>

#include "CDSPResampler.h"

static void dump_array(const char* name, const double* a, size_t n,
                       bool last) {
    std::printf("    \"%s\": [", name);
    for (size_t i = 0; i < n; ++i)
        std::printf("%.17g%s", a[i], i + 1 < n ? "," : "");
    std::printf("]%s\n", last ? "" : ",");
}

// IRDSP.cpp's loop, mono: chunked feed, flush, trim to done.
static std::vector<double> resample_ref(const std::vector<double>& in,
                                        double inSR, double outSR) {
    const int inLength = (int)in.size();
    r8b::CDSPResampler res(inSR, outSR, inLength, 2.0, 140.0,
                           r8b::fprLinearPhase);
    const int maxOutLen = res.getMaxOutLen(inLength);
    std::vector<double> out((size_t)maxOutLen, 0.0);
    const int chunkSize = 2048;  // cfg.chunkSizeBase clamped [1024,8192]
    int inputProcessed = 0, done = 0;
    while (inputProcessed < inLength && done < maxOutLen) {
        const int chunk = std::min(chunkSize, inLength - inputProcessed);
        std::vector<double> tempIn(in.begin() + inputProcessed,
                                   in.begin() + inputProcessed + chunk);
        double* r8bOutput = nullptr;
        const int generated = res.process(tempIn.data(), chunk, r8bOutput);
        inputProcessed += chunk;
        if (generated > 0) {
            const int toCopy = std::min(generated, maxOutLen - done);
            std::memcpy(out.data() + done, r8bOutput,
                        (size_t)toCopy * sizeof(double));
            done += toCopy;
        }
    }
    while (done < maxOutLen) {
        double* r8bOutput = nullptr;
        const int generated = res.process(nullptr, 0, r8bOutput);
        if (generated <= 0) break;
        const int toCopy = std::min(generated, maxOutLen - done);
        std::memcpy(out.data() + done, r8bOutput,
                    (size_t)toCopy * sizeof(double));
        done += toCopy;
    }
    out.resize((size_t)done);
    return out;
}

// Deterministic IR-like multitone: decaying envelope over tones kept
// below `bw_frac` of the NARROWER Nyquist so all content sits in both
// filters' passbands (the two designs only differ in/past the
// transition band).
static std::vector<double> make_signal(int n, double inSR, double minSR,
                                       double bw_frac) {
    std::vector<double> x((size_t)n, 0.0);
    const double nyq = 0.5 * minSR * bw_frac;
    const int K = 40;
    for (int k = 0; k < K; ++k) {
        // log-spaced 30 Hz .. bw_frac*nyquist, deterministic phases
        const double f = 30.0 * std::pow(nyq / 30.0, k / (double)(K - 1));
        const double ph = 2.0 * M_PI * ((k * 2654435761u % 1000003u)
                                        / 1000003.0);
        const double amp = 1.0 / std::sqrt((double)K);
        for (int i = 0; i < n; ++i)
            x[(size_t)i] += amp * std::sin(2.0 * M_PI * f * i / inSR + ph);
    }
    // decay envelope + raised-cosine fade-in: an abrupt onset is a
    // broadband step that excites the transition band, where two
    // different 140 dB designs legitimately differ — the in-band
    // equivalence claim needs the signal to actually be in-band.
    const int fade = 512;
    for (int i = 0; i < n; ++i) {
        double w = std::exp(-i / (n / 6.0));
        if (i < fade)
            w *= 0.5 * (1.0 - std::cos(M_PI * i / fade));
        x[(size_t)i] *= w;
    }
    return x;
}

int main() {
    struct Case { double inSR, outSR; int n; };
    const Case cases[] = {
        {44100.0, 48000.0, 6000},
        {48000.0, 44100.0, 6000},
        {96000.0, 48000.0, 8000},
        {44100.0, 96000.0, 4000},
    };
    std::printf("{\n  \"cases\": [\n");
    const int nc = (int)(sizeof(cases) / sizeof(cases[0]));
    for (int c = 0; c < nc; ++c) {
        const auto& cs = cases[c];
        auto x = make_signal(cs.n, cs.inSR, std::min(cs.inSR, cs.outSR),
                             0.85);
        auto y = resample_ref(x, cs.inSR, cs.outSR);
        std::printf("  {\n");
        std::printf("    \"in_sr\": %.17g, \"out_sr\": %.17g,\n",
                    cs.inSR, cs.outSR);
        dump_array("input", x.data(), x.size(), false);
        dump_array("output", y.data(), y.size(), true);
        std::printf("  }%s\n", c + 1 < nc ? "," : "");
    }
    std::printf("  ]\n}\n");
    return 0;
}
