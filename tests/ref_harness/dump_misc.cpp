// Dump ground truth from two more pure reference units:
//  - UltraHighRateDCBlocker.h: 2-stage one-pole DC blocker cascade
//    (expm1 alphas, +-10% phase spread, bit-mask denormal gates)
//  - audioengine/SimplePeakLimiter.h: soft-knee peak limiter with
//    instant-attack / exponential-release envelope
// Both are deterministic, so the dumped block outputs are exact ground
// truth for ops/dc_blocker.py and ops/limiter.py.
#include <cmath>
#include <cstdio>
#include <vector>

#ifndef jassert
#define jassert(x) ((void)0)
#endif
#include "UltraHighRateDCBlocker.h"
#include "audioengine/SimplePeakLimiter.h"

static constexpr int N = 1024;

static void dump_array(const char* name, const double* a, size_t n,
                       bool last) {
    std::printf("  \"%s\": [", name);
    for (size_t i = 0; i < n; ++i)
        std::printf("%.17g%s", a[i], i + 1 < n ? "," : "");
    std::printf("]%s\n", last ? "" : ",");
}

int main() {
    std::vector<double> inL(N), inR(N);
    for (int i = 0; i < N; ++i) {
        // DC offset + tone + slow drift: exercises the blocker
        inL[i] = 0.15 + 0.5 * std::sin(2.0 * M_PI * 1000.0 * i / 48000.0)
               + 0.08 * std::sin(2.0 * M_PI * 2.0 * i / 48000.0);
        inR[i] = -0.10 + 0.4 * std::cos(2.0 * M_PI * 313.0 * i / 48000.0);
    }

    std::printf("{\n");
    dump_array("input_l", inL.data(), N, false);
    dump_array("input_r", inR.data(), N, false);

    struct DCfg { double sr, fc; const char* tag; };
    const DCfg dcfg[] = {{48000.0, 3.0, "dc_48k_3hz"},
                         {384000.0, 1.0, "dc_384k_1hz"}};
    for (const auto& c : dcfg) {
        convo::UltraHighRateDCBlocker bl, br;
        bl.init(c.sr, c.fc);
        br.init(c.sr, c.fc);
        std::vector<double> L(inL), R(inR);
        bl.processStereo(L.data(), R.data(), N, br);
        char name[64];
        std::snprintf(name, sizeof name, "%s_l", c.tag);
        dump_array(name, L.data(), N, false);
        std::snprintf(name, sizeof name, "%s_r", c.tag);
        dump_array(name, R.data(), N, false);
    }

    // Limiter: drive partly above threshold; two blocks to exercise the
    // carried envelope
    {
        SimplePeakLimiter lim;
        lim.prepare(48000.0, 80.0);
        lim.reset();
        std::vector<double> L(N), R(N);
        for (int i = 0; i < N; ++i) {
            L[i] = 1.15 * inL[i];
            R[i] = 1.15 * inR[i];
        }
        const double thr = 0.8912509381337456;   // -1 dBFS
        const double knee = 0.12202930310835076; // ~1 dB below
        lim.processBlock(L.data(), R.data(), N / 2, thr, knee);
        lim.processBlock(L.data() + N / 2, R.data() + N / 2, N / 2, thr,
                         knee);
        dump_array("limiter_l", L.data(), N, false);
        dump_array("limiter_r", R.data(), N, true);
    }

    std::printf("}\n");
    return 0;
}
