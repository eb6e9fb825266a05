// Dump ground truth from the reference's OutputFilter (RBJ biquad
// tables + DF2T cascades): block outputs for every mode combination at
// two sample rates — deterministic, pins models/output_filter.py.
#include <cmath>
#include <cstdio>
#include <vector>

#ifndef jassert
#define jassert(x) ((void)0)
#endif
#include "OutputFilter.h"

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
        inL[i] = 0.4 * std::sin(2.0 * M_PI * 1000.0 * i / 48000.0)
               + 0.2 * std::sin(2.0 * M_PI * 15000.0 * i / 48000.0)
               + 0.1 * std::sin(2.0 * M_PI * 10.0 * i / 48000.0);
        inR[i] = 0.35 * std::cos(2.0 * M_PI * 440.0 * i / 48000.0)
               + 0.15 * std::cos(2.0 * M_PI * 19000.0 * i / 48000.0);
    }

    std::printf("{\n");
    dump_array("input_l", inL.data(), N, false);
    dump_array("input_r", inR.data(), N, false);

    const double rates[2] = {48000.0, 96000.0};
    for (int s = 0; s < 2; ++s) {
        const int srk = static_cast<int>(rates[s] / 1000.0);
        // conv-last: HC x LC mode grid
        for (int hc = 0; hc < 3; ++hc)
            for (int lc = 0; lc < 2; ++lc) {
                convo::OutputFilter of;
                of.prepare(rates[s]);
                of.reset();
                std::vector<double> L(inL), R(inR);
                double* chans[2] = {L.data(), R.data()};
                juce::dsp::AudioBlock<double> blk(chans, 2,
                                                  static_cast<size_t>(N));
                of.process(blk, true, static_cast<convo::HCMode>(hc),
                           static_cast<convo::LCMode>(lc),
                           convo::HCMode::Natural);
                char name[64];
                std::snprintf(name, sizeof name, "conv_%dk_hc%d_lc%d_l",
                              srk, hc, lc);
                dump_array(name, L.data(), N, false);
                std::snprintf(name, sizeof name, "conv_%dk_hc%d_lc%d_r",
                              srk, hc, lc);
                dump_array(name, R.data(), N, false);
            }
        // eq-last: LP mode grid (HPF fixed)
        for (int lp = 0; lp < 3; ++lp) {
            convo::OutputFilter of;
            of.prepare(rates[s]);
            of.reset();
            std::vector<double> L(inL), R(inR);
            double* chans[2] = {L.data(), R.data()};
            juce::dsp::AudioBlock<double> blk(chans, 2,
                                              static_cast<size_t>(N));
            of.process(blk, false, convo::HCMode::Natural,
                       convo::LCMode::Natural,
                       static_cast<convo::HCMode>(lp));
            char name[64];
            std::snprintf(name, sizeof name, "eq_%dk_lp%d_l", srk, lp);
            dump_array(name, L.data(), N, false);
            std::snprintf(name, sizeof name, "eq_%dk_lp%d_r", srk, lp);
            const bool last = (s == 1) && (lp == 2);
            dump_array(name, R.data(), N, last);
        }
    }

    std::printf("}\n");
    return 0;
}
