// Dump ground truth from the reference's metering units:
//  - TruePeakDetector.cpp: BS.1770 true peak via 2x(2x) 63/31-tap
//    linear-phase interpolation stages — per-block true peak values
//  - LoudnessMeter.cpp: K-weighting (per-rate coefficients derived from
//    the analog prototypes) + channel-weighted block mean-square, read
//    back through the meter's own SPSC ring
// Both deterministic; vectors pin models/metering.py.
#include <cmath>
#include <cstdio>
#include <vector>

#ifndef jassert
#define jassert(x) ((void)0)
#endif
#include "TruePeakDetector.h"
#include "LoudnessMeter.h"

static constexpr int BLOCK = 512;
static constexpr int NBLOCKS = 8;

static void dump_array(const char* name, const double* a, size_t n,
                       bool last) {
    std::printf("  \"%s\": [", name);
    for (size_t i = 0; i < n; ++i)
        std::printf("%.17g%s", a[i], i + 1 < n ? "," : "");
    std::printf("]%s\n", last ? "" : ",");
}

int main() {
    const int n = BLOCK * NBLOCKS;
    std::vector<double> inL(n), inR(n);
    for (int i = 0; i < n; ++i) {
        // inter-sample-peak-rich content: near-Nyquist tone + mid tone
        inL[i] = 0.55 * std::sin(2.0 * M_PI * 11900.0 * i / 48000.0)
               + 0.25 * std::sin(2.0 * M_PI * 997.0 * i / 48000.0);
        inR[i] = 0.45 * std::cos(2.0 * M_PI * 9500.0 * i / 48000.0)
               + 0.30 * std::sin(2.0 * M_PI * 123.0 * i / 48000.0);
    }

    std::printf("{\n");
    dump_array("input_l", inL.data(), n, false);
    dump_array("input_r", inR.data(), n, false);
    std::printf("  \"block\": %d,\n", BLOCK);

    for (double sr : {48000.0, 96000.0}) {
        {
            TruePeakDetector tp;
            tp.prepare(sr, BLOCK);
            std::vector<double> peaks;
            for (int b = 0; b < NBLOCKS; ++b)
                peaks.push_back(tp.processBlock(inL.data() + b * BLOCK,
                                                inR.data() + b * BLOCK,
                                                BLOCK));
            char name[64];
            std::snprintf(name, sizeof name, "truepeak_%dk",
                          static_cast<int>(sr / 1000.0));
            dump_array(name, peaks.data(), peaks.size(), false);
        }
        {
            LoudnessMeter lm;
            lm.prepare(sr, BLOCK);
            std::vector<double> ms, pk;
            for (int b = 0; b < NBLOCKS; ++b) {
                lm.processBlock(inL.data() + b * BLOCK,
                                inR.data() + b * BLOCK, BLOCK);
                LoudnessMeter::BlockPower bp;
                while (lm.getRingBuffer().pop(bp)) {
                    ms.push_back(bp.meanSquare);
                    pk.push_back(bp.peakLinear);
                }
            }
            char name[64];
            std::snprintf(name, sizeof name, "kweight_meansq_%dk",
                          static_cast<int>(sr / 1000.0));
            dump_array(name, ms.data(), ms.size(), false);
            std::snprintf(name, sizeof name, "block_peak_%dk",
                          static_cast<int>(sr / 1000.0));
            dump_array(name, pk.data(), pk.size(), sr == 96000.0);
        }
    }

    std::printf("}\n");
    return 0;
}
