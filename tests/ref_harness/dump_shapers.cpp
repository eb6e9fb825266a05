// Dump ground-truth vectors from the reference's own noise shapers.
//
// FixedNoiseShaper.h (4th-order), Fixed15TapNoiseShaper.h (16th-order) and
// LatticeNoiseShaper.h (9th-order lattice) are pure headers with
// deterministic internal RNGs (Xoshiro256++ with constant seeds /
// splitmix64 seeded from (sampleRate, bitDepth)), so their quantized
// output for a fixed input is exact ground truth for the rebuild's
// error-feedback quantizers (convopeq_tpu/models/dither.py).
//
// Compiled against the read-only reference checkout with a minimal JUCE
// stub (stub_include/JuceHeader.h); only the dumped vectors enter the
// repo.  Inputs are dumped alongside outputs with %.17g so the Python
// side reproduces them bit-exactly.
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <vector>

// jassert is a JUCE macro; DspNumericPolicy.h asserts thread roles with
// it and provides the killDenormal/replaceNonFiniteWithZero helpers the
// shaper headers use (visible transitively in the reference build).
#ifndef jassert
#define jassert(x) ((void)0)
#endif
#include "DspNumericPolicy.h"

#include "FixedNoiseShaper.h"
#include "Fixed15TapNoiseShaper.h"
#include "LatticeNoiseShaper.h"
// (PsychoacousticDither has its own dump TU: dump_psycho.cpp)

static constexpr int N = 2048;
static constexpr double SR = 48000.0;
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
        inL[i] = 0.37 * std::sin(2.0 * M_PI * 997.0 * i / SR)
               + 0.05 * std::sin(2.0 * M_PI * 31.0 * i / SR);
        inR[i] = 0.29 * std::cos(2.0 * M_PI * 1471.0 * i / SR);
    }

    std::printf("{\n");
    dump_array("input_l", inL.data(), N, false);
    dump_array("input_r", inR.data(), N, false);
    std::printf("  \"sample_rate\": %.17g,\n", SR);
    std::printf("  \"headroom\": %.17g,\n", HEADROOM);

    // ---- FixedNoiseShaper (4th order), 16- and 24-bit -------------------
    for (int bits : {16, 24}) {
        convo::FixedNoiseShaper f4;
        f4.prepare(SR, bits);
        std::vector<double> L(inL), R(inR);
        f4.processStereoBlock(L.data(), R.data(), N, HEADROOM);
        char nameL[64], nameR[64];
        std::snprintf(nameL, sizeof nameL, "fixed4_%dbit_l", bits);
        std::snprintf(nameR, sizeof nameR, "fixed4_%dbit_r", bits);
        dump_array(nameL, L.data(), N, false);
        dump_array(nameR, R.data(), N, false);
    }

    // ---- Fixed15Tap (16th order), 16-bit --------------------------------
    {
        convo::Fixed15TapNoiseShaper f15;
        f15.prepare(SR, 16);
        std::vector<double> L(inL), R(inR);
        f15.processStereoBlock(L.data(), R.data(), N, HEADROOM);
        dump_array("fixed15_16bit_l", L.data(), N, false);
        dump_array("fixed15_16bit_r", R.data(), N, false);
    }

    // ---- LatticeNoiseShaper (9th order), 16-bit -------------------------
    {
        LatticeNoiseShaper lat;  // global namespace in the reference
        lat.prepare(16);
        const double k[9] = {0.2, -0.15, 0.1, -0.08, 0.06,
                             -0.04, 0.03, -0.02, 0.01};
        lat.setCoefficients(k, 9);
        std::vector<double> L(inL), R(inR);
        lat.processStereoBlock(L.data(), R.data(), N, HEADROOM);
        dump_array("lattice_16bit_l", L.data(), N, false);
        dump_array("lattice_16bit_r", R.data(), N, false);
    }

    // ---- Lattice long-horizon drift probe -------------------------------
    // 320k samples through the reference's own lattice with a
    // learner-produced coefficient bank (the rebuild's 48k/16 factory
    // bank): per-32k-window noise RMS in LSB units documents whether the
    // ladder's unipotent state coupling drifts into its +-2.0 clamp on
    // the REFERENCE binary too (same structure, advanceState
    // LatticeNoiseShaper.h:258-283).
    {
        const int NL = 320000;
        std::vector<double> xL(NL), xR(NL);
        for (int i = 0; i < NL; ++i) {
            xL[i] = 0.37 * std::sin(2.0 * M_PI * 997.0 * i / SR)
                  + 0.05 * std::sin(2.0 * M_PI * 31.0 * i / SR);
            xR[i] = 0.29 * std::cos(2.0 * M_PI * 1471.0 * i / SR);
        }
        LatticeNoiseShaper lat;
        lat.prepare(16);
        const double k[9] = {-0.18845354367844672, 0.10410322511194921,
                             0.23581883988286004, 0.12979551027980982,
                             0.41149756090684103, -0.3071548637209,
                             -0.46457321791269673, -0.07147346447828133,
                             -0.1523930498659561};
        lat.setCoefficients(k, 9);
        std::vector<double> L(xL), R(xR);
        lat.processStereoBlock(L.data(), R.data(), NL, HEADROOM);
        const double lsb = 1.0 / 32768.0;
        std::printf("  \"lattice_long_window_rms_lsb\": [");
        const int W = 32000;
        for (int w = 0; w < NL / W; ++w) {
            double acc = 0.0;
            for (int i = w * W; i < (w + 1) * W; ++i) {
                const double e = L[i] - xL[i] * HEADROOM;
                acc += e * e;
            }
            std::printf("%.6g%s", std::sqrt(acc / W) / lsb,
                        w + 1 < NL / W ? "," : "");
        }
        std::printf("],\n");
        dump_array("lattice_long_tail_l", L.data() + NL - 256, 256, true);
    }

    std::printf("}\n");
    return 0;
}
