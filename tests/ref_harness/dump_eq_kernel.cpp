// Ground-truth vector dump for the EQ per-sample TPT-SVF kernel — executes
// the REFERENCE's own function bodies (src/eqprocessor/EQProcessor.
// Processing.cpp:21-277): build_and_dump.sh extracts the anonymous-
// namespace helpers plus processBand / processBandStereo verbatim into
// /tmp/eq_kernel_extract.inc at build time, and the coefficient functions
// into /tmp/svf_extract.inc (same extraction the SVF-coefficient dump
// uses), so every number below is produced by the reference's code, not a
// re-implementation.  Only the dumped vectors/ JSON is committed.
//
// This pins the sequential IIR recurrence the rebuild recasts as an
// associative scan (ops/svf.py::svf_process), including the
// saturation tanh blend (scalar 27/9 Pade form vs the SSE2 clamped form),
// the non-finite/1e15 output sanitize, the +-100 output clamp, and the
// cross-block state carry with denormal kill.
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <vector>

#ifndef jassert
#define jassert(x) ((void)0)
#endif
#define jassertfalse ((void)0)
#include "DspNumericPolicy.h"        // killDenormal/killDenormalV, policy
#include "dsp/math/FastTanhApprox.h" // convo::dsp::fastTanh / fastTanhV128

enum class EQBandType { LowShelf, Peaking, HighShelf, LowPass, HighPass };

struct EQCoeffsSVF {
    double g = 0.0, k = 0.0, a1 = 0.0, a2 = 0.0, a3 = 0.0;
    double m0 = 1.0, m1 = 0.0, m2 = 0.0;
};

// clamp constants (EQProcessor.h:174-180) for the extracted coefficient code
static constexpr float DSP_MIN_FREQ = 20.0f;
static constexpr float DSP_MAX_FREQ = 20000.0f;
static constexpr float DSP_MAX_FREQ_NYQUIST_RATIO = 0.95f;
static constexpr float DSP_MIN_Q = 0.01f;
static constexpr float DSP_MAX_Q = 20.0f;
static constexpr float DSP_MIN_GAIN_DB = -48.0f;
static constexpr float DSP_MAX_GAIN_DB = 48.0f;

void validateAndClampParameters(float& freq, float& gainDb, float& q,
                                double sr) noexcept;
EQCoeffsSVF calcLowShelfSVF(double, double, double, double) noexcept;
EQCoeffsSVF calcPeakingSVF(double, double, double, double) noexcept;
EQCoeffsSVF calcHighShelfSVF(double, double, double, double) noexcept;
EQCoeffsSVF calcLowPassSVF(double, double, double) noexcept;
EQCoeffsSVF calcHighPassSVF(double, double, double) noexcept;
EQCoeffsSVF calcSVFCoeffs(EQBandType, float, float, float, double) noexcept;

#include "/tmp/svf_extract.inc"
#include "/tmp/eq_kernel_extract.inc"

static constexpr int N = 2048;       // total samples
static constexpr int BLOCK = 512;    // processed in 4 blocks (state carry)
static constexpr double SR = 48000.0;

static void dump_array(const char* name, const double* a, int n,
                       const char* tail) {
    std::printf("\"%s\": [", name);
    for (int i = 0; i < n; ++i)
        std::printf("%.17g%s", a[i], i + 1 < n ? "," : "");
    std::printf("]%s\n", tail);
}

int main() {
    std::vector<double> inL(N), inR(N);
    for (int i = 0; i < N; ++i) {
        // dense multitone + slow LF content; |x| <= ~0.9
        inL[i] = 0.31 * std::sin(2.0 * M_PI * 997.0 * i / SR)
               + 0.22 * std::sin(2.0 * M_PI * 113.0 * i / SR + 0.3)
               + 0.17 * std::sin(2.0 * M_PI * 6301.0 * i / SR + 1.1)
               + 0.09 * std::sin(2.0 * M_PI * 17.0 * i / SR);
        inR[i] = 0.27 * std::cos(2.0 * M_PI * 1471.0 * i / SR)
               + 0.21 * std::sin(2.0 * M_PI * 61.0 * i / SR + 0.7)
               + 0.12 * std::sin(2.0 * M_PI * 9973.0 * i / SR);
    }

    struct Case {
        EQBandType type; float freq, gain, q; double sat;
    };
    // includes near-DC poles (precision stressors for the scan recast)
    // and saturated bands (tanh blend path, both SIMD forms)
    const Case cases[] = {
        {EQBandType::LowShelf,  80.0f,   6.0f, 0.9f,  0.0},
        {EQBandType::Peaking,   1000.0f, -5.0f, 2.0f, 0.0},
        {EQBandType::Peaking,   3137.0f, 4.0f, 1.1f,  0.35},
        {EQBandType::HighShelf, 9000.0f, 3.5f, 0.7f,  0.0},
        {EQBandType::LowPass,   12000.0f, 0.0f, 0.707f, 0.0},
        {EQBandType::HighPass,  30.0f,   0.0f, 0.8f,  0.0},
        {EQBandType::Peaking,   40.0f,   8.0f, 5.0f,  0.15},
        {EQBandType::HighShelf, 15500.0f, -7.0f, 1.3f, 0.6},
    };

    std::printf("{\n");
    dump_array("input_l", inL.data(), N, ",");
    dump_array("input_r", inR.data(), N, ",");
    std::printf("\"sample_rate\": %.17g,\n", SR);
    std::printf("\"block\": %d,\n", BLOCK);
    std::printf("\"bands\": [\n");

    bool first = true;
    for (const Case& cs : cases) {
        const EQCoeffsSVF c =
            calcSVFCoeffs(cs.type, cs.freq, cs.gain, cs.q, SR);

        // scalar path, 4 blocks of 512 with state carry
        std::vector<double> ys(inL);
        double stateS[2] = {0.0, 0.0};
        for (int b = 0; b < N; b += BLOCK)
            processBand(ys.data() + b, BLOCK, c, stateS, cs.sat);

        // stereo SSE2 path (independent L/R states)
        std::vector<double> yl(inL), yr(inR);
        double stateL[2] = {0.0, 0.0}, stateR[2] = {0.0, 0.0};
        for (int b = 0; b < N; b += BLOCK)
            processBandStereo(yl.data() + b, yr.data() + b, BLOCK, c,
                              stateL, stateR, cs.sat);

        std::printf("%s{\"type\": %d, \"freq\": %.9g, \"gain_db\": %.9g, "
                    "\"q\": %.9g, \"saturation\": %.17g,\n",
                    first ? "" : ",", (int)cs.type, cs.freq, cs.gain,
                    cs.q, cs.sat);
        first = false;
        std::printf("\"a1\": %.17g, \"a2\": %.17g, \"a3\": %.17g, "
                    "\"m0\": %.17g, \"m1\": %.17g, \"m2\": %.17g,\n",
                    c.a1, c.a2, c.a3, c.m0, c.m1, c.m2);
        dump_array("scalar_out", ys.data(), N, ",");
        std::printf("\"scalar_state\": [%.17g,%.17g],\n",
                    stateS[0], stateS[1]);
        dump_array("stereo_out_l", yl.data(), N, ",");
        dump_array("stereo_out_r", yr.data(), N, ",");
        std::printf("\"stereo_state_l\": [%.17g,%.17g],\n",
                    stateL[0], stateL[1]);
        std::printf("\"stereo_state_r\": [%.17g,%.17g]}\n",
                    stateR[0], stateR[1]);
    }
    std::printf("]\n}\n");
    return 0;
}
