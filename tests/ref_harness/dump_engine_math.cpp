// Ground truth for four pure engine-math units compiled from the
// reference's own headers/TUs:
//  - input_transform::sanitizeAndLimit (InputBitDepthTransform.h:32-100):
//    AVX2 NaN/Inf flush + denormal gate + [-1,1] clamp, incl. the scalar
//    tail path;
//  - OversamplingPolicy::{maxAllowedFactor,resolve}
//    (audioengine/OversamplingPolicy.h): SR cap grid x requested factors
//    incl. invalid-value Auto fallback;
//  - LinearRamp (DspNumericPolicy.h:319+): juce::SmoothedValue-equivalent
//    ramp — reset/setTargetValue/getNextValue semantics incl. the
//    mid-ramp retarget rule (remaining steps as denominator);
//  - equalPowerSin (extracted verbatim from
//    convolver/ConvolverProcessor.Runtime.cpp:26-31 by build_and_dump.sh
//    into /tmp/equal_power_extract.inc): 9th-order Taylor sine for the
//    equal-power wet/dry mix.
#include <cmath>
#include <cstdio>
#include <limits>
#include <vector>

#include "InputBitDepthTransform.h"
#include "audioengine/OversamplingPolicy.h"

namespace juce { template <typename T> struct MathConstants2; }
#include "/tmp/equal_power_extract.inc"

static void dump_array(const char* name, const std::vector<double>& a,
                       bool last) {
    std::printf("    \"%s\": [", name);
    for (size_t i = 0; i < a.size(); ++i) {
        // Python's json parser accepts these non-standard tokens
        if (std::isnan(a[i]))
            std::printf("NaN");
        else if (std::isinf(a[i]))
            std::printf(a[i] > 0 ? "Infinity" : "-Infinity");
        else
            std::printf("%.17g", a[i]);
        if (i + 1 < a.size()) std::printf(",");
    }
    std::printf("]%s\n", last ? "" : ",");
}

static void dump_iarray(const char* name, const std::vector<int>& a,
                        bool last) {
    std::printf("    \"%s\": [", name);
    for (size_t i = 0; i < a.size(); ++i)
        std::printf("%d%s", a[i], i + 1 < a.size() ? "," : "");
    std::printf("]%s\n", last ? "" : ",");
}

int main() {
    std::printf("{\n");

    // ---- sanitizeAndLimit ----------------------------------------------
    {
        const double nan = std::numeric_limits<double>::quiet_NaN();
        const double inf = std::numeric_limits<double>::infinity();
        std::vector<double> x = {
            0.5, -0.25, nan, inf, -inf, 1.5, -2.5, 1.0, -1.0,
            1e-25, -1e-25, 1e-19, -1e-19, 1e-20, 0.0, -0.0,
            0.9999999, -0.9999999, 2.0, 1e308, -1e308, 3e-20, 0.125,
        };
        // odd length exercises the scalar tail after the 4-wide loop
        std::vector<double> inp = x;
        convo::input_transform::sanitizeAndLimit(x.data(), (int)x.size());
        std::printf("  \"sanitize\": {\n");
        dump_array("input", inp, false);
        dump_array("output", x, false);
        std::printf("    \"threshold\": %.17g\n",
                    convo::input_transform::kDenormThreshold);
        std::printf("  },\n");
    }

    // ---- OversamplingPolicy ---------------------------------------------
    {
        const double srs[] = {44100, 48000, 88200, 96000, 176400, 192000,
                              352800, 384000, 705600, 768000, 800000};
        const int reqs[] = {0, 1, 2, 3, 4, 5, 8, 16, -1};
        std::vector<double> vsr;
        std::vector<int> vreq, vres, vmax, vsup, vauto;
        for (double sr : srs)
            for (int rq : reqs) {
                convo::BuildInput bi{};
                bi.sampleRate = sr;
                bi.oversamplingFactor = rq;
                const auto r = convo::OversamplingPolicy::resolve(bi);
                vsr.push_back(sr);
                vreq.push_back(rq);
                vres.push_back(r.resolvedOsFactor);
                vmax.push_back(
                    convo::OversamplingPolicy::maxAllowedFactor(sr));
                vsup.push_back(r.supported ? 1 : 0);
                vauto.push_back(r.isAutoResolved ? 1 : 0);
            }
        std::printf("  \"os_policy\": {\n");
        dump_array("sr", vsr, false);
        dump_iarray("requested", vreq, false);
        dump_iarray("resolved", vres, false);
        dump_iarray("max_allowed", vmax, false);
        dump_iarray("supported", vsup, false);
        dump_iarray("auto", vauto, true);
        std::printf("  },\n");
    }

    // ---- LinearRamp -------------------------------------------------------
    {
        std::printf("  \"linear_ramp\": [\n");
        // scenario 1: plain 0 -> 1 fade over 0.001 s @ 48 k (48 steps),
        // read 60 values (plateau after completion)
        {
            convo::LinearRamp r(0.0);
            r.reset(48000.0, 0.001);
            r.setTargetValue(1.0);
            std::vector<double> seq;
            for (int i = 0; i < 60; ++i) seq.push_back(r.getNextValue());
            std::printf("  {\n    \"kind\": \"plain\", \"sr\": 48000.0, "
                        "\"time\": 0.001, \"from\": 0.0, \"to\": 1.0,\n");
            dump_array("seq", seq, true);
            std::printf("  },\n");
        }
        // scenario 2: retarget mid-ramp — remaining steps become the
        // denominator (SmoothedValue semantics)
        {
            convo::LinearRamp r(0.2);
            r.reset(48000.0, 0.001);
            r.setTargetValue(1.0);
            std::vector<double> seq;
            for (int i = 0; i < 20; ++i) seq.push_back(r.getNextValue());
            r.setTargetValue(-0.5);
            for (int i = 0; i < 40; ++i) seq.push_back(r.getNextValue());
            std::printf("  {\n    \"kind\": \"retarget\", \"sr\": 48000.0, "
                        "\"time\": 0.001, \"from\": 0.2, \"to\": 1.0, "
                        "\"retarget_at\": 20, \"to2\": -0.5,\n");
            dump_array("seq", seq, true);
            std::printf("  },\n");
        }
        // scenario 3: setTargetValue on an idle ramp after completion
        // uses totalSteps again; equal target is a no-op
        {
            convo::LinearRamp r(0.0);
            r.reset(1000.0, 0.01);   // 10 steps
            r.setTargetValue(1.0);
            std::vector<double> seq;
            for (int i = 0; i < 12; ++i) seq.push_back(r.getNextValue());
            r.setTargetValue(1.0);   // no-op
            seq.push_back(r.getNextValue());
            r.setTargetValue(0.25);
            for (int i = 0; i < 12; ++i) seq.push_back(r.getNextValue());
            std::printf("  {\n    \"kind\": \"idle_retarget\", \"sr\": 1000.0, "
                        "\"time\": 0.01, \"from\": 0.0, \"to\": 1.0, "
                        "\"to2\": 0.25,\n");
            dump_array("seq", seq, true);
            std::printf("  }\n");
        }
        std::printf("  ],\n");
    }

    // ---- equalPowerSin ----------------------------------------------------
    {
        std::vector<double> xs, ys;
        for (int i = 0; i <= 64; ++i) {
            const double x = i / 64.0;
            xs.push_back(x);
            ys.push_back(equalPowerSin(x));
        }
        std::printf("  \"equal_power_sin\": {\n");
        dump_array("x", xs, false);
        dump_array("y", ys, true);
        std::printf("  }\n");
    }

    std::printf("}\n");
    return 0;
}
