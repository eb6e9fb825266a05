// Ground-truth vector dump for FastTanhApprox — compiles the REFERENCE
// header directly (no re-implementation): include path points at
// /root/reference/src, so the numbers below are produced by the
// reference's own code (src/dsp/math/FastTanhApprox.h:24-92).
//
// Emits JSON: {"x": [...], "eq_scalar": [...], "eq_v128": [...],
//              "clip_scalar": [...], "clip_v128": [...]}
#include "dsp/math/FastTanhApprox.h"

#include <cstdio>
#include <vector>

static double v128_lane0(__m128d v) {
    double out[2];
    _mm_storeu_pd(out, v);
    return out[0];
}

int main() {
    std::vector<double> xs;
    // dense sweep through the rational region, the knee, and the clamp
    for (double x = -6.0; x <= 6.0 + 1e-12; x += 0.0625) xs.push_back(x);
    // exact boundary/denormal-ish points
    for (double x : {-4.5, 4.5, -4.4999999999, 4.4999999999, 0.0, 1e-300,
                     -1e-300, 3.0, -3.0})
        xs.push_back(x);

    printf("{\"x\": [");
    for (size_t i = 0; i < xs.size(); i++)
        printf("%s%.17g", i ? ", " : "", xs[i]);
    printf("], \"eq_scalar\": [");
    for (size_t i = 0; i < xs.size(); i++)
        printf("%s%.17g", i ? ", " : "",
               convo::dsp::fastTanh<convo::dsp::DefaultFastTanhPolicy>(xs[i]));
    printf("], \"eq_v128\": [");
    for (size_t i = 0; i < xs.size(); i++)
        printf("%s%.17g", i ? ", " : "",
               v128_lane0(convo::dsp::fastTanhV128<convo::dsp::DefaultFastTanhPolicy>(
                   _mm_set1_pd(xs[i]))));
    printf("], \"clip_scalar\": [");
    for (size_t i = 0; i < xs.size(); i++)
        printf("%s%.17g", i ? ", " : "",
               convo::dsp::fastTanh<convo::dsp::SoftClipPadéPolicy>(xs[i]));
    printf("], \"clip_v128\": [");
    for (size_t i = 0; i < xs.size(); i++)
        printf("%s%.17g", i ? ", " : "",
               v128_lane0(convo::dsp::fastTanhV128<convo::dsp::SoftClipPadéPolicy>(
                   _mm_set1_pd(xs[i]))));
    printf("]}\n");
    return 0;
}
