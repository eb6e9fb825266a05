// Ground-truth vector dump for the SVF coefficient formulas — executes the
// REFERENCE's own function bodies (src/eqprocessor/EQProcessor.Coefficients
// .cpp:84-607): build_and_dump.sh extracts validateAndClampParameters,
// calcSVFCoeffs and the five calc*SVF member functions verbatim into
// /tmp/svf_extract.inc at build time (stripping only the `EQProcessor::`
// qualifier), so the numbers below are produced by the reference's code,
// not a re-implementation.  Only the dumped vectors/ JSON is committed.
//
// Emits JSON rows: {"type", "freq", "gain_db", "q", "sr",
//                   "a1", "a2", "a3", "m0", "m1", "m2"}
#include <cmath>
#include <cstdio>
#include <vector>

// --- minimal environment for the extracted bodies ------------------------
namespace juce {
template <typename T> struct MathConstants { static constexpr T pi = T(3.141592653589793238462643383279502884L); };
template <typename T> constexpr T jlimit(T lo, T hi, T v) noexcept {
    return v < lo ? lo : (hi < v ? hi : v);
}
}  // namespace juce
#define jassertfalse ((void)0)

enum class EQBandType { LowShelf, Peaking, HighShelf, LowPass, HighPass };

struct EQCoeffsSVF {
    double g = 0.0, k = 0.0, a1 = 0.0, a2 = 0.0, a3 = 0.0;
    double m0 = 1.0, m1 = 0.0, m2 = 0.0;
};

// clamp constants (EQProcessor.h:174-180)
static constexpr float DSP_MIN_FREQ = 20.0f;
static constexpr float DSP_MAX_FREQ = 20000.0f;
static constexpr float DSP_MAX_FREQ_NYQUIST_RATIO = 0.95f;
static constexpr float DSP_MIN_Q = 0.01f;
static constexpr float DSP_MAX_Q = 20.0f;
static constexpr float DSP_MIN_GAIN_DB = -48.0f;
static constexpr float DSP_MAX_GAIN_DB = 48.0f;

// forward declarations matching the extracted definitions
void validateAndClampParameters(float& freq, float& gainDb, float& q,
                                double sr) noexcept;
EQCoeffsSVF calcLowShelfSVF(double, double, double, double) noexcept;
EQCoeffsSVF calcPeakingSVF(double, double, double, double) noexcept;
EQCoeffsSVF calcHighShelfSVF(double, double, double, double) noexcept;
EQCoeffsSVF calcLowPassSVF(double, double, double) noexcept;
EQCoeffsSVF calcHighPassSVF(double, double, double) noexcept;
EQCoeffsSVF calcSVFCoeffs(EQBandType, float, float, float, double) noexcept;

#include "/tmp/svf_extract.inc"

int main() {
    const double srs[] = {44100.0, 48000.0, 96000.0, 192000.0};
    const float freqs[] = {5.0f, 20.0f, 80.0f, 315.7f, 1000.0f, 2500.0f,
                           8000.0f, 16000.0f, 20000.0f, 30000.0f};
    const float gains[] = {-60.0f, -48.0f, -12.5f, -3.0f, 0.0f, 3.0f,
                           12.5f, 48.0f, 60.0f};
    const float qs[] = {0.001f, 0.01f, 0.5f, 0.707f, 1.4f, 5.0f, 20.0f,
                        35.0f};
    printf("[");
    bool first = true;
    for (int t = 0; t < 5; ++t)
        for (double sr : srs)
            for (float f : freqs)
                for (float g : gains)
                    for (float q : qs) {
                        EQCoeffsSVF c = calcSVFCoeffs(
                            (EQBandType)t, f, g, q, sr);
                        printf("%s\n{\"type\": %d, \"freq\": %.9g, "
                               "\"gain_db\": %.9g, \"q\": %.9g, "
                               "\"sr\": %.17g, \"a1\": %.17g, "
                               "\"a2\": %.17g, \"a3\": %.17g, "
                               "\"m0\": %.17g, \"m1\": %.17g, "
                               "\"m2\": %.17g}",
                               first ? "" : ",", t, f, g, q, sr,
                               c.a1, c.a2, c.a3, c.m0, c.m1, c.m2);
                        first = false;
                    }
    printf("]\n");
    return 0;
}
