#!/bin/sh
# Regenerate ground-truth vectors from the reference's own code.
# Requires g++ and a readable reference checkout (default /root/reference).
# The committed vectors/ JSONs are the durable artifact; this script only
# needs to run when the reference version changes.
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
OUT="$HERE/vectors"
mkdir -p "$OUT"

g++ -std=c++20 -O2 -mavx2 -mfma -I"$REF/src" \
    "$HERE/dump_fast_tanh.cpp" -o /tmp/dump_fast_tanh
/tmp/dump_fast_tanh > "$OUT/fast_tanh.json"
echo "wrote $OUT/fast_tanh.json"

g++ -std=c++20 -O2 -I"$REF/src" -I"$HERE/stub_include" \
    "$HERE/dump_autogain.cpp" "$REF/src/audioengine/AutoGainPlanner.cpp" \
    -o /tmp/dump_autogain
/tmp/dump_autogain > "$OUT/autogain.json"
echo "wrote $OUT/autogain.json"

# SVF coefficients: extract the reference's own function bodies verbatim
# (validateAndClampParameters + calcSVFCoeffs + the five calc*SVF) from
# EQProcessor.Coefficients.cpp, strip the member qualifier, compile them
# inside dump_svf.cpp's minimal shim, and run.  The reference code never
# enters the repo — only the dumped vectors do.
awk '
  /^(void|EQCoeffsSVF) EQProcessor::(validateAndClampParameters|calcSVFCoeffs|calc(LowShelf|Peaking|HighShelf|LowPass|HighPass)SVF)\(/ {p=1}
  p {sub(/EQProcessor::/, ""); print}
  p && /^}/ {p=0}
' "$REF/src/eqprocessor/EQProcessor.Coefficients.cpp" > /tmp/svf_extract.inc
g++ -std=c++20 -O2 "$HERE/dump_svf.cpp" -o /tmp/dump_svf
/tmp/dump_svf > "$OUT/svf_coeffs.json"
echo "wrote $OUT/svf_coeffs.json"

# Noise shapers: pure headers with deterministic internal RNGs — the
# dumped quantized outputs are exact (bit-level) ground truth for
# models/dither.py's error-feedback kernels.
# -ffp-contract=off: the pinned contract for the chaotic error-feedback
# loops is plain IEEE mul-then-add on both sides (the scan kernels
# barrier every product; FMA contraction flips trajectories within ~400
# samples).
g++ -std=c++20 -O2 -mavx2 -mfma -ffp-contract=off \
    -D'jassert(x)=((void)0)' -I"$REF/src" -I"$HERE/stub_include" \
    "$HERE/dump_shapers.cpp" -o /tmp/dump_shapers
/tmp/dump_shapers > "$OUT/shapers.json"
echo "wrote $OUT/shapers.json"

# PsychoacousticDither: stub mkl_vsl.h fails vslNewStream, driving the
# deterministic SplitMix64-seeded xorshift64* fallback RNG; per-sample
# process() calls so one scalar expression instance carries both
# channels (the stereo loop's two instances vectorize asymmetrically).
g++ -std=c++20 -O2 -mavx2 -mfma -ffp-contract=off \
    -D'jassert(x)=((void)0)' -I"$REF/src" -I"$HERE/stub_include" \
    "$HERE/dump_psycho.cpp" "$REF/src/PsychoacousticDither.cpp" \
    -o /tmp/dump_psycho
/tmp/dump_psycho > "$OUT/psycho.json"
echo "wrote $OUT/psycho.json"

# Oversampler: Kaiser-halfband cascade — stateful block outputs are
# exact ground truth for ops/oversample.py (design + both phase kernels)
g++ -std=c++20 -O2 -mavx2 -mfma -I"$REF/src" -I"$HERE/stub_include" \
    -include array -D'jassert(x)=((void)0)' -D'__assume(x)=((void)0)' \
    "$HERE/dump_oversampler.cpp" "$REF/src/CustomInputOversampler.cpp" \
    -o /tmp/dump_os
/tmp/dump_os > "$OUT/oversampler.json"
echo "wrote $OUT/oversampler.json"

# DC blocker + peak limiter (pure headers)
g++ -std=c++20 -O2 -mavx2 -mfma -I"$REF/src" -I"$HERE/stub_include" \
    -include array -D'jassert(x)=((void)0)' -D'__assume(x)=((void)0)' \
    "$HERE/dump_misc.cpp" -o /tmp/dump_misc
/tmp/dump_misc > "$OUT/misc.json"
echo "wrote $OUT/misc.json"

# Metering: true peak + K-weighted block power (reads the meter's ring)
g++ -std=c++20 -O2 -mavx2 -mfma -I"$REF/src" -I"$HERE/stub_include" \
    -include array -D'jassert(x)=((void)0)' -D'__assume(x)=((void)0)' \
    "$HERE/dump_metering.cpp" "$REF/src/TruePeakDetector.cpp" \
    "$REF/src/LoudnessMeter.cpp" -o /tmp/dump_met
/tmp/dump_met > "$OUT/metering.json"
echo "wrote $OUT/metering.json"

# Output filter: full HC/LC/LP mode grids at 48/96 kHz
g++ -std=c++20 -O2 -mavx2 -mfma -I"$REF/src" -I"$HERE/stub_include" \
    -include array -D'jassert(x)=((void)0)' -D'__assume(x)=((void)0)' \
    "$HERE/dump_output_filter.cpp" "$REF/src/OutputFilter.cpp" \
    -o /tmp/dump_of
/tmp/dump_of > "$OUT/output_filter.json"
echo "wrote $OUT/output_filter.json"

# Soft clip: extract the kernel (anonymous namespace of the DSPCore TU)
# verbatim at dump-build time, drive a saturation grid
awk '
  /^inline double musicalSoftClipScalar/ {p=1}
  /^void softClipBlockAVX2/ {p=1}
  p {print}
  p && /^}$/ {p=0}
' "$REF/src/audioengine/AudioEngine.Processing.DSPCoreDouble.cpp" \
    > /tmp/softclip_extract.inc
g++ -std=c++20 -O2 -mavx2 -mfma -I"$REF/src" \
    "$HERE/dump_softclip.cpp" -o /tmp/dump_sc
/tmp/dump_sc > "$OUT/softclip.json"
echo "wrote $OUT/softclip.json"

# EQ per-sample SVF kernel: extract the Processing TU's anonymous-namespace
# helpers + processBand/processBandStereo verbatim (reuses the svf coeff
# extraction for the band coefficients)
awk '
  /inline double calculateRMS/ {p=1}
  /applyGainRamp_AVX2/ {exit}
  p {print}
' "$REF/src/eqprocessor/EQProcessor.Processing.cpp" \
    > /tmp/eq_kernel_extract.inc
g++ -std=c++20 -O2 -mavx2 -mfma -msse4.1 -I"$REF/src" -I"$HERE/stub_include" \
    -include array -D'jassert(x)=((void)0)' -D'__assume(x)=((void)0)' \
    "$HERE/dump_eq_kernel.cpp" -o /tmp/dump_eqk
/tmp/dump_eqk > "$OUT/eq_kernel.json"
echo "wrote $OUT/eq_kernel.json"

# NUC engine: the reference's convolver TUs compiled UNMODIFIED against
# the stub ipp/mkl headers (portable radix-2 FFT + exact VML/BLAS);
# streams blocks through the real SetImpulse/Add/Get
g++ -std=c++20 -O2 -mavx2 -mfma -I"$REF/src" -I"$REF/src/audioengine" \
    -I"$HERE/stub_include" \
    -include array -D'jassert(x)=((void)0)' -D'jassertfalse=((void)0)' \
    -D'__assume(x)=((void)0)' \
    "$HERE/dump_nuc.cpp" "$REF/src/MKLNonUniformConvolver.cpp" \
    "$REF/src/FFTBackend.cpp" "$REF/src/FFTExecutionContext.cpp" \
    -o /tmp/dump_nuc
/tmp/dump_nuc > "$OUT/nuc.json"
echo "wrote $OUT/nuc.json"

# Loader-thread phase converters: convertToMinimumPhase +
# convertToMixedPhaseFallback extracted verbatim, run against the stub
# DFTI/VML (portable radix-2 FFT, exact elementwise ops)
awk '
  /inline bool checkCancellation/ {p=1}
  /inline void unwrapPhaseRadians/ {p=1}
  p {print}
  p && /^    }$/ {p=0}
' "$REF/src/convolver/ConvolverProcessor.Internal.h" \
    > /tmp/minphase_internal.inc
awk '
  /^juce::AudioBuffer<double> convertToMinimumPhase/ {p=1}
  p {print}
  p && /^}/ {p=0}
' "$REF/src/convolver/ConvolverProcessor.ResampleAndFallback.cpp" \
    > /tmp/minphase_extract.inc
awk '
  /^juce::AudioBuffer<double> ConvolverProcessor::convertToMixedPhaseFallback/ {p=1}
  p {sub(/ConvolverProcessor::/, ""); print}
  p && /^}/ {p=0}
' "$REF/src/convolver/ConvolverProcessor.MixedPhase.cpp" \
    > /tmp/mixedfallback_extract.inc
g++ -std=c++20 -O2 -mavx2 -mfma -I"$REF/src" -I"$HERE/stub_include" \
    -include array "$HERE/dump_minphase.cpp" -o /tmp/dump_minphase
/tmp/dump_minphase > "$OUT/minphase.json"
echo "wrote $OUT/minphase.json"

# IRAnalyzer: compiled unmodified (self-contained FFT, JUCE stub only)
g++ -std=c++20 -O2 -mavx2 -mfma -I"$REF/src" -I"$HERE/stub_include" \
    -include array "$HERE/dump_iranalyzer.cpp" "$REF/src/IRAnalyzer.cpp" \
    -o /tmp/dump_ira
/tmp/dump_ira > "$OUT/iranalyzer.json"
echo "wrote $OUT/iranalyzer.json"

# FULL EQ engine: all nine EQProcessor TUs compiled unmodified (stub
# JUCE + shadow ISR retire header; stub -I must come FIRST so
# stub_include/audioengine/ISRRuntimePublicationCoordinator.h shadows
# the reference's, whose 16-byte atomic static_assert g++ can't satisfy)
g++ -std=c++20 -O2 -mavx2 -mfma -msse4.1 -I"$HERE/stub_include" \
    -I"$REF/src" \
    -include array -D'jassert(x)=((void)0)' -D'jassertfalse=((void)0)' \
    -D'__assume(x)=((void)0)' -D'DBG(x)=((void)0)' \
    "$HERE/dump_eq_full.cpp" \
    "$REF/src/eqprocessor/EQProcessor.Core.cpp" \
    "$REF/src/eqprocessor/EQProcessor.Processing.cpp" \
    "$REF/src/eqprocessor/EQProcessor.Coefficients.cpp" \
    "$REF/src/eqprocessor/EQProcessor.Parameters.cpp" \
    "$REF/src/eqprocessor/EQProcessor.ProcessingCache.cpp" \
    "$REF/src/eqprocessor/BandHelper.cpp" \
    "$REF/src/eqprocessor/EQResponseSampler.cpp" \
    "$REF/src/eqprocessor/PeakEstimator.cpp" \
    "$REF/src/eqprocessor/UpperBoundEstimator.cpp" \
    -o /tmp/dump_eqf
/tmp/dump_eqf > "$OUT/eq_full.json"
echo "wrote $OUT/eq_full.json"

# IRDSP resampler: the vendored r8brain (MIT, header-only with Ooura FFT)
# driven through src/IRDSP.cpp's exact chunk/flush/trim loop.  Our
# resampler is an independent design, so the test bounds in-band
# equivalence at the 140 dB spec floor, not bit equality.
g++ -std=c++20 -O2 -I"$REF/r8brain-free-src" \
    "$HERE/dump_resampler.cpp" -o /tmp/dump_resampler
/tmp/dump_resampler > "$OUT/resampler.json"
echo "wrote $OUT/resampler.json"

# AllpassDesigner: compiled unmodified (+ CmaEsOptimizerDynamic, stub
# JUCE).  Formula grids + deterministic Greedy/AdaGrad designs are exact
# ground truth; the fixed-seed CMA-ES design provides a quality bar.
g++ -std=c++20 -O2 -I"$HERE/stub_include" -I"$REF/src" \
    -include array -D'jassert(x)=((void)0)' -D'jassertfalse=((void)0)' \
    -D'DBG(x)=((void)0)' \
    "$HERE/dump_allpass.cpp" "$REF/src/AllpassDesigner.cpp" \
    "$REF/src/CmaEsOptimizerDynamic.cpp" -o /tmp/dump_allpass
/tmp/dump_allpass > "$OUT/allpass.json"
echo "wrote $OUT/allpass.json"

# Engine math: input sanitize, oversampling policy, LinearRamp,
# equalPowerSin (extracted verbatim from the convolver runtime TU).
awk '
  /inline double equalPowerSin\(double x\) noexcept/ {p=1}
  p {print}
  p && /^    }/ {p=0}
' "$REF/src/convolver/ConvolverProcessor.Runtime.cpp" > /tmp/equal_power_extract.inc
g++ -std=c++20 -O2 -mavx2 -mfma -I"$HERE/stub_include" -I"$REF/src" \
    -include array -D'jassert(x)=((void)0)' -D'jassertfalse=((void)0)' \
    -D'DBG(x)=((void)0)' \
    "$HERE/dump_engine_math.cpp" -o /tmp/dump_em
/tmp/dump_em > "$OUT/engine_math.json"
echo "wrote $OUT/engine_math.json"
