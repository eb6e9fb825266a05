// Minimal JUCE stub for compiling the reference's pure units standalone.
// AutoGainPlanner.cpp uses only juce::jlimit (AutoGainPlanner.cpp:87-94).
#pragma once
#include <algorithm>

namespace juce {
template <typename T>
inline T jlimit(T lo, T hi, T v) noexcept {
    return v < lo ? lo : (hi < v ? hi : v);
}
}  // namespace juce
