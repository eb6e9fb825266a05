// Minimal JUCE stub for compiling the reference's pure noise-shaper
// headers standalone (FixedNoiseShaper.h / Fixed15TapNoiseShaper.h /
// LatticeNoiseShaper.h use only FloatVectorOperations::clear and an
// AbstractFifo for diagnostics we never read).
#pragma once
#include <algorithm>
#include <cstring>

#include "juce_core/juce_core.h"

namespace juce {

struct FloatVectorOperations {
    static void clear(double* p, int n) noexcept {
        std::memset(p, 0, sizeof(double) * static_cast<size_t>(n));
    }
    static void clear(float* p, int n) noexcept {
        std::memset(p, 0, sizeof(float) * static_cast<size_t>(n));
    }
};

// No-op fifo: prepareToWrite grants zero space, so diagnostics pushes
// are dropped (the dump harness never reads them).
class AbstractFifo {
public:
    explicit AbstractFifo(int) noexcept {}
    void reset() noexcept {}
    void prepareToWrite(int, int& start1, int& size1, int& start2,
                        int& size2) const noexcept {
        start1 = size1 = start2 = size2 = 0;
    }
    void finishedWrite(int) noexcept {}
    void prepareToRead(int, int& start1, int& size1, int& start2,
                       int& size2) const noexcept {
        start1 = size1 = start2 = size2 = 0;
    }
    void finishedRead(int) noexcept {}
};

}  // namespace juce
