// Minimal JUCE stub for compiling the reference's pure noise-shaper
// headers standalone (FixedNoiseShaper.h / Fixed15TapNoiseShaper.h /
// LatticeNoiseShaper.h use only FloatVectorOperations::clear and an
// AbstractFifo for diagnostics we never read).
#pragma once
#include <algorithm>
#include <cstring>
#include <vector>

#ifndef JUCE_DECLARE_NON_COPYABLE
#define JUCE_DECLARE_NON_COPYABLE(cls) \
    cls(const cls&) = delete;          \
    cls& operator=(const cls&) = delete;
#endif

#include "juce_core/juce_core.h"

#ifndef JUCE_DECLARE_NON_COPYABLE_WITH_LEAK_DETECTOR
#define JUCE_DECLARE_NON_COPYABLE_WITH_LEAK_DETECTOR(cls) \
    JUCE_DECLARE_NON_COPYABLE(cls)
#endif

namespace juce {

template <typename T>
inline T jmax(T a, T b) noexcept { return a < b ? b : a; }
template <typename T>
inline T jmin(T a, T b) noexcept { return b < a ? b : a; }

inline int nextPowerOfTwo(int n) noexcept {
    int p = 1;
    while (p < n) p <<= 1;
    return p;
}

// Inert String/Logger/MessageManager: the convolver only builds log
// strings (dropped) and asserts the message thread (single-threaded dump
// harness => always true).
class String {
public:
    String() = default;
    template <typename T> String(const T&) {}
    template <typename... A>
    static String formatted(const char*, A...) { return {}; }
    String operator+(const String&) const { return {}; }
};
inline String operator+(const char* a, const String&) { return String(a); }

struct Logger {
    static void writeToLog(const String&) {}
};

struct MessageManager {
    static MessageManager* getInstance() {
        static MessageManager m;
        return &m;
    }
    bool isThisTheMessageThread() const noexcept { return true; }
};

template <typename T>
struct MathConstants {
    static constexpr T pi = static_cast<T>(3.141592653589793238462643383279502884L);
    static constexpr T twoPi = static_cast<T>(2) * pi;
};

// Minimal owning AudioBuffer — only the surface the loader-thread
// converters (min-phase / mixed-phase) touch.
template <typename T>
class AudioBuffer {
public:
    AudioBuffer() noexcept = default;
    AudioBuffer(int numCh, int numSmp)
        : numChannels_(numCh), numSamples_(numSmp),
          data_(static_cast<size_t>(numCh) * static_cast<size_t>(numSmp),
                T()) {}
    int getNumChannels() const noexcept { return numChannels_; }
    int getNumSamples() const noexcept { return numSamples_; }
    const T* getReadPointer(int ch) const noexcept {
        return data_.data()
               + static_cast<size_t>(ch) * static_cast<size_t>(numSamples_);
    }
    T* getWritePointer(int ch) noexcept {
        return data_.data()
               + static_cast<size_t>(ch) * static_cast<size_t>(numSamples_);
    }
    void copyFrom(int dstCh, int dstStart, const AudioBuffer& src,
                  int srcCh, int srcStart, int n) noexcept {
        std::memcpy(getWritePointer(dstCh) + dstStart,
                    src.getReadPointer(srcCh) + srcStart,
                    sizeof(T) * static_cast<size_t>(n));
    }

private:
    int numChannels_ = 0;
    int numSamples_ = 0;
    std::vector<T> data_;
};

struct FloatVectorOperations {
    static void clear(double* p, int n) noexcept {
        std::memset(p, 0, sizeof(double) * static_cast<size_t>(n));
    }
    static void clear(float* p, int n) noexcept {
        std::memset(p, 0, sizeof(float) * static_cast<size_t>(n));
    }
    static void copy(double* dst, const double* src, int n) noexcept {
        std::memmove(dst, src, sizeof(double) * static_cast<size_t>(n));
    }
};

namespace dsp {

// Minimal AudioBlock: non-owning view over per-channel pointers — only
// the surface CustomInputOversampler touches.
template <typename T>
class AudioBlock {
public:
    AudioBlock() noexcept = default;
    AudioBlock(T* const* chans, size_t numCh, size_t numSmp) noexcept
        : channels_(chans), numChannels_(numCh), numSamples_(numSmp) {}
    size_t getNumChannels() const noexcept { return numChannels_; }
    size_t getNumSamples() const noexcept { return numSamples_; }
    T* getChannelPointer(size_t ch) const noexcept {
        return channels_ ? channels_[ch] : nullptr;
    }
    void clear() const noexcept {
        for (size_t c = 0; c < numChannels_; ++c)
            if (channels_ && channels_[c])
                std::memset(channels_[c], 0, sizeof(T) * numSamples_);
    }

private:
    T* const* channels_ = nullptr;
    size_t numChannels_ = 0;
    size_t numSamples_ = 0;
};

}  // namespace dsp

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
