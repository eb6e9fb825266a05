// Minimal JUCE stub for compiling the reference's pure noise-shaper
// headers standalone (FixedNoiseShaper.h / Fixed15TapNoiseShaper.h /
// LatticeNoiseShaper.h use only FloatVectorOperations::clear and an
// AbstractFifo for diagnostics we never read).
#pragma once
#include <algorithm>
#include <cmath>
#include <cstring>
#include <string>
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
    // compile-only surface for functions the harness never calls
    String trim() const { return {}; }
    std::string toStdString() const { return {}; }
    bool startsWithIgnoreCase(const String&) const { return false; }
    bool isEmpty() const { return true; }
    bool isNotEmpty() const { return false; }
    float getFloatValue() const { return 0.0f; }
    int getIntValue() const { return 0; }
    double getDoubleValue() const { return 0.0; }
    bool equalsIgnoreCase(const String&) const { return false; }
    bool containsIgnoreCase(const String&) const { return false; }
    String toLowerCase() const { return {}; }
    String toUpperCase() const { return {}; }
    String upToFirstOccurrenceOf(const String&, bool, bool) const {
        return {};
    }
    String fromFirstOccurrenceOf(const String&, bool, bool) const {
        return {};
    }
    String substring(int, int = 0) const { return {}; }
    bool startsWith(const String&) const { return false; }
    bool contains(const String&) const { return false; }
    bool containsAnyOf(const String&) const { return false; }
    String removeCharacters(const String&) const { return {}; }
    int length() const { return 0; }
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
    // nullptr: harness has no message thread — async progress callbacks
    // (AllpassDesigner.cpp:404,511) are simply skipped
    static MessageManager* getInstanceWithoutCreating() { return nullptr; }
    bool isThisTheMessageThread() const noexcept { return true; }
    template <typename Fn> static bool callAsync(Fn&&) { return true; }
};

template <typename T>
struct MathConstants {
    static constexpr T pi = static_cast<T>(3.141592653589793238462643383279502884L);
    static constexpr T twoPi = static_cast<T>(2) * pi;
};

// Compile-only stubs for the EQProcessor TUs: state-IO types (never
// driven by the dump harness), ChangeBroadcaster, Decibels, denormal
// scope.  Functions that USE these (getState/setState/loadFromTextFile)
// compile but are never called.
class ChangeBroadcaster {
public:
    virtual ~ChangeBroadcaster() = default;
    void sendChangeMessage() {}
};

class var {
public:
    var() = default;
    template <typename T> var(const T&) {}
    operator float() const { return 0.0f; }
    operator double() const { return 0.0; }
    operator int() const { return 0; }
    operator bool() const { return false; }
};

class Identifier {
public:
    template <typename T> Identifier(const T&) {}
};

class ValueTree {
public:
    ValueTree() = default;
    template <typename T> explicit ValueTree(const T&) {}
    bool isValid() const { return false; }
    ValueTree& setProperty(const Identifier&, const var&, void*) {
        return *this;
    }
    var getProperty(const Identifier&, const var& dflt = {}) const {
        return dflt;
    }
    void appendChild(const ValueTree&, void*) {}
    void addChild(const ValueTree&, int, void*) {}
    int getNumChildren() const { return 0; }
    ValueTree getChild(int) const { return {}; }
    bool hasType(const Identifier&) const { return false; }
    bool hasProperty(const Identifier&) const { return false; }
    String getType() const { return {}; }
    const ValueTree* begin() const { return nullptr; }
    const ValueTree* end() const { return nullptr; }
};

struct Time {
    long long ms = 0;
    long long toMilliseconds() const { return ms; }
};

// Inert stream stub: AllpassDesigner::computeIRHash compiles against it
// but the harness never calls it (createInputStream returns nullptr and
// the hash path is unused).
struct Result {
    bool failed() const { return true; }
};

class FileInputStream {
public:
    bool openedOk() const { return false; }
    long long getTotalLength() const { return 0; }
    int read(void*, int) { return 0; }
    bool isExhausted() const { return true; }
    Result getStatus() const { return {}; }
};

template <typename T>
class HeapBlock {
public:
    void malloc(size_t n) { data_.resize(n); }
    T* getData() { return data_.data(); }
    const T* getData() const { return data_.data(); }
private:
    std::vector<T> data_;
};

using int64 = long long;

class File {
public:
    File() = default;
    bool existsAsFile() const { return false; }
    String loadFileAsString() const { return {}; }
    String getFullPathName() const { return {}; }
    long long getSize() const { return 0; }
    Time getLastModificationTime() const { return {}; }
    FileInputStream* createInputStream() const { return nullptr; }
    template <typename T> void readLines(T&) const {}
};

class StringArray {
public:
    void addLines(const String&) {}
    void addTokens(const String&, const char*, const char*) {}
    template <typename... A> void addTokens(A&&...) {}
    int size() const { return 0; }
    String operator[](int) const { return {}; }
    void trim() {}
    void removeEmptyStrings() {}
    void add(const String&) {}
    bool isEmpty() const { return true; }
    const String* begin() const { return nullptr; }
    const String* end() const { return nullptr; }
};

struct Decibels {
    template <typename T>
    static T decibelsToGain(T db, T minusInfinityDb = T(-100)) {
        return db > minusInfinityDb
                   ? std::pow(T(10), db * T(0.05)) : T(0);
    }
    template <typename T>
    static T gainToDecibels(T gain, T minusInfinityDb = T(-100)) {
        return gain > T(0)
                   ? std::max(minusInfinityDb,
                              std::log10(gain) * T(20)) : minusInfinityDb;
    }
};

struct ScopedNoDenormals {
    ScopedNoDenormals() noexcept {}
    ~ScopedNoDenormals() noexcept {}
};

struct MessageManagerLock {
    MessageManagerLock() {}
    bool lockWasGained() const { return true; }
};

struct NativeMessageBox {
    template <typename... A> static void showAsync(A&&...) {}
};

enum class MessageBoxIconType { NoIcon, QuestionIcon, WarningIcon,
                                InfoIcon };

struct MessageBoxOptions {
    template <typename... A>
    static MessageBoxOptions makeOptionsOk(A&&...) { return {}; }
    MessageBoxOptions withIconType(MessageBoxIconType) const { return {}; }
    MessageBoxOptions withTitle(const String&) const { return {}; }
    MessageBoxOptions withMessage(const String&) const { return {}; }
    MessageBoxOptions withButton(const String&) const { return {}; }
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
    T getMagnitude(int ch, int start, int n) const noexcept {
        T m = T();
        const T* p = getReadPointer(ch);
        for (int i = start; i < start + n; ++i)
            m = std::max(m, std::abs(p[i]));
        return m;
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
    static void add(double* dst, const double* src, int n) noexcept {
        for (int i = 0; i < n; ++i) dst[i] += src[i];
    }
    static void add(double* dst, const double* a, const double* b,
                    int n) noexcept {
        for (int i = 0; i < n; ++i) dst[i] = a[i] + b[i];
    }
    static void subtract(double* dst, const double* src, int n) noexcept {
        for (int i = 0; i < n; ++i) dst[i] -= src[i];
    }
    static void subtract(double* dst, const double* a, const double* b,
                         int n) noexcept {
        for (int i = 0; i < n; ++i) dst[i] = a[i] - b[i];
    }
    static void multiply(double* dst, double v, int n) noexcept {
        for (int i = 0; i < n; ++i) dst[i] *= v;
    }
    static void multiply(double* dst, const double* src, int n) noexcept {
        for (int i = 0; i < n; ++i) dst[i] *= src[i];
    }
    static void addWithMultiply(double* dst, const double* src, double v,
                                int n) noexcept {
        for (int i = 0; i < n; ++i) dst[i] += src[i] * v;
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

// JUCE exports its integer aliases at global scope via juce_core; the
// reference uses unqualified `int64` inside its own namespaces.
using int64 = long long;
