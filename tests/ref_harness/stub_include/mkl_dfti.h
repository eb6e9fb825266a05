// Minimal MKL DFTI stub for compiling the reference's loader-thread FFT
// units (min-phase / mixed-phase converters) standalone on Linux/g++.
//
// Only the surface those TUs touch is provided: a 1-D DFTI_DOUBLE
// DFTI_COMPLEX in-place descriptor with a configurable BACKWARD_SCALE.
// The transform is a portable iterative radix-2 double-precision FFT
// (per-plan twiddle table, each twiddle a direct cos/sin call).  Forward
// is unnormalized; backward multiplies by the descriptor's
// DFTI_BACKWARD_SCALE (the reference always sets 1/fftSize).
// Numerically this agrees with MKL to ~1e-15 relative (both approximate
// the exact DFT); the dumped vectors pin ALGORITHM semantics (cepstral
// fold, clamps, blend weights, unwrap), not MKL's rounding.
#pragma once

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <vector>

enum DFTI_CONFIG_VALUE {
    DFTI_NO_ERROR = 0,
    DFTI_DOUBLE = 36,
    DFTI_SINGLE = 35,
    DFTI_COMPLEX = 32,
    DFTI_REAL = 33,
    DFTI_PLACEMENT = 11,
    DFTI_INPLACE = 43,
    DFTI_NOT_INPLACE = 44,
    DFTI_BACKWARD_SCALE = 5,
    DFTI_FORWARD_SCALE = 4,
};

struct DFTI_DESCRIPTOR {
    long long n = 0;
    double backward_scale = 1.0;
    double forward_scale = 1.0;
    bool inplace = true;
    std::vector<uint32_t> bitrev;
    std::vector<double> tw;  // interleaved (cos, sin) for k in [0, n/2)
};
typedef DFTI_DESCRIPTOR* DFTI_DESCRIPTOR_HANDLE;

inline long dfti_stub_status(bool ok) { return ok ? DFTI_NO_ERROR : 1; }

inline long DftiCreateDescriptor(DFTI_DESCRIPTOR_HANDLE* h, int prec,
                                 int domain, long long dims, long long n) {
    if (!h || prec != DFTI_DOUBLE || domain != DFTI_COMPLEX || dims != 1)
        return 1;
    if (n <= 0 || (n & (n - 1)) != 0)  // the reference always uses pow2
        return 1;
    auto* d = new DFTI_DESCRIPTOR();
    d->n = n;
    int order = 0;
    while ((1LL << order) < n) ++order;
    d->bitrev.resize(static_cast<size_t>(n));
    for (long long i = 0; i < n; ++i) {
        uint32_t r = 0, v = static_cast<uint32_t>(i);
        for (int b = 0; b < order; ++b) { r = (r << 1) | (v & 1u); v >>= 1; }
        d->bitrev[static_cast<size_t>(i)] = r;
    }
    d->tw.resize(static_cast<size_t>(n));
    for (long long k = 0; k < n / 2; ++k) {
        const double a = -2.0 * M_PI * static_cast<double>(k)
                         / static_cast<double>(n);
        d->tw[static_cast<size_t>(2 * k)] = std::cos(a);
        d->tw[static_cast<size_t>(2 * k) + 1] = std::sin(a);
    }
    *h = d;
    return DFTI_NO_ERROR;
}

inline long DftiSetValue(DFTI_DESCRIPTOR_HANDLE h, int what, ...) {
    if (!h) return 1;
    __builtin_va_list ap;
    __builtin_va_start(ap, what);
    long rc = DFTI_NO_ERROR;
    switch (what) {
        case DFTI_PLACEMENT: {
            const int v = __builtin_va_arg(ap, int);
            h->inplace = (v == DFTI_INPLACE);
            break;
        }
        case DFTI_BACKWARD_SCALE:
            h->backward_scale = __builtin_va_arg(ap, double);
            break;
        case DFTI_FORWARD_SCALE:
            h->forward_scale = __builtin_va_arg(ap, double);
            break;
        default:
            rc = 1;
    }
    __builtin_va_end(ap);
    return rc;
}

inline long DftiCommitDescriptor(DFTI_DESCRIPTOR_HANDLE h) {
    return dfti_stub_status(h != nullptr);
}

inline long DftiFreeDescriptor(DFTI_DESCRIPTOR_HANDLE* h) {
    if (h && *h) { delete *h; *h = nullptr; }
    return DFTI_NO_ERROR;
}

// In-place iterative radix-2 DIT over interleaved complex z (2n doubles);
// inverse = conjugated twiddles, then scale.
inline void dfti_stub_fft(double* z, const DFTI_DESCRIPTOR* d, bool inverse,
                          double scale) {
    const long long n = d->n;
    for (long long i = 0; i < n; ++i) {
        const uint32_t j = d->bitrev[static_cast<size_t>(i)];
        if (static_cast<uint32_t>(i) < j) {
            double tre = z[2 * i], tim = z[2 * i + 1];
            z[2 * i] = z[2 * j]; z[2 * i + 1] = z[2 * j + 1];
            z[2 * j] = tre; z[2 * j + 1] = tim;
        }
    }
    for (long long len = 2; len <= n; len <<= 1) {
        const long long half = len >> 1;
        const long long step = n / len;
        for (long long base = 0; base < n; base += len) {
            for (long long k = 0; k < half; ++k) {
                const double wr = d->tw[static_cast<size_t>(2 * k * step)];
                const double wi0 = d->tw[static_cast<size_t>(2 * k * step) + 1];
                const double wi = inverse ? -wi0 : wi0;
                double* a = z + 2 * (base + k);
                double* b = z + 2 * (base + k + half);
                const double tre = b[0] * wr - b[1] * wi;
                const double tim = b[0] * wi + b[1] * wr;
                b[0] = a[0] - tre; b[1] = a[1] - tim;
                a[0] += tre; a[1] += tim;
            }
        }
    }
    if (scale != 1.0)
        for (long long i = 0; i < 2 * n; ++i) z[i] *= scale;
}

inline long DftiComputeForward(DFTI_DESCRIPTOR_HANDLE h, void* inout) {
    if (!h || !inout || !h->inplace) return 1;
    dfti_stub_fft(static_cast<double*>(inout), h, /*inverse=*/false,
                  h->forward_scale);
    return DFTI_NO_ERROR;
}

inline long DftiComputeBackward(DFTI_DESCRIPTOR_HANDLE h, void* inout) {
    if (!h || !inout || !h->inplace) return 1;
    dfti_stub_fft(static_cast<double*>(inout), h, /*inverse=*/true,
                  h->backward_scale);
    return DFTI_NO_ERROR;
}
