// Minimal Intel IPP stub for compiling the reference's FFT-dependent
// units standalone on Linux/g++.  Only the surface FFTBackend.cpp and
// MKLNonUniformConvolver.cpp touch is provided.
//
// The FFT itself is a portable iterative radix-2 double-precision
// transform with a per-plan twiddle table (each twiddle computed by a
// direct cos/sin call — no recurrence error).  Semantics mirror the IPP
// calls the reference makes:
//   - plans are created with IPP_FFT_DIV_INV_BY_N: forward is
//     unnormalized, inverse divides by N;
//   - RToCCS packs the half spectrum in CCS layout
//     [Re0, 0, Re1, Im1, ..., Re(N/2), 0]  (N+2 doubles);
//   - CCSToR expands by conjugate symmetry.
// Numerically this agrees with IPP to ~1e-15 relative (both approximate
// the exact DFT); the dumped vectors pin *algorithm* semantics
// (partitioning, delay alignment, gains), not IPP's rounding.
#pragma once

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

typedef unsigned char Ipp8u;
typedef double Ipp64f;
typedef int IppStatus;

enum {
    ippStsNoErr = 0,
    ippStsNullPtrErr = -8,
    ippStsSizeErr = -6,
    ippStsBadArgErr = -5,
    ippStsMemAllocErr = -4,
    ippStsErr = -2,
};

typedef enum { ippAlgHintNone = 0, ippAlgHintFast, ippAlgHintAccurate }
    IppHintAlgorithm;

enum {
    IPP_FFT_DIV_INV_BY_N = 1,
    IPP_FFT_DIV_FWD_BY_N = 2,
    IPP_FFT_NODIV_BY_ANY = 8,
};

// Plan: header + bit-reversal table + twiddle table, all inside the
// caller-provided spec buffer (sized by ippsFFTGetSize_R_64f).
struct IppsFFTSpec_R_64f {
    int order;
    int n;        // fftSize = 1 << order
    int flag;
    // followed in memory by: uint32_t bitrev[n]; double tw[n] (re,im pairs
    // for n/2 twiddles)
};

inline uint32_t* ippstub_bitrev(IppsFFTSpec_R_64f* s) {
    return reinterpret_cast<uint32_t*>(s + 1);
}
inline double* ippstub_twiddle(IppsFFTSpec_R_64f* s) {
    return reinterpret_cast<double*>(ippstub_bitrev(s) + s->n);
}
inline const uint32_t* ippstub_bitrev(const IppsFFTSpec_R_64f* s) {
    return reinterpret_cast<const uint32_t*>(s + 1);
}
inline const double* ippstub_twiddle(const IppsFFTSpec_R_64f* s) {
    return reinterpret_cast<const double*>(ippstub_bitrev(s) + s->n);
}

inline Ipp8u* ippsMalloc_8u(int len) {
    void* p = nullptr;
    if (posix_memalign(&p, 64, static_cast<size_t>(len) < 64
                                   ? 64 : static_cast<size_t>(len)) != 0)
        return nullptr;
    return static_cast<Ipp8u*>(p);
}

inline void ippsFree(void* p) { free(p); }

inline IppStatus ippsFFTGetSize_R_64f(int order, int /*flag*/,
                                      IppHintAlgorithm /*hint*/,
                                      int* pSizeSpec, int* pSizeInit,
                                      int* pSizeBuf) {
    if (!pSizeSpec || !pSizeInit || !pSizeBuf) return ippStsNullPtrErr;
    if (order < 0 || order > 26) return ippStsSizeErr;
    const int n = 1 << order;
    *pSizeSpec = static_cast<int>(sizeof(IppsFFTSpec_R_64f)
                                  + sizeof(uint32_t) * static_cast<size_t>(n)
                                  + sizeof(double) * static_cast<size_t>(n)
                                  + 64);
    *pSizeInit = 0;
    // work buffer: interleaved complex scratch (2n doubles)
    *pSizeBuf = static_cast<int>(sizeof(double) * 2 * static_cast<size_t>(n));
    return ippStsNoErr;
}

inline IppStatus ippsFFTInit_R_64f(IppsFFTSpec_R_64f** ppSpec, int order,
                                   int flag, IppHintAlgorithm /*hint*/,
                                   Ipp8u* pSpecBuffer, Ipp8u* /*pInitBuf*/) {
    if (!ppSpec || !pSpecBuffer) return ippStsNullPtrErr;
    if (order < 0 || order > 26) return ippStsSizeErr;
    auto* s = reinterpret_cast<IppsFFTSpec_R_64f*>(pSpecBuffer);
    s->order = order;
    s->n = 1 << order;
    s->flag = flag;
    uint32_t* br = ippstub_bitrev(s);
    const int n = s->n;
    for (int i = 0; i < n; ++i) {
        uint32_t r = 0, v = static_cast<uint32_t>(i);
        for (int b = 0; b < order; ++b) { r = (r << 1) | (v & 1u); v >>= 1; }
        br[i] = r;
    }
    double* tw = ippstub_twiddle(s);
    for (int k = 0; k < n / 2; ++k) {
        const double a = -2.0 * M_PI * static_cast<double>(k)
                         / static_cast<double>(n);
        tw[2 * k] = std::cos(a);
        tw[2 * k + 1] = std::sin(a);
    }
    *ppSpec = s;
    return ippStsNoErr;
}

// In-place iterative radix-2 DIT over interleaved complex `z` (2n doubles),
// inverse = conjugated twiddles (no scaling here).
inline void ippstub_fft_complex(double* z, const IppsFFTSpec_R_64f* s,
                                bool inverse) {
    const int n = s->n;
    const uint32_t* br = ippstub_bitrev(s);
    const double* tw = ippstub_twiddle(s);
    for (int i = 0; i < n; ++i) {
        const uint32_t j = br[i];
        if (static_cast<uint32_t>(i) < j) {
            double tre = z[2 * i], tim = z[2 * i + 1];
            z[2 * i] = z[2 * j]; z[2 * i + 1] = z[2 * j + 1];
            z[2 * j] = tre; z[2 * j + 1] = tim;
        }
    }
    for (int len = 2; len <= n; len <<= 1) {
        const int half = len >> 1;
        const int step = n / len;            // twiddle stride
        for (int base = 0; base < n; base += len) {
            for (int k = 0; k < half; ++k) {
                const double wr = tw[2 * (k * step)];
                const double wi = inverse ? -tw[2 * (k * step) + 1]
                                          : tw[2 * (k * step) + 1];
                double* a = z + 2 * (base + k);
                double* b = z + 2 * (base + k + half);
                const double tre = b[0] * wr - b[1] * wi;
                const double tim = b[0] * wi + b[1] * wr;
                b[0] = a[0] - tre; b[1] = a[1] - tim;
                a[0] += tre; a[1] += tim;
            }
        }
    }
}

inline IppStatus ippsFFTFwd_RToCCS_64f(const Ipp64f* pSrc, Ipp64f* pDst,
                                       const IppsFFTSpec_R_64f* pSpec,
                                       Ipp8u* pBuffer) {
    if (!pSrc || !pDst || !pSpec || !pBuffer) return ippStsNullPtrErr;
    const int n = pSpec->n;
    double* z = reinterpret_cast<double*>(pBuffer);
    for (int i = 0; i < n; ++i) { z[2 * i] = pSrc[i]; z[2 * i + 1] = 0.0; }
    ippstub_fft_complex(z, pSpec, /*inverse=*/false);
    pDst[0] = z[0];
    pDst[1] = 0.0;
    for (int k = 1; k < n / 2; ++k) {
        pDst[2 * k] = z[2 * k];
        pDst[2 * k + 1] = z[2 * k + 1];
    }
    pDst[n] = z[n];       // Re(N/2)
    pDst[n + 1] = 0.0;
    return ippStsNoErr;
}

inline IppStatus ippsFFTInv_CCSToR_64f(const Ipp64f* pSrc, Ipp64f* pDst,
                                       const IppsFFTSpec_R_64f* pSpec,
                                       Ipp8u* pBuffer) {
    if (!pSrc || !pDst || !pSpec || !pBuffer) return ippStsNullPtrErr;
    const int n = pSpec->n;
    double* z = reinterpret_cast<double*>(pBuffer);
    z[0] = pSrc[0]; z[1] = 0.0;
    for (int k = 1; k < n / 2; ++k) {
        z[2 * k] = pSrc[2 * k];
        z[2 * k + 1] = pSrc[2 * k + 1];
        z[2 * (n - k)] = pSrc[2 * k];        // conjugate symmetry
        z[2 * (n - k) + 1] = -pSrc[2 * k + 1];
    }
    z[n] = pSrc[n]; z[n + 1] = 0.0;          // Nyquist
    ippstub_fft_complex(z, pSpec, /*inverse=*/true);
    const double scale = (pSpec->flag & IPP_FFT_DIV_INV_BY_N)
                             ? 1.0 / static_cast<double>(n) : 1.0;
    for (int i = 0; i < n; ++i) pDst[i] = z[2 * i] * scale;
    return ippStsNoErr;
}
