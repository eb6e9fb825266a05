// Minimal MKL VML stub: exact elementwise loops (VML "HA" accuracy for
// mul/add IS the correctly-rounded double op, so this is not an
// approximation).
#pragma once
#include <cmath>
#include "mkl.h"

inline void vdMul(const MKL_INT n, const double* a, const double* b,
                  double* y) {
    for (MKL_INT i = 0; i < n; ++i) y[i] = a[i] * b[i];
}

inline void vdAdd(const MKL_INT n, const double* a, const double* b,
                  double* y) {
    for (MKL_INT i = 0; i < n; ++i) y[i] = a[i] + b[i];
}

inline void vdLn(const MKL_INT n, const double* a, double* y) {
    for (MKL_INT i = 0; i < n; ++i) y[i] = std::log(a[i]);
}

inline void vdCos(const MKL_INT n, const double* a, double* y) {
    for (MKL_INT i = 0; i < n; ++i) y[i] = std::cos(a[i]);
}

inline void vzAbs(const MKL_INT n, const MKL_Complex16* a, double* y) {
    for (MKL_INT i = 0; i < n; ++i) y[i] = std::hypot(a[i].real, a[i].imag);
}

inline void vzExp(const MKL_INT n, const MKL_Complex16* a,
                  MKL_Complex16* y) {
    for (MKL_INT i = 0; i < n; ++i) {
        const double m = std::exp(a[i].real);
        const double re = m * std::cos(a[i].imag);
        const double im = m * std::sin(a[i].imag);
        y[i].real = re;
        y[i].imag = im;
    }
}
