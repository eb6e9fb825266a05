// Minimal MKL VML stub: exact elementwise loops (VML "HA" accuracy for
// mul/add IS the correctly-rounded double op, so this is not an
// approximation).
#pragma once
#include "mkl.h"

inline void vdMul(const MKL_INT n, const double* a, const double* b,
                  double* y) {
    for (MKL_INT i = 0; i < n; ++i) y[i] = a[i] * b[i];
}

inline void vdAdd(const MKL_INT n, const double* a, const double* b,
                  double* y) {
    for (MKL_INT i = 0; i < n; ++i) y[i] = a[i] + b[i];
}
