// Minimal CBLAS stub: dscal is an exact elementwise scale.
#pragma once
#include "mkl.h"

inline void cblas_dscal(const MKL_INT n, const double alpha, double* x,
                        const MKL_INT incx) {
    if (incx == 1) {
        for (MKL_INT i = 0; i < n; ++i) x[i] *= alpha;
    } else {
        for (MKL_INT i = 0; i < n; ++i) x[i * incx] *= alpha;
    }
}
