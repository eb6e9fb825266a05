// Minimal MKL stub (allocation + threading no-ops) for compiling the
// reference's MKL-dependent units standalone on Linux/g++.
#pragma once
#include <cstdlib>

typedef long long MKL_INT64;
typedef int MKL_INT;
typedef long long MKL_LONG;

struct MKL_Complex16 {
    double real;
    double imag;
};

#include "mkl_dfti.h"

inline void* mkl_malloc(size_t size, int alignment) {
    void* p = nullptr;
    size_t align = alignment > 0 ? static_cast<size_t>(alignment) : 64;
    if (align < sizeof(void*)) align = sizeof(void*);
    size_t sz = size ? size : align;
    sz = (sz + align - 1) / align * align;   // posix_memalign needs no pad,
    if (posix_memalign(&p, align, sz) != 0)  // but round up defensively
        return nullptr;
    return p;
}

inline void mkl_free(void* p) { free(p); }

inline void mkl_set_num_threads(int) {}
inline int mkl_set_num_threads_local(int) { return 1; }
