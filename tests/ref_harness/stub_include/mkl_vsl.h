// Minimal MKL VSL stub for compiling the reference's PsychoacousticDither
// header without Intel MKL.  vslNewStream always FAILS, which drives the
// reference down its deterministic non-MKL fallback path
// (SplitMix64-seeded xorshift64*, PsychoacousticDither.h:37-50,477-489) —
// the exact path the rebuild pins bit-for-bit.
#pragma once

typedef void* VSLStreamStatePtr;
typedef int MKL_INT;

#define VSL_STATUS_OK 0
#define VSL_BRNG_SFMT19937 0x06000000
#define VSL_RNG_METHOD_UNIFORM_STD 0

inline MKL_INT vslNewStream(VSLStreamStatePtr* stream, MKL_INT, unsigned int)
{
    *stream = nullptr;
    return -1;  // != VSL_STATUS_OK -> fallback RNG engages
}

inline MKL_INT vslDeleteStream(VSLStreamStatePtr*) { return 0; }

inline MKL_INT vdRngUniform(MKL_INT, VSLStreamStatePtr, MKL_INT, double*,
                            double, double)
{
    return -1;
}
