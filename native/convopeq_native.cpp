// convopeq_native — native runtime support library (C ABI, ctypes-loaded).
//
// TPU-native equivalents of the reference's C++ runtime plumbing (SURVEY.md
// §2.4/§2.5): the compute path lives in XLA; this library covers the
// host-side hot paths around it:
//   - WAV decode/encode (PCM 16/24/32 + float32/64) — the data-loader stage
//     (reference: JUCE AudioFormatReader + input_transform converters)
//   - lock-free SPSC ring buffer for audio blocks — the audio-thread <->
//     worker handoff plane (reference: src/LockFreeRingBuffer.h,
//     src/LockFreeAudioRingBuffer.h)
//   - 64-byte aligned allocation (reference: src/AlignedAllocation.h)
//   - interleave/deinterleave/convert block framing kernels (reference:
//     src/InputBitDepthTransform.h, AudioEngine.Processing.DSPCoreIO.cpp)
//
// Build: g++ -O3 -march=native -shared -fPIC -o libconvopeq_native.so
//        convopeq_native.cpp
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>

extern "C" {

// ---------------------------------------------------------------------------
// aligned allocation (64-byte, AlignedAllocation.h analog)
// ---------------------------------------------------------------------------

void* cq_aligned_alloc(size_t bytes) {
    void* p = nullptr;
    if (posix_memalign(&p, 64, bytes) != 0) return nullptr;
    return p;
}

void cq_aligned_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// WAV decode (headerless core: caller parses the RIFF header in Python or
// uses cq_wav_parse below)
// ---------------------------------------------------------------------------

// Parse a RIFF/WAVE byte buffer: returns 0 on success and fills the out
// params; data_offset/data_bytes locate the sample payload.
int cq_wav_parse(const uint8_t* buf, uint64_t len,
                 uint32_t* format_tag, uint32_t* channels,
                 uint32_t* sample_rate, uint32_t* bits,
                 uint64_t* data_offset, uint64_t* data_bytes) {
    if (len < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
        return -1;
    uint64_t pos = 12;
    bool have_fmt = false, have_data = false;
    while (pos + 8 <= len) {
        uint32_t chunk_size;
        memcpy(&chunk_size, buf + pos + 4, 4);
        const uint8_t* id = buf + pos;
        uint64_t body = pos + 8;
        if (memcmp(id, "fmt ", 4) == 0 && body + 16 <= len) {
            uint16_t tag, ch, ba, bi;
            uint32_t sr;
            memcpy(&tag, buf + body, 2);
            memcpy(&ch, buf + body + 2, 2);
            memcpy(&sr, buf + body + 4, 4);
            memcpy(&ba, buf + body + 12, 2);
            memcpy(&bi, buf + body + 14, 2);
            // extensible fmt: the real tag lives in the extension at
            // body+24; chunk_size is file-controlled, so bound BOTH the
            // declared chunk size and the actual buffer before reading.
            if (tag == 0xFFFE && chunk_size >= 26 && body + 26 <= len)
                memcpy(&tag, buf + body + 24, 2);
            *format_tag = tag;
            *channels = ch;
            *sample_rate = sr;
            *bits = bi;
            have_fmt = true;
        } else if (memcmp(id, "data", 4) == 0) {
            *data_offset = body;
            *data_bytes = chunk_size;
            if (*data_offset + *data_bytes > len)
                *data_bytes = len - *data_offset;
            have_data = true;
        }
        pos = body + chunk_size + (chunk_size & 1);
    }
    return (have_fmt && have_data) ? 0 : -2;
}

// Decode interleaved PCM/float payload into planar float64 [-1, 1].
// out must hold channels * frames doubles (channel-major).
int cq_wav_decode(const uint8_t* data, uint64_t data_bytes,
                  uint32_t format_tag, uint32_t channels, uint32_t bits,
                  double* out, uint64_t* frames_out) {
    if (channels == 0) return -1;
    const uint64_t bytes_per = bits / 8;
    const uint64_t stride = bytes_per * channels;
    if (stride == 0) return -1;
    const uint64_t frames = data_bytes / stride;
    *frames_out = frames;

    for (uint32_t ch = 0; ch < channels; ++ch) {
        double* dst = out + (uint64_t)ch * frames;
        const uint8_t* src = data + ch * bytes_per;
        if (format_tag == 3 && bits == 32) {
            for (uint64_t i = 0; i < frames; ++i) {
                float v;
                memcpy(&v, src + i * stride, 4);
                dst[i] = (double)v;
            }
        } else if (format_tag == 3 && bits == 64) {
            for (uint64_t i = 0; i < frames; ++i)
                memcpy(&dst[i], src + i * stride, 8);
        } else if (format_tag == 1 && bits == 16) {
            for (uint64_t i = 0; i < frames; ++i) {
                int16_t v;
                memcpy(&v, src + i * stride, 2);
                dst[i] = (double)v / 32768.0;
            }
        } else if (format_tag == 1 && bits == 24) {
            for (uint64_t i = 0; i < frames; ++i) {
                const uint8_t* b = src + i * stride;
                int32_t v = (int32_t)(b[0] | (b[1] << 8) | (b[2] << 16));
                if (v >= (1 << 23)) v -= (1 << 24);
                dst[i] = (double)v / 8388608.0;
            }
        } else if (format_tag == 1 && bits == 32) {
            for (uint64_t i = 0; i < frames; ++i) {
                int32_t v;
                memcpy(&v, src + i * stride, 4);
                dst[i] = (double)v / 2147483648.0;
            }
        } else {
            return -3;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// block framing kernels (input_transform analog)
// ---------------------------------------------------------------------------

// interleaved (frames, channels) f32 -> planar f64 with gain
void cq_deinterleave_f32_to_f64(const float* in, double* out,
                                uint64_t frames, uint32_t channels,
                                double gain) {
    for (uint32_t ch = 0; ch < channels; ++ch) {
        double* dst = out + (uint64_t)ch * frames;
        const float* src = in + ch;
        for (uint64_t i = 0; i < frames; ++i)
            dst[i] = (double)src[i * channels] * gain;
    }
}

// planar f64 -> interleaved f32 with gain + clamp
void cq_interleave_f64_to_f32(const double* in, float* out,
                              uint64_t frames, uint32_t channels,
                              double gain) {
    for (uint32_t ch = 0; ch < channels; ++ch) {
        const double* src = in + (uint64_t)ch * frames;
        float* dst = out + ch;
        for (uint64_t i = 0; i < frames; ++i) {
            double v = src[i] * gain;
            if (v > 1.0) v = 1.0;
            if (v < -1.0) v = -1.0;
            dst[i * channels] = (float)v;
        }
    }
}

// ---------------------------------------------------------------------------
// SPSC lock-free ring buffer of doubles (LockFreeRingBuffer.h analog):
// single producer / single consumer, acquire/release cursors, capacity must
// be a power of two.
// ---------------------------------------------------------------------------

struct CqRing {
    double* data;
    uint64_t capacity;   // power of two
    uint64_t mask;
    std::atomic<uint64_t> write_pos;
    std::atomic<uint64_t> read_pos;
};

void* cq_ring_create(uint64_t capacity) {
    if (capacity == 0 || (capacity & (capacity - 1)) != 0) return nullptr;
    CqRing* r = new (std::nothrow) CqRing();
    if (!r) return nullptr;
    r->data = (double*)cq_aligned_alloc(capacity * sizeof(double));
    if (!r->data) { delete r; return nullptr; }
    memset(r->data, 0, capacity * sizeof(double));
    r->capacity = capacity;
    r->mask = capacity - 1;
    r->write_pos.store(0, std::memory_order_relaxed);
    r->read_pos.store(0, std::memory_order_relaxed);
    return r;
}

void cq_ring_destroy(void* rv) {
    CqRing* r = (CqRing*)rv;
    if (!r) return;
    cq_aligned_free(r->data);
    delete r;
}

uint64_t cq_ring_available_read(void* rv) {
    CqRing* r = (CqRing*)rv;
    return r->write_pos.load(std::memory_order_acquire)
         - r->read_pos.load(std::memory_order_relaxed);
}

uint64_t cq_ring_available_write(void* rv) {
    CqRing* r = (CqRing*)rv;
    return r->capacity - (r->write_pos.load(std::memory_order_relaxed)
                          - r->read_pos.load(std::memory_order_acquire));
}

// Push n doubles (producer side).  Returns n on success, 0 if insufficient
// space (all-or-nothing, like LockFreeRingBuffer::push).
uint64_t cq_ring_push(void* rv, const double* src, uint64_t n) {
    CqRing* r = (CqRing*)rv;
    const uint64_t w = r->write_pos.load(std::memory_order_relaxed);
    const uint64_t rd = r->read_pos.load(std::memory_order_acquire);
    if (r->capacity - (w - rd) < n) return 0;
    const uint64_t off = w & r->mask;
    const uint64_t first = (n < r->capacity - off) ? n : r->capacity - off;
    memcpy(r->data + off, src, first * sizeof(double));
    if (n > first)
        memcpy(r->data, src + first, (n - first) * sizeof(double));
    r->write_pos.store(w + n, std::memory_order_release);
    return n;
}

// Pop n doubles (consumer side).  All-or-nothing.
uint64_t cq_ring_pop(void* rv, double* dst, uint64_t n) {
    CqRing* r = (CqRing*)rv;
    const uint64_t rd = r->read_pos.load(std::memory_order_relaxed);
    const uint64_t w = r->write_pos.load(std::memory_order_acquire);
    if (w - rd < n) return 0;
    const uint64_t off = rd & r->mask;
    const uint64_t first = (n < r->capacity - off) ? n : r->capacity - off;
    memcpy(dst, r->data + off, first * sizeof(double));
    if (n > first)
        memcpy(dst + first, r->data, (n - first) * sizeof(double));
    r->read_pos.store(rd + n, std::memory_order_release);
    return n;
}

// ---------------------------------------------------------------------------
// Bounded MPSC ring (MpscBoundedRing.h analog): Vyukov bounded-queue slots
// with per-slot sequence numbers; multi-producer push via CAS slot
// reservation, single-consumer pop that refuses to skip a producer hole
// (a reserved-but-unpublished slot) so ordering follows reservation order.
// Fixed-size byte payloads.
// ---------------------------------------------------------------------------

struct CqMpsc {
    uint8_t* entries;
    std::atomic<uint32_t>* seqs;
    uint64_t capacity;      // power of two
    uint64_t mask;
    uint64_t elem_size;
    std::atomic<uint32_t> enqueue_pos;
    std::atomic<uint32_t> dequeue_pos;
};

void* cq_mpsc_create(uint64_t capacity, uint64_t elem_size) {
    if (capacity == 0 || (capacity & (capacity - 1)) != 0 || elem_size == 0)
        return nullptr;
    CqMpsc* q = new (std::nothrow) CqMpsc();
    if (!q) return nullptr;
    q->entries = (uint8_t*)cq_aligned_alloc(capacity * elem_size);
    q->seqs = new (std::nothrow) std::atomic<uint32_t>[capacity];
    if (!q->entries || !q->seqs) {
        cq_aligned_free(q->entries);
        delete[] q->seqs;
        delete q;
        return nullptr;
    }
    q->capacity = capacity;
    q->mask = capacity - 1;
    q->elem_size = elem_size;
    for (uint64_t i = 0; i < capacity; ++i)
        q->seqs[i].store((uint32_t)i, std::memory_order_release);
    q->enqueue_pos.store(0, std::memory_order_relaxed);
    q->dequeue_pos.store(0, std::memory_order_relaxed);
    return q;
}

void cq_mpsc_destroy(void* qv) {
    CqMpsc* q = (CqMpsc*)qv;
    if (!q) return;
    cq_aligned_free(q->entries);
    delete[] q->seqs;
    delete q;
}

// Multi-producer push; returns 1 on success, 0 when full (bounded, no drop).
int cq_mpsc_push(void* qv, const void* item) {
    CqMpsc* q = (CqMpsc*)qv;
    uint32_t pos = q->enqueue_pos.load(std::memory_order_acquire);
    for (;;) {
        std::atomic<uint32_t>& seq_atom = q->seqs[pos & q->mask];
        const uint32_t seq = seq_atom.load(std::memory_order_acquire);
        const int32_t diff = (int32_t)(seq - pos);
        if (diff == 0) {
            if (q->enqueue_pos.compare_exchange_weak(
                    pos, pos + 1, std::memory_order_acq_rel,
                    std::memory_order_acquire)) {
                memcpy(q->entries + (uint64_t)(pos & q->mask) * q->elem_size,
                       item, q->elem_size);
                seq_atom.store(pos + 1, std::memory_order_release);
                return 1;
            }
            // CAS failure reloaded pos; retry
        } else if (diff < 0) {
            return 0;   // full
        } else {
            pos = q->enqueue_pos.load(std::memory_order_acquire);
        }
    }
}

// Single-consumer pop; returns 1 on success, 0 when empty or when the next
// slot in reservation order is a producer hole (retry on the next poll).
int cq_mpsc_pop(void* qv, void* item) {
    CqMpsc* q = (CqMpsc*)qv;
    const uint32_t pos = q->dequeue_pos.load(std::memory_order_acquire);
    std::atomic<uint32_t>& seq_atom = q->seqs[pos & q->mask];
    const uint32_t seq = seq_atom.load(std::memory_order_acquire);
    if ((int32_t)(seq - (pos + 1)) != 0)
        return 0;
    memcpy(item, q->entries + (uint64_t)(pos & q->mask) * q->elem_size,
           q->elem_size);
    seq_atom.store(pos + (uint32_t)q->capacity, std::memory_order_release);
    q->dequeue_pos.store(pos + 1, std::memory_order_release);
    return 1;
}

uint64_t cq_mpsc_size_approx(void* qv) {
    CqMpsc* q = (CqMpsc*)qv;
    const uint32_t w = q->enqueue_pos.load(std::memory_order_acquire);
    const uint32_t d = q->dequeue_pos.load(std::memory_order_acquire);
    return (uint64_t)(uint32_t)(w - d);
}

}  // extern "C"
