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

// ---------------------------------------------------------------------------
// Block scheduler — the serving front-end plane (reference analog: the
// audio-callback path AudioEngine.Processing.BlockDouble.cpp feeding the
// DSP core, with the ISR deadline contract ARCHITECTURE.md:397: a block
// is an XRUN when its wall time exceeds 1.5x the callback budget).
//
// Re-expressed for a batch device: N independent streams each own an SPSC
// input ring and an SPSC output ring of fixed-size stereo blocks.  Any
// number of producer threads (one per stream) push input blocks; ONE
// dispatcher thread gathers one block per ready stream into a contiguous
// (n_streams, 2, block) f32 batch, hands it to the accelerator step
// (Python/JAX side), then commits the result batch back to the output
// rings with deadline accounting.  Streams with no input ready are
// zero-filled for the step (real-time semantics: an underrun plays
// silence) and their output is not committed.
// ---------------------------------------------------------------------------

struct CqStreamRing {
    // null-initialized so the create-path's partial-failure cleanup can
    // free every slot unconditionally (free(nullptr) is a no-op); without
    // it the slot whose init failed would free an indeterminate pointer
    float* data = nullptr;    // cap_blocks * stride floats
    std::atomic<uint64_t> w{0};  // block cursor
    std::atomic<uint64_t> r{0};  // block cursor
};

struct CqSched {
    uint32_t n_streams;
    uint32_t block;           // samples per channel
    uint32_t stride;          // floats per block record (2 * block)
    uint32_t cap_blocks;      // power of two
    uint64_t mask;
    double budget_ns;
    double xrun_ns;           // 1.5x budget
    CqStreamRing* in;
    CqStreamRing* out;
    // stats (dispatcher-owned except drops)
    std::atomic<uint64_t> served_blocks;
    std::atomic<uint64_t> underruns;      // stream-blocks zero-filled
    std::atomic<uint64_t> xruns;
    std::atomic<uint64_t> in_overflows;   // producer pushes refused
    std::atomic<uint64_t> out_drops;      // commits refused (consumer lag)
    std::atomic<uint64_t> windows;        // commit calls (dispatch windows)
    std::atomic<uint64_t> wall_ns_total;
    std::atomic<uint64_t> wall_ns_max;
};

static bool cq_stream_ring_init(CqStreamRing* r, uint64_t cap_blocks,
                                uint32_t stride) {
    r->data = (float*)cq_aligned_alloc(cap_blocks * stride * sizeof(float));
    if (!r->data) return false;
    memset(r->data, 0, cap_blocks * stride * sizeof(float));
    r->w.store(0, std::memory_order_relaxed);
    r->r.store(0, std::memory_order_relaxed);
    return true;
}

void* cq_sched_create(uint32_t n_streams, uint32_t block,
                      double sample_rate, uint32_t capacity_blocks,
                      double xrun_factor) {
    if (n_streams == 0 || block == 0 || capacity_blocks == 0 ||
        (capacity_blocks & (capacity_blocks - 1)) != 0 || sample_rate <= 0)
        return nullptr;
    CqSched* s = new (std::nothrow) CqSched();
    if (!s) return nullptr;
    s->n_streams = n_streams;
    s->block = block;
    s->stride = 2u * block;
    s->cap_blocks = capacity_blocks;
    s->mask = capacity_blocks - 1;
    s->budget_ns = (double)block / sample_rate * 1e9;
    s->xrun_ns = s->budget_ns * (xrun_factor > 0 ? xrun_factor : 1.5);
    s->in = new (std::nothrow) CqStreamRing[n_streams];
    s->out = new (std::nothrow) CqStreamRing[n_streams];
    if (!s->in || !s->out) { delete[] s->in; delete[] s->out; delete s; return nullptr; }
    for (uint32_t i = 0; i < n_streams; ++i) {
        if (!cq_stream_ring_init(&s->in[i], capacity_blocks, s->stride) ||
            !cq_stream_ring_init(&s->out[i], capacity_blocks, s->stride)) {
            for (uint32_t j = 0; j <= i; ++j) {
                cq_aligned_free(s->in[j].data);
                cq_aligned_free(s->out[j].data);
            }
            delete[] s->in; delete[] s->out; delete s;
            return nullptr;
        }
    }
    s->served_blocks.store(0); s->underruns.store(0); s->xruns.store(0);
    s->in_overflows.store(0); s->out_drops.store(0); s->windows.store(0);
    s->wall_ns_total.store(0); s->wall_ns_max.store(0);
    return s;
}

void cq_sched_destroy(void* sv) {
    CqSched* s = (CqSched*)sv;
    if (!s) return;
    for (uint32_t i = 0; i < s->n_streams; ++i) {
        cq_aligned_free(s->in[i].data);
        cq_aligned_free(s->out[i].data);
    }
    delete[] s->in;
    delete[] s->out;
    delete s;
}

// Producer side: push one stereo block (stride floats, planar L then R)
// into stream `i`'s input ring.  Returns 1, or 0 (ring full -> overflow
// counted; the caller drops the block, real-time semantics).
int cq_sched_push(void* sv, uint32_t i, const float* blk) {
    CqSched* s = (CqSched*)sv;
    if (i >= s->n_streams) return 0;
    CqStreamRing* r = &s->in[i];
    const uint64_t w = r->w.load(std::memory_order_relaxed);
    const uint64_t rd = r->r.load(std::memory_order_acquire);
    if (w - rd >= s->cap_blocks) {
        s->in_overflows.fetch_add(1, std::memory_order_relaxed);
        return 0;
    }
    memcpy(r->data + (w & s->mask) * s->stride, blk,
           s->stride * sizeof(float));
    r->w.store(w + 1, std::memory_order_release);
    return 1;
}

// Dispatcher side: gather one block per stream into `batch`
// (n_streams * stride floats, stream-major).  ready_mask[i] = 1 when the
// stream had input; zero-filled (underrun) otherwise.  Returns the number
// of ready streams.  A fully-idle poll (no stream ready) returns 0
// WITHOUT consuming anything or counting underruns — only a window that
// actually runs with a missing stream is an underrun.
uint32_t cq_sched_gather(void* sv, float* batch, uint8_t* ready_mask) {
    CqSched* s = (CqSched*)sv;
    bool any = false;
    for (uint32_t i = 0; i < s->n_streams && !any; ++i)
        any = s->in[i].w.load(std::memory_order_acquire)
            - s->in[i].r.load(std::memory_order_relaxed) >= 1;
    if (!any) return 0;
    uint32_t ready = 0;
    for (uint32_t i = 0; i < s->n_streams; ++i) {
        CqStreamRing* r = &s->in[i];
        const uint64_t rd = r->r.load(std::memory_order_relaxed);
        const uint64_t w = r->w.load(std::memory_order_acquire);
        float* dst = batch + (uint64_t)i * s->stride;
        if (w - rd >= 1) {
            memcpy(dst, r->data + (rd & s->mask) * s->stride,
                   s->stride * sizeof(float));
            r->r.store(rd + 1, std::memory_order_release);
            ready_mask[i] = 1;
            ++ready;
        } else {
            memset(dst, 0, s->stride * sizeof(float));
            ready_mask[i] = 0;
            s->underruns.fetch_add(1, std::memory_order_relaxed);
        }
    }
    return ready;
}

// Dispatcher side: commit the processed batch for the streams marked in
// ready_mask; wall_ns is the measured step wall time for deadline
// accounting (one XRUN per window whose wall exceeds the 1.5x contract).
void cq_sched_commit(void* sv, const float* batch, const uint8_t* ready_mask,
                     uint64_t wall_ns) {
    CqSched* s = (CqSched*)sv;
    for (uint32_t i = 0; i < s->n_streams; ++i) {
        if (!ready_mask[i]) continue;
        CqStreamRing* r = &s->out[i];
        const uint64_t w = r->w.load(std::memory_order_relaxed);
        const uint64_t rd = r->r.load(std::memory_order_acquire);
        if (w - rd >= s->cap_blocks) {
            s->out_drops.fetch_add(1, std::memory_order_relaxed);
            continue;
        }
        memcpy(r->data + (w & s->mask) * s->stride,
               batch + (uint64_t)i * s->stride, s->stride * sizeof(float));
        r->w.store(w + 1, std::memory_order_release);
        s->served_blocks.fetch_add(1, std::memory_order_relaxed);
    }
    if ((double)wall_ns > s->xrun_ns)
        s->xruns.fetch_add(1, std::memory_order_relaxed);
    s->windows.fetch_add(1, std::memory_order_relaxed);
    s->wall_ns_total.fetch_add(wall_ns, std::memory_order_relaxed);
    uint64_t prev = s->wall_ns_max.load(std::memory_order_relaxed);
    while (wall_ns > prev &&
           !s->wall_ns_max.compare_exchange_weak(prev, wall_ns)) {}
}

// Consumer side: pop one processed stereo block for stream i.  Returns 1
// or 0 (none ready).
int cq_sched_pop(void* sv, uint32_t i, float* blk) {
    CqSched* s = (CqSched*)sv;
    if (i >= s->n_streams) return 0;
    CqStreamRing* r = &s->out[i];
    const uint64_t rd = r->r.load(std::memory_order_relaxed);
    const uint64_t w = r->w.load(std::memory_order_acquire);
    if (w - rd < 1) return 0;
    memcpy(blk, r->data + (rd & s->mask) * s->stride,
           s->stride * sizeof(float));
    r->r.store(rd + 1, std::memory_order_release);
    return 1;
}

uint32_t cq_sched_in_ready(void* sv, uint32_t i) {
    CqSched* s = (CqSched*)sv;
    if (i >= s->n_streams) return 0;
    CqStreamRing* r = &s->in[i];
    return (uint32_t)(r->w.load(std::memory_order_acquire)
                      - r->r.load(std::memory_order_acquire));
}

void cq_sched_stats(void* sv, uint64_t* served, uint64_t* underruns,
                    uint64_t* xruns, uint64_t* in_overflows,
                    uint64_t* out_drops, double* avg_wall_ms,
                    double* max_wall_ms, double* budget_ms) {
    CqSched* s = (CqSched*)sv;
    const uint64_t tot = s->wall_ns_total.load(std::memory_order_relaxed);
    const uint64_t win = s->windows.load(std::memory_order_relaxed);
    *served = s->served_blocks.load(std::memory_order_relaxed);
    *underruns = s->underruns.load(std::memory_order_relaxed);
    *xruns = s->xruns.load(std::memory_order_relaxed);
    *in_overflows = s->in_overflows.load(std::memory_order_relaxed);
    *out_drops = s->out_drops.load(std::memory_order_relaxed);
    *avg_wall_ms = win ? (double)tot / 1e6 / (double)win : 0.0;
    *max_wall_ms = (double)s->wall_ns_max.load(std::memory_order_relaxed) / 1e6;
    *budget_ms = s->budget_ns / 1e6;
}

}  // extern "C"
