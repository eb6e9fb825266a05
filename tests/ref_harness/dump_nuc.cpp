// Ground-truth vector dump for the reference's NUC engine itself:
// compiles src/MKLNonUniformConvolver.cpp + src/FFTBackend.cpp UNMODIFIED
// (stub ipp/mkl headers in stub_include/ provide a portable radix-2 FFT
// and exact elementwise VML/BLAS ops) and streams blocks through the real
// SetImpulse/Add/Get.  This pins:
//   - the 3-layer non-uniform partition plan (sizing, offsets, gains)
//   - overlap-save + FDL MAC semantics per layer
//   - B13 per-layer delay-line alignment (tails arrive sample-exact)
//   - the partsPerCallback tail amortization (externally invisible iff
//     the delay alignment is right — which is exactly what this checks)
//   - spectrum filter (HC/LC) and air-absorption tail damping applied to
//     the IR spectra at SetImpulse time
//   - the zero-latency direct head vs the partition-latency FFT path
//   - partition boundary cases (2047/2048/2049, MT-NUPC-03)
// Only the dumped vectors JSON is committed; reference code never enters
// the repo.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include "MKLNonUniformConvolver.h"

using convo::FilterSpec;
using convo::MKLNonUniformConvolver;

static constexpr double SR = 48000.0;

// Deterministic xorshift64* uniform in [-0.5, 0.5); reproduced bit-exactly
// by the Python test (pure uint64 arithmetic).
struct XS {
    uint64_t s;
    explicit XS(uint64_t seed) : s(seed) {}
    double next() {
        s ^= s >> 12;
        s ^= s << 25;
        s ^= s >> 27;
        const uint64_t r = s * 2685821657736338717ULL;
        return static_cast<double>(r >> 11) * (1.0 / 9007199254740992.0)
               - 0.5;
    }
};

static void dump_array(const char* name, const double* a, size_t n,
                       const char* tail) {
    std::printf("\"%s\": [", name);
    for (size_t i = 0; i < n; ++i)
        std::printf("%.17g%s", a[i], i + 1 < n ? "," : "");
    std::printf("]%s\n", tail);
}

// Stream `input` through Add/Get in blocks; returns the concatenated
// output (same length, rounded down to whole blocks).
static std::vector<double> stream(MKLNonUniformConvolver& conv,
                                  const std::vector<double>& input,
                                  int block) {
    const size_t nblocks = input.size() / static_cast<size_t>(block);
    std::vector<double> out(nblocks * static_cast<size_t>(block), 0.0);
    for (size_t b = 0; b < nblocks; ++b) {
        conv.Add(input.data() + b * static_cast<size_t>(block), block);
        conv.Get(out.data() + b * static_cast<size_t>(block), block);
    }
    return out;
}

static std::vector<double> decay_ir(int n, uint64_t seed, double tau) {
    XS xs(seed);
    std::vector<double> ir(static_cast<size_t>(n));
    for (int i = 0; i < n; ++i)
        ir[static_cast<size_t>(i)] =
            xs.next() * std::exp(-static_cast<double>(i) / tau);
    return ir;
}

static std::vector<double> rand_sig(size_t n, uint64_t seed) {
    XS xs(seed);
    std::vector<double> x(n);
    for (size_t i = 0; i < n; ++i) x[i] = xs.next() * 0.8;
    return x;
}

struct Case {
    const char* name;
    int ir_len;
    int block;
    uint64_t ir_seed;      // 0 => MLS-like sign IR (boundary cases)
    double ir_tau;
    uint64_t in_seed;      // 0 => Dirac at 0 and at 700
    int nblocks;
    double scale;
    bool direct_head;
    bool has_spec;         // false => SetImpulse(..., nullptr)
    FilterSpec spec;
};

int main() {
    FilterSpec def{};  // defaults: 48k, Natural/Natural, contour tail

    FilterSpec air{};
    air.tailMode = 0;
    air.tailStrength = 1.3;
    air.tailStartSeconds = 0.05;

    FilterSpec bypass{};
    bypass.tailMode = 2;

    FilterSpec sharp{};
    sharp.hcMode = convo::HCMode::Sharp;
    sharp.lcMode = convo::LCMode::Soft;
    sharp.tailStrength = 0.8;

    FilterSpec notail{};
    notail.tailEnabled = false;

    FilterSpec mult4{};
    mult4.tailL1L2Multiplier = 4;
    mult4.tailStartSeconds = 0.03;

    const Case cases[] = {
        // MT-NUPC-03 partition boundaries: MLS IR, Dirac-pair input
        {"bnd2047", 2047, 512, 0, 0.0, 0, 12, 1.0, false, true, def},
        {"bnd2048", 2048, 512, 0, 0.0, 0, 12, 1.0, false, true, def},
        {"bnd2049", 2049, 512, 0, 0.0, 0, 12, 1.0, false, true, def},
        // no-FilterSpec default path (nullptr)
        {"nospec", 2048, 512, 11, 600.0, 21, 12, 1.0, false, false, def},
        // spec grid at 2 layers (6000 taps)
        {"default6k", 6000, 512, 12, 900.0, 22, 16, 1.0, false, true, def},
        {"air6k", 6000, 512, 12, 900.0, 22, 16, 1.0, false, true, air},
        {"bypass6k", 6000, 512, 12, 900.0, 22, 16, 1.0, false, true, bypass},
        {"sharp6k", 6000, 512, 12, 900.0, 22, 16, 1.0, false, true, sharp},
        {"notail6k", 6000, 512, 12, 900.0, 22, 16, 1.0, false, true, notail},
        {"mult4_6k", 6000, 512, 12, 900.0, 22, 16, 1.0, false, true, mult4},
        // scale + zero-latency direct head
        {"direct6k", 6000, 512, 12, 900.0, 22, 16, 0.5, true, true, def},
        // small block (L0 partition = block = 128)
        {"blk128", 3500, 128, 13, 700.0, 23, 40, 1.0, false, true, def},
    };

    std::printf("{\n\"sample_rate\": %.17g,\n", SR);
    std::printf("\"cases\": [\n");
    bool first = true;
    for (const Case& c : cases) {
        std::vector<double> ir;
        if (c.ir_seed == 0) {
            ir.resize(static_cast<size_t>(c.ir_len));
            for (int i = 0; i < c.ir_len; ++i)
                ir[static_cast<size_t>(i)] =
                    (std::sin(static_cast<double>(i) * 0.1) > 0.0) ? 1.0
                                                                   : -1.0;
        } else {
            ir = decay_ir(c.ir_len, c.ir_seed, c.ir_tau);
        }

        const size_t total =
            static_cast<size_t>(c.nblocks) * static_cast<size_t>(c.block);
        std::vector<double> input;
        if (c.in_seed == 0) {
            input.assign(total, 0.0);
            input[0] = 1.0;
            if (total > 700) input[700] = -0.75;
        } else {
            input = rand_sig(total, c.in_seed);
        }

        MKLNonUniformConvolver conv;
        const bool ok = conv.SetImpulse(ir.data(), c.ir_len, c.block,
                                        c.scale, c.direct_head,
                                        c.has_spec ? &c.spec : nullptr);
        if (!ok) {
            std::fprintf(stderr, "SetImpulse failed for %s\n", c.name);
            return 1;
        }
        std::vector<double> out = stream(conv, input, c.block);

        std::printf("%s{\"name\": \"%s\", \"ir_len\": %d, \"block\": %d, "
                    "\"ir_seed\": %llu, \"ir_tau\": %.17g, "
                    "\"in_seed\": %llu, \"nblocks\": %d, "
                    "\"scale\": %.17g, \"direct_head\": %s, "
                    "\"has_spec\": %s,\n",
                    first ? "" : ",", c.name, c.ir_len, c.block,
                    (unsigned long long)c.ir_seed, c.ir_tau,
                    (unsigned long long)c.in_seed, c.nblocks, c.scale,
                    c.direct_head ? "true" : "false",
                    c.has_spec ? "true" : "false");
        first = false;
        if (c.has_spec)
            std::printf("\"spec\": {\"hc\": %d, \"lc\": %d, \"tail_mode\": "
                        "%d, \"tail_enabled\": %s, \"tail_start\": %.17g, "
                        "\"tail_strength\": %.17g, \"mult\": %d},\n",
                        (int)c.spec.hcMode, (int)c.spec.lcMode,
                        c.spec.tailMode,
                        c.spec.tailEnabled ? "true" : "false",
                        c.spec.tailStartSeconds, c.spec.tailStrength,
                        c.spec.tailL1L2Multiplier);
        std::printf("\"latency\": %d,\n", conv.getLatency());
        dump_array("output", out.data(), out.size(), "}");
    }
    std::printf("],\n");

    // ── long 3-layer case: 600k-tap IR, windows + strided signature ──
    {
        const int irLen = 600000, block = 512, nblocks = 710;
        std::vector<double> ir = decay_ir(irLen, 31, 120000.0);
        const size_t total = static_cast<size_t>(nblocks) * block;
        std::vector<double> input = rand_sig(total, 41);

        MKLNonUniformConvolver conv;
        FilterSpec spec{};
        if (!conv.SetImpulse(ir.data(), irLen, block, 1.0, false, &spec)) {
            std::fprintf(stderr, "SetImpulse failed for long case\n");
            return 1;
        }
        std::vector<double> out = stream(conv, input, block);

        std::printf("\"long\": {\"ir_len\": %d, \"block\": %d, "
                    "\"ir_seed\": 31, \"ir_tau\": 120000.0, "
                    "\"in_seed\": 41, \"nblocks\": %d, \"latency\": %d,\n",
                    irLen, block, nblocks, conv.getLatency());
        dump_array("ir_head", ir.data(), 64, ",");
        dump_array("input_head", input.data(), 64, ",");
        dump_array("out_first", out.data(), 8192, ",");
        // window where L2 output is live (t ~ 270k > l0+l1 span)
        dump_array("out_mid", out.data() + 270336, 4096, ",");
        // strided global signature
        {
            std::vector<double> sig;
            for (size_t i = 0; i < out.size(); i += 61) sig.push_back(out[i]);
            dump_array("out_strided61", sig.data(), sig.size(), ",");
        }
        // per-4096-chunk RMS
        {
            std::vector<double> r;
            for (size_t i = 0; i + 4096 <= out.size(); i += 4096) {
                double acc = 0.0;
                for (size_t j = 0; j < 4096; ++j)
                    acc += out[i + j] * out[i + j];
                r.push_back(std::sqrt(acc / 4096.0));
            }
            dump_array("out_rms4096", r.data(), r.size(), "}");
        }
    }
    std::printf("}\n");
    return 0;
}
