// Dump ground-truth up/down-sampled blocks from the reference's own
// CustomInputOversampler (Kaiser-halfband cascade, AVX2 FMA kernels).
//
// The oversampler is deterministic, so its block outputs — including the
// stateful history across consecutive blocks — are exact ground truth
// for ops/oversample.py's design + streaming halfband paths.  Compiled
// against the read-only reference with the minimal JUCE stub; only the
// dumped vectors enter the repo.
#include <cmath>
#include <cstdio>
#include <vector>

#ifndef jassert
#define jassert(x) ((void)0)
#endif
#include "CustomInputOversampler.h"

static constexpr int BLOCK = 256;
static constexpr int NBLOCKS = 3;

static void dump_array(const char* name, const double* a, size_t n,
                       bool last) {
    std::printf("  \"%s\": [", name);
    for (size_t i = 0; i < n; ++i)
        std::printf("%.17g%s", a[i], i + 1 < n ? "," : "");
    std::printf("]%s\n", last ? "" : ",");
}

int main() {
    std::vector<double> inL(BLOCK * NBLOCKS), inR(BLOCK * NBLOCKS);
    for (int i = 0; i < BLOCK * NBLOCKS; ++i) {
        inL[i] = 0.42 * std::sin(2.0 * M_PI * 1234.5 * i / 48000.0)
               + 0.10 * std::sin(2.0 * M_PI * 17.0 * i / 48000.0);
        inR[i] = 0.33 * std::cos(2.0 * M_PI * 3456.7 * i / 48000.0);
    }

    std::printf("{\n");
    dump_array("input_l", inL.data(), inL.size(), false);
    dump_array("input_r", inR.data(), inR.size(), false);
    std::printf("  \"block\": %d,\n", BLOCK);

    struct Cfg { int ratio; CustomInputOversampler::Preset preset;
                 const char* tag; };
    const Cfg cfgs[] = {
        {2, CustomInputOversampler::Preset::IIRLike, "r2_iirlike"},
        {4, CustomInputOversampler::Preset::IIRLike, "r4_iirlike"},
        {8, CustomInputOversampler::Preset::IIRLike, "r8_iirlike"},
        {2, CustomInputOversampler::Preset::LinearPhase, "r2_linphase"},
        {4, CustomInputOversampler::Preset::LinearPhase, "r4_linphase"},
        {8, CustomInputOversampler::Preset::LinearPhase, "r8_linphase"},
    };
    const int ncfg = static_cast<int>(sizeof(cfgs) / sizeof(cfgs[0]));

    for (int c = 0; c < ncfg; ++c) {
        const auto& cfg = cfgs[c];
        CustomInputOversampler os;
        os.prepare(BLOCK, cfg.ratio, cfg.preset);

        std::vector<double> upL, upR, dnL(BLOCK * NBLOCKS),
            dnR(BLOCK * NBLOCKS);
        std::vector<double> bl(BLOCK), br(BLOCK);
        for (int b = 0; b < NBLOCKS; ++b) {
            for (int i = 0; i < BLOCK; ++i) {
                bl[i] = inL[b * BLOCK + i];
                br[i] = inR[b * BLOCK + i];
            }
            double* chans[2] = {bl.data(), br.data()};
            juce::dsp::AudioBlock<double> in(chans, 2,
                                             static_cast<size_t>(BLOCK));
            auto up = os.processUp(in, 2);
            const size_t un = up.getNumSamples();
            for (size_t i = 0; i < un; ++i) {
                upL.push_back(up.getChannelPointer(0)[i]);
                upR.push_back(up.getChannelPointer(1)[i]);
            }
            double* ochans[2] = {dnL.data() + b * BLOCK,
                                 dnR.data() + b * BLOCK};
            juce::dsp::AudioBlock<double> out(ochans, 2,
                                              static_cast<size_t>(BLOCK));
            os.processDown(up, out, 2);
        }
        char name[64];
        std::snprintf(name, sizeof name, "%s_up_l", cfg.tag);
        dump_array(name, upL.data(), upL.size(), false);
        std::snprintf(name, sizeof name, "%s_up_r", cfg.tag);
        dump_array(name, upR.data(), upR.size(), false);
        std::snprintf(name, sizeof name, "%s_down_l", cfg.tag);
        dump_array(name, dnL.data(), dnL.size(), false);
        std::snprintf(name, sizeof name, "%s_down_r", cfg.tag);
        dump_array(name, dnR.data(), dnR.size(), c + 1 == ncfg);
    }

    std::printf("}\n");
    return 0;
}
