// Ground-truth vector dump for the reference's COMPLETE EQ engine:
// compiles all nine EQProcessor TUs UNMODIFIED
// (Core/Processing/Coefficients/Parameters/ProcessingCache/BandHelper/
// EQResponseSampler/PeakEstimator/UpperBoundEstimator) against the stub
// JUCE/ISR headers and drives the real
// prepareToPlay -> setters -> process() pipeline block by block.  This
// pins END-TO-END band routing semantics that the kernel-level dumps
// (dump_eq_kernel.cpp) cannot: serial cascade order, parallel
// accumulation, the serial->parallel structure crossfade, Mid/Side and
// Left/Right channel routing, per-band enable/0.01 dB-skip, saturation
// on the full path, and block-rate AGC — as computed by the reference's
// own compiled code (EQProcessor.Processing.cpp:486-1050).
//
// The RCU/epoch machinery runs for real (single-threaded); the retire
// coordinator is absent so superseded states take the guarded drop path
// (EQProcessor.Core.cpp:37-41) — a leak, not a behavior change.
// Only the dumped vectors JSON is committed.
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <JuceHeader.h>
#include "eqprocessor/EQProcessor.h"

static constexpr int BLOCK = 512;
static constexpr int NBLOCKS = 8;

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

static void dump_array(const char* name, const double* a, int n,
                       const char* tail) {
    std::printf("\"%s\": [", name);
    for (int i = 0; i < n; ++i)
        std::printf("%.17g%s", a[i], i + 1 < n ? "," : "");
    std::printf("]%s", tail);
}

struct Band {
    int idx;
    EQBandType type;
    float freq, gain, q;
    EQChannelMode mode;
};

struct Case {
    const char* name;
    double sr;
    std::vector<Band> bands;
    EQProcessor::FilterStructure structure;
    float saturation;
    bool agc;
    double in_scale;        // dyadic => bit-exact in Python
    uint64_t seed;
    int silence_blocks;     // settle blocks (zeros) before the program
};

int main() {
    using FS = EQProcessor::FilterStructure;
    using BT = EQBandType;
    using CM = EQChannelMode;

    std::vector<Case> cases = {
        {"serial_5types", 48000.0,
         {{0, BT::LowShelf, 100.0f, 6.0f, 0.9f, CM::Stereo},
          {1, BT::Peaking, 1000.0f, -4.0f, 2.0f, CM::Stereo},
          {2, BT::HighShelf, 8000.0f, 3.0f, 0.8f, CM::Stereo},
          {3, BT::LowPass, 15000.0f, 0.0f, 0.8f, CM::Stereo},
          {4, BT::HighPass, 40.0f, 0.0f, 0.7f, CM::Stereo}},
         FS::Serial, 0.0f, false, 0.5, 0x51, 0},
        {"ms_modes", 48000.0,
         {{0, BT::Peaking, 500.0f, 5.0f, 1.2f, CM::Mid},
          {1, BT::Peaking, 2000.0f, -5.0f, 1.5f, CM::Side},
          {2, BT::LowShelf, 200.0f, 4.0f, 0.8f, CM::Left},
          {3, BT::HighShelf, 5000.0f, 4.0f, 0.9f, CM::Right}},
         FS::Serial, 0.0f, false, 0.5, 0x52, 0},
        {"parallel", 48000.0,
         {{0, BT::Peaking, 300.0f, 6.0f, 1.0f, CM::Stereo},
          {1, BT::Peaking, 3000.0f, -6.0f, 2.0f, CM::Stereo},
          {2, BT::HighShelf, 10000.0f, 4.0f, 0.7f, CM::Stereo}},
         FS::Parallel, 0.0f, false, 0.5, 0x53, 1},
        {"parallel_ms", 48000.0,
         {{0, BT::Peaking, 400.0f, 5.0f, 1.0f, CM::Mid},
          {1, BT::Peaking, 2500.0f, -4.0f, 1.3f, CM::Stereo}},
         FS::Parallel, 0.0f, false, 0.5, 0x56, 1},
        {"saturated", 48000.0,
         {{0, BT::Peaking, 250.0f, 8.0f, 1.0f, CM::Stereo},
          {1, BT::Peaking, 1500.0f, -8.0f, 1.4f, CM::Stereo},
          {2, BT::Peaking, 6000.0f, 6.0f, 0.9f, CM::Stereo}},
         FS::Serial, 0.6f, false, 1.5, 0x54, 0},
        {"agc", 48000.0,
         {{0, BT::Peaking, 800.0f, 8.0f, 1.1f, CM::Stereo},
          {1, BT::LowShelf, 150.0f, 8.0f, 0.8f, CM::Stereo}},
         FS::Serial, 0.0f, true, 1.5, 0x55, 0},
        {"all20", 48000.0, {}, FS::Serial, 0.0f, false, 0.25, 0x57, 0},
        {"sr96k", 96000.0,
         {{0, BT::LowShelf, 100.0f, 6.0f, 0.9f, CM::Stereo},
          {1, BT::Peaking, 1000.0f, -4.0f, 2.0f, CM::Stereo},
          {2, BT::HighShelf, 8000.0f, 3.0f, 0.8f, CM::Stereo},
          {3, BT::LowPass, 30000.0f, 0.0f, 0.8f, CM::Stereo},
          {4, BT::HighPass, 40.0f, 0.0f, 0.7f, CM::Stereo}},
         FS::Serial, 0.0f, false, 0.5, 0x58, 0},
    };
    // all20: every band enabled, alternating gains, default-ish freqs
    for (int b = 0; b < 20; ++b) {
        const float f = 25.0f
            * std::pow(10.0f, static_cast<float>(b) * (2.9f / 19.0f));
        cases[6].bands.push_back({b, BT::Peaking, f,
                                  (b % 2 == 0) ? 3.0f : -3.0f,
                                  1.0f + 0.05f * static_cast<float>(b),
                                  CM::Stereo});
    }

    std::printf("{\n\"block\": %d, \"nblocks\": %d,\n\"cases\": [\n",
                BLOCK, NBLOCKS);
    for (size_t ci = 0; ci < cases.size(); ++ci) {
        const auto& c = cases[ci];
        EQProcessor eq;
        eq.prepareToPlay(c.sr, BLOCK);
        for (int b = 0; b < 20; ++b)
            eq.setBandEnabled(b, false);
        for (const auto& bd : c.bands) {
            eq.setBandType(bd.idx, bd.type);
            eq.setBandFrequency(bd.idx, bd.freq);
            eq.setBandGain(bd.idx, bd.gain);
            eq.setBandQ(bd.idx, bd.q);
            eq.setBandChannelMode(bd.idx, bd.mode);
            eq.setBandEnabled(bd.idx, true);
        }
        eq.setFilterStructure(c.structure);
        eq.setNonlinearSaturation(c.saturation);
        eq.setAGCEnabled(c.agc);

        XS rng(c.seed);
        const int total = NBLOCKS * BLOCK;
        std::vector<double> inL(total), inR(total), outL(total), outR(total);
        for (int i = 0; i < total; ++i) {
            inL[i] = rng.next() * c.in_scale;
            inR[i] = rng.next() * c.in_scale;
        }
        // settle blocks: zeros through the same path (absorbs the
        // serial->parallel structure crossfade on silence)
        std::vector<double> zl(BLOCK, 0.0), zr(BLOCK, 0.0);
        for (int sb = 0; sb < c.silence_blocks; ++sb) {
            double* chans[2] = {zl.data(), zr.data()};
            juce::dsp::AudioBlock<double> blk(chans, 2,
                                              static_cast<size_t>(BLOCK));
            eq.process(blk);
            std::fill(zl.begin(), zl.end(), 0.0);
            std::fill(zr.begin(), zr.end(), 0.0);
        }
        for (int b = 0; b < NBLOCKS; ++b) {
            std::memcpy(outL.data() + b * BLOCK, inL.data() + b * BLOCK,
                        sizeof(double) * BLOCK);
            std::memcpy(outR.data() + b * BLOCK, inR.data() + b * BLOCK,
                        sizeof(double) * BLOCK);
            double* chans[2] = {outL.data() + b * BLOCK,
                                outR.data() + b * BLOCK};
            juce::dsp::AudioBlock<double> blk(chans, 2,
                                              static_cast<size_t>(BLOCK));
            eq.process(blk);
        }

        std::printf("{\"name\": \"%s\", \"sr\": %g, \"structure\": %d, "
                    "\"saturation\": %g, \"agc\": %s, \"in_scale\": %g, "
                    "\"seed\": %llu, \"silence_blocks\": %d,\n",
                    c.name, c.sr, static_cast<int>(c.structure),
                    static_cast<double>(c.saturation),
                    c.agc ? "true" : "false", c.in_scale,
                    static_cast<unsigned long long>(c.seed),
                    c.silence_blocks);
        std::printf("\"bands\": [");
        for (size_t bi = 0; bi < c.bands.size(); ++bi) {
            const auto& bd = c.bands[bi];
            std::printf("{\"idx\": %d, \"type\": %d, \"freq\": %.9g, "
                        "\"gain\": %.9g, \"q\": %.9g, \"mode\": %d}%s",
                        bd.idx, static_cast<int>(bd.type),
                        static_cast<double>(bd.freq),
                        static_cast<double>(bd.gain),
                        static_cast<double>(bd.q),
                        static_cast<int>(bd.mode),
                        bi + 1 < c.bands.size() ? "," : "");
        }
        std::printf("],\n");
        // analysis subsystem (PeakEstimator/UpperBoundEstimator/
        // EQResponseSampler via computeEstimatedMaxGainComplex) at the
        // base and 4x-oversampled processing rates — the values the
        // Builder feeds AutoGainPlanner (RebuildDispatch.cpp:666-679)
        std::printf("\"analysis\": [");
        for (int osi = 0; osi < 2; ++osi) {
            const double rate = c.sr * (osi == 0 ? 1.0 : 4.0);
            auto* st = eq.getEQState();
            const auto r = eq.computeEstimatedMaxGainComplex(*st, rate);
            std::printf("{\"rate\": %g, \"measured_db\": %.9g, "
                        "\"measured_hz\": %.9g, \"measured_raw_db\": %.9g, "
                        "\"upper_db\": %.9g, \"upper_hz\": %.9g, "
                        "\"max_q\": %.9g}%s",
                        rate, static_cast<double>(r.measured.gainDb),
                        static_cast<double>(r.measured.freqHz),
                        static_cast<double>(r.measuredRawGainDb),
                        static_cast<double>(r.upperBound.gainDb),
                        static_cast<double>(r.upperBound.freqHz),
                        static_cast<double>(r.maxActiveQ),
                        osi == 0 ? "," : "");
        }
        std::printf("],\n");
        dump_array("out_l", outL.data(), total, ",\n");
        dump_array("out_r", outR.data(), total, "\n");
        std::printf("}%s\n", ci + 1 < cases.size() ? "," : "");
    }
    std::printf("]\n}\n");
    return 0;
}
