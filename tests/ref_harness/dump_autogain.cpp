// Ground-truth vector dump for AutoGainPlanner — compiles the REFERENCE
// implementation (src/audioengine/AutoGainPlanner.cpp) directly against a
// one-function JUCE stub (jlimit).  Sweeps a grid of PlannerInputs across
// all four plan patterns plus the disabled/bypassed cases and dumps the
// resulting plans to JSON lines.
#include "audioengine/AutoGainPlanner.h"

#include <cstdio>
#include <vector>

int main() {
    const float eq_gains[] = {-3.0f, 0.0f, 0.3f, 0.5f, 0.50001f, 1.0f, 2.5f,
                              6.0f,  9.5f, 15.0f, 24.0f, 48.0f};
    const float qs[] = {0.01f, 0.5f, 0.707f, 0.70700001f, 1.0f, 3.3f, 10.0f,
                        20.0f};
    const float ir_peaks[] = {-6.0f, 0.0f, 0.5f, 1.0f, 1.5f, 4.2f, 11.0f,
                              30.0f};
    const bool flags[] = {false, true};

    printf("[\n");
    bool first = true;
    for (bool enabled : flags)
        for (bool eq_byp : flags)
            for (bool conv_byp : flags)
                for (int order = 0; order < 2; order++)
                    for (float g : eq_gains)
                        for (float q : qs)
                            for (float p : ir_peaks) {
                                PlannerInput in;
                                in.eqMaxGainDb = g;
                                in.eqMaxQ = q;
                                in.irFreqPeakGainDb = p;
                                AutoGainPlan plan = AutoGainPlanner::plan(
                                    enabled,
                                    static_cast<convo::ProcessingOrder>(order),
                                    eq_byp, conv_byp, in);
                                printf("%s[%d, %d, %d, %d, %.9g, %.9g, %.9g, "
                                       "%.9g, %.9g, %.9g]",
                                       first ? "" : ",\n", (int)enabled,
                                       (int)order, (int)eq_byp, (int)conv_byp,
                                       g, q, p, plan.inputHeadroomDb,
                                       plan.outputMakeupDb,
                                       plan.convolverInputTrimDb);
                                first = false;
                            }
    printf("\n]\n");
    return 0;
}
