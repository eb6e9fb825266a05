// Ground truth from the reference's AllpassDesigner (AllpassDesigner.cpp
// compiled UNMODIFIED with the JUCE stub):
//  - sectionGroupDelayRhoTheta + SecondOrderAllpass::response formula
//    grids (pure deterministic math, pinned at roundoff);
//  - computeResponse over a fixed section cascade;
//  - the Greedy+AdaGrad design() path (grid search + finite-difference
//    AdaGrad per section on the GD residual) — fully deterministic, so
//    the designed (rho, theta) sections are exact ground truth;
//  - designWithCMAES with its default fixed seed (std::mt19937) — the
//    achieved cost is a quality bar for our independent CMA-ES designer
//    (sections are RNG-stream-dependent, so only the cost transfers).
#include <cmath>
#include <complex>
#include <cstdio>
#include <vector>

#include "AllpassDesigner.h"

using convo::AllpassDesigner;
using convo::SecondOrderAllpass;

static void dump_array(const char* name, const std::vector<double>& a,
                       bool last) {
    std::printf("    \"%s\": [", name);
    for (size_t i = 0; i < a.size(); ++i)
        std::printf("%.17g%s", a[i], i + 1 < a.size() ? "," : "");
    std::printf("]%s\n", last ? "" : ",");
}

static std::vector<double> log_freqs(int n, double lo, double hi) {
    std::vector<double> f((size_t)n);
    for (int i = 0; i < n; ++i)
        f[(size_t)i] = lo * std::pow(hi / lo, i / (double)(n - 1));
    return f;
}

int main() {
    const double sr = 48000.0;
    std::printf("{\n");

    // ---- formula grids -------------------------------------------------
    {
        const double rhos[] = {0.0, 0.3, 0.7, 0.95, 0.995};
        const double thetas[] = {0.1, 1.0, 2.0, 3.1};
        auto freqs = log_freqs(24, 20.0, 23000.0);
        std::vector<double> gd, re, im, rv, tv, ov;
        for (double rho : rhos)
            for (double th : thetas)
                for (double f : freqs) {
                    const double om = 2.0 * M_PI * f / sr;
                    rv.push_back(rho); tv.push_back(th); ov.push_back(om);
                    gd.push_back(AllpassDesigner::sectionGroupDelayRhoTheta(
                        rho, th, om, sr));
                    SecondOrderAllpass s; s.rho = rho; s.theta = th;
                    auto h = s.response(om);
                    re.push_back(h.real()); im.push_back(h.imag());
                }
        std::printf("  \"formula\": {\n");
        dump_array("rho", rv, false);
        dump_array("theta", tv, false);
        dump_array("omega", ov, false);
        dump_array("gd", gd, false);
        dump_array("h_re", re, false);
        dump_array("h_im", im, true);
        std::printf("  },\n");
    }

    // ---- computeResponse over a fixed cascade --------------------------
    {
        std::vector<SecondOrderAllpass> secs;
        const double rr[] = {0.2, 0.5, 0.8, 0.92, 0.97, 0.4};
        const double tt[] = {0.05, 0.3, 0.9, 1.7, 2.6, 3.0};
        for (int i = 0; i < 6; ++i) {
            SecondOrderAllpass s; s.rho = rr[i]; s.theta = tt[i];
            secs.push_back(s);
        }
        auto freqs = log_freqs(64, 20.0, 20000.0);
        auto resp = AllpassDesigner::computeResponse(secs, sr, freqs);
        std::vector<double> re, im;
        for (auto& h : resp) { re.push_back(h.real()); im.push_back(h.imag()); }
        std::printf("  \"compute_response\": {\n");
        dump_array("freq_hz", freqs, false);
        dump_array("h_re", re, false);
        dump_array("h_im", im, true);
        std::printf("  },\n");
    }

    // ---- Greedy+AdaGrad design (deterministic) -------------------------
    {
        std::printf("  \"greedy\": [\n");
        struct TC { int nsec; double amp, f0, w, base; };
        const TC tcs[] = {
            {4, 40.0, 300.0, 1.2, 2.0},
            {8, 120.0, 900.0, 0.8, 5.0},
            {8, 25.0, 4000.0, 2.0, 0.0},
        };
        const int ntc = (int)(sizeof(tcs) / sizeof(tcs[0]));
        for (int t = 0; t < ntc; ++t) {
            auto freqs = log_freqs(128, 20.0, 20000.0);
            std::vector<double> target(freqs.size());
            for (size_t i = 0; i < freqs.size(); ++i) {
                const double l = std::log(freqs[i] / tcs[t].f0);
                target[i] = tcs[t].base
                    + tcs[t].amp * std::exp(-l * l / (tcs[t].w * tcs[t].w));
            }
            AllpassDesigner::Config cfg;  // defaults: 50 iters, lr 0.01
            cfg.numSections = tcs[t].nsec;
            std::vector<SecondOrderAllpass> secs;
            AllpassDesigner designer;
            const bool ok = designer.design(sr, freqs, target, cfg, secs);
            std::vector<double> rho, theta;
            for (auto& s : secs) { rho.push_back(s.rho); theta.push_back(s.theta); }
            // residual cost after design (sum of squared GD error)
            double cost = 0.0;
            for (size_t i = 0; i < freqs.size(); ++i) {
                double tau = 0.0;
                const double om = 2.0 * M_PI * freqs[i] / sr;
                for (auto& s : secs)
                    tau += AllpassDesigner::sectionGroupDelayRhoTheta(
                        s.rho, s.theta, om, sr);
                const double d = tau - target[i];
                cost += d * d;
            }
            std::printf("  {\n    \"ok\": %d, \"num_sections\": %d, "
                        "\"cost\": %.17g,\n", ok ? 1 : 0, tcs[t].nsec, cost);
            dump_array("freq_hz", freqs, false);
            dump_array("target_gd", target, false);
            dump_array("rho", rho, false);
            dump_array("theta", theta, true);
            std::printf("  }%s\n", t + 1 < ntc ? "," : "");
        }
        std::printf("  ],\n");
    }

    // ---- CMA-ES design: achieved cost with the default fixed seed ------
    {
        auto freqs = log_freqs(96, 20.0, 20000.0);
        std::vector<double> target(freqs.size());
        for (size_t i = 0; i < freqs.size(); ++i) {
            const double l = std::log(freqs[i] / 700.0);
            target[i] = 3.0 + 80.0 * std::exp(-l * l / 1.0);
        }
        AllpassDesigner::Config cfg;
        cfg.numSections = 8;
        cfg.method = convo::OptimizationMethod::CMAES;
        std::vector<SecondOrderAllpass> secs;
        AllpassDesigner designer;
        const auto res = designer.designWithCMAES(sr, freqs, target, cfg, secs);
        std::vector<double> rho, theta;
        for (auto& s : secs) { rho.push_back(s.rho); theta.push_back(s.theta); }
        double cost = 0.0;
        for (size_t i = 0; i < freqs.size(); ++i) {
            double tau = 0.0;
            const double om = 2.0 * M_PI * freqs[i] / sr;
            for (auto& s : secs)
                tau += AllpassDesigner::sectionGroupDelayRhoTheta(
                    s.rho, s.theta, om, sr);
            const double d = tau - target[i];
            cost += d * d;
        }
        std::printf("  \"cmaes\": {\n    \"result\": %d, \"cost\": %.17g,\n",
                    (int)res, cost);
        dump_array("freq_hz", freqs, false);
        dump_array("target_gd", target, false);
        dump_array("rho", rho, false);
        dump_array("theta", theta, true);
        std::printf("  }\n");
    }

    std::printf("}\n");
    return 0;
}
