"""Train adaptive lattice-shaper coefficient banks offline and persist
them as the repo's factory-bank fixture.

The reference learns banks at runtime (10-80 min of program material,
ARCHITECTURE.md:44) and persists them in device_settings.xml; the rebuild's
equivalent persisted artifact is `convopeq_tpu/data/learned_banks.json`
(AdaptiveCoefficientBanks.to_dict layout, bank index keyed per
coefficient_bank_index).  bench.py config6 consumes the 384 kHz / 24-bit
bank; tests/test_learner.py pins per-bank quality gains against this file.

Deterministic: fixed seeds, fixed program-material fixture (tone stack +
pink-ish noise floor), fixed generation count.  Run on CPU f64:

    python tools/train_banks.py            # trains + writes the fixture
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from convopeq_tpu.models.learner import (  # noqa: E402
    AdaptiveCoefficientBanks, NoiseShaperLearner, K_FFT_LENGTH,
    coefficient_bank_index)

OUT = os.path.join(os.path.dirname(__file__), "..", "convopeq_tpu", "data",
                   "learned_banks.json")

# (sample_rate, bit_depth, mode): a representative spread of the 180-bank
# surface — 44.1k/16/Short (CD), 96k/24/Medium, 384k/24/Long (the bench
# config6 bank: dither SR band 4, PsychoacousticDither.h:253-258), and
# 48k/16/Short (the most common playback config).
BANKS = [
    (44100.0, 16, 0),
    (48000.0, 16, 0),
    (96000.0, 24, 2),
    (384000.0, 24, 5),
]
GENERATIONS = 12


def program_material(sr: float, seed: int = 7) -> np.ndarray:
    """Deterministic music-like fixture: harmonic tone stack + low noise
    floor (the learner cost needs tonal maskers; pure noise masks
    everything and flattens the objective)."""
    rng = np.random.default_rng(seed)
    n = K_FFT_LENGTH
    t = np.arange(n) / sr
    audio = np.zeros((2, n))
    for f0, a in [(220.0, 0.4), (440.0, 0.25), (660.0, 0.12),
                  (1320.0, 0.06), (3300.0, 0.03)]:
        ph = rng.uniform(0, 2 * np.pi, size=2)[:, None]
        audio += a * np.sin(2 * np.pi * f0 * t[None] + ph)
    audio += 0.002 * rng.normal(size=(2, n))
    return audio / (np.abs(audio).max() * 1.5)


EVAL_BLOCKS = 16    # warm-started stationary objective (see
                    # NoiseShaperLearner.eval_blocks): the fir ladder's
                    # closed loop can carry bursty multi-10k-sample limit
                    # cycles that a single zero-state 4096 window scores
                    # as quiet.


def long_run_screen(k, sr, bits, n=300_000, seed=2):
    """Stationary noise profile of a bank over n samples on the
    production (fir) ladder: (early_rms_lsb, late_rms_lsb, state_max)."""
    import jax.numpy as jnp
    from convopeq_tpu.models.dither import lattice_dither, quant_scales
    from convopeq_tpu.utils.dsputil import K_OUTPUT_HEADROOM
    rng = np.random.default_rng(seed)
    # clip gaussian tails: |x*h| > 1 hits the quantizer's fullscale clip
    # whose (legitimate) error is thousands of LSB and would read as a
    # shaper "burst" in a windowed RMS
    x = jnp.asarray(np.clip(rng.normal(size=(1, n)) * 0.25, -0.9, 0.9),
                    jnp.float64)
    u = jnp.asarray(rng.random(size=(1, n, 2)), jnp.float64)
    scale, _ = quant_scales(bits)
    q, sf = lattice_dither(x, u, np.asarray(k), bits, ladder="fir",
                           return_state=True)
    e = (np.asarray(q)[0] - np.asarray(x)[0] * K_OUTPUT_HEADROOM) / scale
    early = float(np.sqrt(np.mean(e[:32768] ** 2)))
    late = float(np.sqrt(np.mean(e[-32768:] ** 2)))
    smax = float(np.max(np.abs(np.asarray(sf))) / scale)
    return early, late, smax


def main():
    banks = AdaptiveCoefficientBanks()
    report = {}
    for sr, bits, mode in BANKS:
        t0 = time.time()
        learner = NoiseShaperLearner(sr, bits, mode=mode, seed=0,
                                     eval_blocks=EVAL_BLOCKS)
        audio = program_material(sr)
        flat = float(learner._cost(np.zeros(9), audio))
        st = None
        for _ in range(GENERATIONS):
            st = learner.feed(audio, generations=1)
        banks.store_state(st, sr, bits, mode)
        gain = flat / max(st.best_score, 1e-30)
        early, late, smax = long_run_screen(st.best_coefficients, sr, bits)
        # hard screen: a factory bank must be stationary (no rail, no
        # late-onset burst) — the defect class this trainer exists to
        # exclude (the reference ladder rails for ANY bank; the fir
        # ladder is bounded but can resonate)
        assert late < 8.0 and late < 3.0 * early + 1.0, (
            sr, bits, mode, early, late)
        report[str(coefficient_bank_index(sr, bits, mode))] = {
            "sample_rate": sr, "bit_depth": bits, "mode": mode,
            "ladder": "fir",
            "flat_cost": flat, "best_score": st.best_score,
            "gain_x": round(gain, 2), "generations": st.generations,
            "long_run_rms_lsb": {"early": round(early, 3),
                                 "late": round(late, 3),
                                 "state_max": round(smax, 3)},
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"bank sr={sr:.0f} bits={bits} mode={mode}: "
              f"gain {gain:.2f}x longrun {early:.2f}->{late:.2f} LSB "
              f"in {time.time() - t0:.0f}s", flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"banks": banks.to_dict(), "training": report}, f,
                  indent=1)
    print("wrote", os.path.normpath(OUT))


if __name__ == "__main__":
    main()
