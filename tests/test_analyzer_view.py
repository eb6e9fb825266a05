"""Analyzer display surface: bars, EQ overlay, peak-hold, adaptive rate."""
import numpy as np

from convopeq_tpu.models.analyzer_view import (
    AnalyzerView, NUM_DISPLAY_BARS, MIN_DB, MAX_DB, adaptive_timer_hz,
    bins_to_bars, display_frequencies, eq_overlay_curves)
from convopeq_tpu.models.eq import EQParams

SR = 48000.0


def test_display_frequencies_span_and_monotonic():
    f = display_frequencies()
    assert f.shape == (NUM_DISPLAY_BARS,)
    assert abs(f[0] - 20.0) < 1e-6          # x=0 -> logT=0 -> 20 Hz
    assert abs(f[-1] - 20000.0) < 1e-2      # x=1 -> logT=1 -> 20 kHz
    assert np.all(np.diff(f) > 0)


def test_bins_to_bars_interpolates_a_tone():
    nbins = 2049
    bins_db = np.full(nbins, -80.0)
    # put a 0 dB tone exactly at bin of 1 kHz
    bin_1k = int(round(1000.0 * 4096 / SR))
    bins_db[bin_1k] = 0.0
    bars = bins_to_bars(bins_db, SR)
    f = display_frequencies()
    near = np.argmin(np.abs(f - 1000.0))
    # dB-space linear interpolation (reference behavior): the 1 kHz bar
    # sits ~half a bin off the tone bin, so ~-40 dB of the 0 dB peak
    assert bars[near] > -45.0
    assert bars[0] <= MIN_DB + 1e-6 or bars[0] < -70.0
    assert np.all(bars <= MAX_DB) and np.all(bars >= MIN_DB)


def test_analyzer_view_peak_hold_and_decay():
    v = AnalyzerView(SR)
    t = np.arange(48000) / SR
    tone = np.sin(2 * np.pi * 1000.0 * t) * 0.5
    v.push(tone)
    b1 = v.bars()
    near = np.argmin(np.abs(b1["freqs"] - 1000.0))
    assert b1["bars_db"][near] > -30.0
    assert b1["peaks_db"][near] >= b1["bars_db"][near] - 1e-9
    # silence: smoothed falls, peak holds then decays toward it
    v.push(np.zeros(48000))
    b2 = v.bars()
    assert b2["bars_db"][near] < b1["bars_db"][near]
    assert b2["peaks_db"][near] >= b2["bars_db"][near] - 1e-9


def test_eq_overlay_total_and_band_routing():
    p = EQParams()
    p.enabled[:] = False
    p.set_band(0, band_type=1, freq=1000.0, gain_db=6.0, q=1.0, mode=0,
               enabled=True)                 # stereo peaking +6
    p.set_band(1, band_type=1, freq=5000.0, gain_db=-9.0, q=2.0, mode=2,
               enabled=True)                 # right-only cut
    c = eq_overlay_curves(p, SR)
    f = c["freqs"]
    i1k = np.argmin(np.abs(f - 1000.0))
    i5k = np.argmin(np.abs(f - 5000.0))
    assert abs(c["total_l"][i1k] - 6.0) < 0.3
    assert abs(c["total_r"][i1k] - 6.0) < 0.3
    assert c["total_l"][i5k] > -1.5          # left unaffected by band 1
    assert c["total_r"][i5k] < -7.0          # right cut
    assert abs(c["bands_l"][0][i1k] - 6.0) < 0.3
    assert np.all(c["bands_l"][1] == 0.0)    # right-only band: L curve flat
    assert c["bands_r"][1][i5k] < -7.0
    # disabled bands stay flat
    assert np.all(c["bands_l"][5] == 0.0)


def test_adaptive_timer_rates():
    assert adaptive_timer_hz(True, True) == 60
    assert adaptive_timer_hz(False, True) == 15
    assert adaptive_timer_hz(True, False) == 5


def test_analyzer_view_fifo_across_pushes():
    """Blocks shorter than fft_size accumulate in the FIFO (never
    analyzed as mostly-zero frames), and block-split feeding equals
    one-shot feeding of the same contiguous signal."""
    import numpy as np
    from convopeq_tpu.models.analyzer_view import AnalyzerView

    sr = 48000.0
    n = 4096 * 3
    t = np.arange(n) / sr
    x = 0.5 * np.sin(2 * np.pi * 1000.0 * t)

    one = AnalyzerView(sr)
    one.push(x)

    split = AnalyzerView(sr)
    for k in range(0, n, 1024):              # callback-sized blocks
        split.push(x[k:k + 1024])
    np.testing.assert_allclose(split.smoothed, one.smoothed, atol=1e-9)
    np.testing.assert_allclose(split.peak, one.peak, atol=1e-9)

    # first short push holds samples, produces no frame
    held = AnalyzerView(sr)
    before = held.smoothed.copy()
    held.push(x[:1024])
    np.testing.assert_array_equal(held.smoothed, before)
    assert held._fifo.size == 1024
