"""Peak limiter: exact scan vs golden loop; parallel max-plus bound."""
import numpy as np
import jax.numpy as jnp

from convopeq_tpu.ops.limiter import peak_limiter

RNG = np.random.default_rng(27)
SR = 48000.0


def golden_limiter(L, R, sr, threshold, knee, release_ms):
    r = np.exp(-1.0 / (sr * release_ms * 0.001))
    clip_start = threshold - knee * 0.5
    env = 1.0
    outL = np.empty_like(L)
    outR = np.empty_like(R)
    for i in range(len(L)):
        peak = max(abs(L[i]), abs(R[i]))
        safe = max(peak, 1e-12)
        desired = 1.0
        if safe > clip_start:
            if safe <= threshold:
                t = (safe - clip_start) / knee
                ks = t * t * (3.0 - 2.0 * t)
                desired = 1.0 - (1.0 - threshold / safe) * ks
            else:
                desired = threshold / safe
        if desired < env:
            env = desired
        else:
            env = 1.0 + (env - 1.0) * r
        outL[i] = L[i] * env
        outR[i] = R[i] * env
    return outL, outR, env


def _sig(n=4000):
    t = np.arange(n) / SR
    burst = np.where((t > 0.02) & (t < 0.04), 2.0, 0.3)
    return np.stack([burst * np.sin(2 * np.pi * 700 * t),
                     burst * np.sin(2 * np.pi * 900 * t)])


def test_exact_matches_golden():
    x = _sig()
    thr, knee, rel = 0.891, 0.122, 100.0
    y, env = peak_limiter(jnp.asarray(x), SR, thr, knee, rel, exact=True)
    gl, gr, genv = golden_limiter(x[0], x[1], SR, thr, knee, rel)
    np.testing.assert_allclose(np.asarray(y)[0], gl, atol=1e-13)
    np.testing.assert_allclose(np.asarray(y)[1], gr, atol=1e-13)
    assert abs(float(env) - genv) < 1e-13


def test_parallel_within_documented_bound():
    x = _sig()
    thr, knee, rel = 0.891, 0.122, 100.0
    y_f, _ = peak_limiter(jnp.asarray(x), SR, thr, knee, rel, exact=False)
    y_e, _ = peak_limiter(jnp.asarray(x), SR, thr, knee, rel, exact=True)
    r = np.exp(-1.0 / (SR * rel * 0.001))
    # gain deviation bounded by one release step
    dev = np.abs(np.asarray(y_f) - np.asarray(y_e)).max()
    assert dev <= (1.0 - r) * np.abs(x).max() * 1.5, dev


def test_limits_peaks():
    x = _sig()
    y, _ = peak_limiter(jnp.asarray(x), SR, 0.891, 0.122, 100.0)
    # instant attack: output peak can't exceed threshold by more than the
    # knee rounding
    assert np.abs(np.asarray(y)).max() <= 0.9
    # quiet passages pass (release has recovered by the end)
    assert np.abs(np.asarray(y)[:, -100:]).max() > 0.15  # release recovering


def test_state_carry():
    x = _sig()
    y_full, env_full = peak_limiter(jnp.asarray(x), SR, exact=True)
    y1, e1 = peak_limiter(jnp.asarray(x[..., :2000]), SR, exact=True)
    y2, e2 = peak_limiter(jnp.asarray(x[..., 2000:]), SR, env0=e1, exact=True)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1),
        np.asarray(y_full), atol=1e-13)


def test_peak_hold_analyzer():
    from convopeq_tpu.models.metering import (
        spectrum_frames, spectrum_peak_hold)
    n = 48000
    t = np.arange(n) / SR
    burst = np.where(t < 0.2, 0.8, 0.01) * np.sin(2 * np.pi * 1000 * t)
    mags = np.asarray(spectrum_frames(jnp.asarray(burst)))
    held = np.asarray(spectrum_peak_hold(jnp.asarray(burst), SR, 1.0))
    assert held.shape == mags.shape
    b = int(round(1000 * 4096 / SR))
    # after the burst ends, the held value keeps the peak (1 s hold covers
    # the whole remaining signal here) while the raw frame decays
    late = mags.shape[0] - 2
    assert held[late, b] > 10 * mags[late, b]
    assert np.all(held >= mags - 1e-12)
