"""End-to-end CLI surface test (the headless MainWindow/panel analog).

Drives `convopeq_tpu.cli.main` in-process over tmp WAV fixtures: flag
parsing, the full offline processing path, and the preset save/load
round trip (the reference's preset-XML behavior: settings persist,
IR audio does not — DeviceSettings.cpp stores parameters only).
"""
import numpy as np
import pytest

from convopeq_tpu import cli
from convopeq_tpu.utils.wavio import read_wav, write_wav

RNG = np.random.default_rng(5)


def _fixtures(tmp_path):
    sr = 48000
    x = (RNG.normal(size=(2, 4096)) * 0.2).astype(np.float32)
    ir = (RNG.normal(size=2000) * np.exp(-np.arange(2000) / 300.0)
          ).astype(np.float32) * 0.5
    inp = tmp_path / "in.wav"
    irp = tmp_path / "ir.wav"
    write_wav(str(inp), x, sr)
    write_wav(str(irp), ir[None], sr)
    return inp, irp, x


def test_cli_offline_roundtrip_and_state(tmp_path, capsys):
    inp, irp, x = _fixtures(tmp_path)
    out1 = tmp_path / "out1.wav"
    state = tmp_path / "preset.json"

    # NOTE: no --mix — changing the mix triggers the per-sample smoothing
    # ramp from the default 1.0 on the first run, while a state-loaded
    # engine starts AT the target (no ramp), so outputs would differ by
    # the ramp on purpose (the mixSmoother path).
    rc = cli.main([str(inp), str(out1), "--ir", str(irp),
                   "--eq", "0:peaking:1000:+6:1.4",
                   "--eq", "3:highshelf:8000:-3:0.7",
                   "--softclip", "0.25",
                   "--save-state", str(state), "--measure"])
    assert rc == 0
    txt = capsys.readouterr().out
    assert "latency:" in txt and "LUFS" in txt
    y1 = read_wav(str(out1))
    assert y1.samples.shape == x.shape
    assert np.isfinite(y1.samples).all()
    # the chain actually did something
    assert not np.allclose(y1.samples, x, atol=1e-4)

    # preset round trip: settings come from the state file (no --eq /
    # --softclip flags), IR is re-loaded (presets persist parameters,
    # not IR audio) -> byte-identical output
    out2 = tmp_path / "out2.wav"
    rc = cli.main([str(inp), str(out2), "--ir", str(irp),
                   "--load-state", str(state)])
    assert rc == 0
    y2 = read_wav(str(out2))
    np.testing.assert_array_equal(y1.samples, y2.samples)


def test_cli_bypass_paths(tmp_path):
    inp, _irp, x = _fixtures(tmp_path)
    out = tmp_path / "out.wav"
    # no --ir, no --eq: both stages bypassed.  The output conditioning
    # still runs unconditionally (as in the reference: EQ-last -> fixed
    # 20 Hz HPF + 19 kHz LPF, OutputFilter.h:9-16), so equality holds in
    # the passband, not sample-by-sample on full-band noise.
    rc = cli.main([str(inp), str(out)])
    assert rc == 0
    y = read_wav(str(out)).samples
    from convopeq_tpu.utils.dsputil import K_OUTPUT_HEADROOM
    X = np.fft.rfft(x, axis=-1) * K_OUTPUT_HEADROOM  # -1 dBFS out stage
    Y = np.fft.rfft(y, axis=-1)
    f = np.fft.rfftfreq(x.shape[-1], 1 / 48000.0)
    band = (f > 300.0) & (f < 15000.0)
    # magnitude comparison: the conditioning filters rotate phase near
    # their corners, but the passband must be gain-transparent
    err = np.abs(np.abs(Y[:, band]) - np.abs(X[:, band]))
    assert err.max() < 2e-2 * np.abs(X[:, band]).max()


def test_parse_eq_band():
    assert cli.parse_eq_band("0:peaking:1000:+6:1.4") == \
        (0, 1, 1000.0, 6.0, 1.4, 0)
    assert cli.parse_eq_band("19:highpass:30:0:0.7:4")[5] == 4
    with pytest.raises(ValueError):
        cli.parse_eq_band("0:peaking:1000")
    with pytest.raises(KeyError):
        cli.parse_eq_band("0:notch:1000:+6:1.4")
