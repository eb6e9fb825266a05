"""On-chip high-precision (dd) parity artifact: run the FULL chain in f64
on the TPU (XLA f64 software emulation; every FFT routed through the GEMM
DFT / scan paths — see ops/partitioned_conv.py, models/eq.py) and compare
against the CPU f64 reference output, which the test suite pins to the
reference's 64-bit semantics at <=1e-11.

Emits PARITY_TPU.json: chain RMS error (contract: <=1e-9) and the dd-mode
RTF on the headline 1M-tap + 20-band-EQ config, alongside the f32 fast
mode for context.  (Ref contract: 64-bit main path,
/root/reference/README.md:18; north star BASELINE.json.)

Usage: python tools/tpu_parity.py   (run from the repo root, TPU visible)
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 48000.0

_CPU_SNIPPET = r"""
import jax
# jax_platforms must be set via config: the axon sitecustomize overrides
# the JAX_PLATFORMS env var (see .claude/skills/verify/SKILL.md)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, %(repo)r)
from tools.tpu_parity import build_fixture
ir, p, cfg, x = build_fixture()
from convopeq_tpu.models.chain import process_chain
from convopeq_tpu.models.convolver import stereo_prepare
from convopeq_tpu.models.nuc import FilterSpec
conv = stereo_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=48000.0))
y = np.asarray(process_chain(jnp.asarray(x), cfg, p, conv))
np.save(%(out)r, y)
"""


_CPU_FOLDED_SNIPPET = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, %(repo)r)
from tools.tpu_parity import build_headline_fixture
ir, eqp, x = build_headline_fixture()
from convopeq_tpu.models.chain import (ChainConfig, prepare_folded_convolver,
                                       process_chain_fused)
from convopeq_tpu.models.nuc import FilterSpec
cfg = ChainConfig(sample_rate=48000.0)
conv = prepare_folded_convolver(ir, 512, FilterSpec(sample_rate=48000.0),
                                cfg, eqp, dtype=jnp.float64)
y = np.asarray(process_chain_fused(jnp.asarray(x, jnp.float64), cfg, conv))
np.save(%(out)r, y)
"""


def build_headline_fixture(seconds: float = 60.0):
    """The headline 1M-tap + 20-band-EQ config, plus a 60 s input used to
    pin the dd-FOLDED mode's OWN numerical error against a CPU f64
    golden of the same folded chain — so PARITY_TPU.json carries, for
    one config and one kernel path (the dd Pallas pipeline,
    ops/pallas_dd_fft.py), both the RMS contract and the RTF.  60 s
    (VERDICT r3 #8: was 2 s) makes the RMS claim robust against
    long-signal error accumulation in the dd recombinations."""
    from convopeq_tpu.models.eq import EQParams
    rng = np.random.default_rng(0)
    ir_len = 1_000_000
    decay = np.exp(-np.arange(ir_len) / (ir_len / 10.0))
    ir1m = np.stack([rng.normal(size=ir_len) * decay,
                     rng.normal(size=ir_len) * decay]) * 0.02
    eqp = EQParams()
    eqp.gains_db[:] = np.linspace(-4.0, 4.0, 20)
    x_small = np.random.default_rng(7).normal(
        size=(2, int(SR * seconds))) * 0.25
    return ir1m, eqp, x_small


def cpu_folded_reference(path="/tmp/convopeq_cpu_folded_ref.npy"):
    """f64 CPU golden of the folded headline chain (subprocess, CPU
    backend pinned)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = _CPU_FOLDED_SNIPPET % {"repo": REPO, "out": path}
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   cwd=REPO)
    return np.load(path)


def build_fixture():
    """Same class of fixture as tests/test_precision.py: 6k-tap stereo IR,
    4 active EQ bands (one M/S), soft clip, scan EQ."""
    from convopeq_tpu.models.chain import ChainConfig
    from convopeq_tpu.models.eq import EQParams
    rng = np.random.default_rng(99)
    n_ir = 6000
    t = np.arange(n_ir)
    ir = rng.normal(size=(2, n_ir)) * np.exp(-t / 800.0) * 0.3
    p = EQParams()
    p.enabled[:] = False
    for i, (bt, f, g, q, m) in enumerate([(0, 80, 3, 0.7, 0),
                                          (1, 500, -4, 1.2, 0),
                                          (1, 2000, 5, 2, 3),
                                          (2, 8000, 2, 0.7, 0)]):
        p.set_band(i, band_type=bt, freq=f, gain_db=g, q=q, mode=m,
                   enabled=True)
    cfg = ChainConfig(sample_rate=SR, soft_clip_enabled=True,
                      saturation_amount=0.25, eq_method="scan")
    x = rng.normal(size=(2, 8192)) * 0.25
    return ir, p, cfg, x


_CPU_CONV_SNIPPET = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, %(repo)r)
x = np.load(%(xin)r)
ir = np.load(%(irin)r)
from convopeq_tpu.models.convolver import stereo_prepare, convolver_process
from convopeq_tpu.models.nuc import FilterSpec
conv = stereo_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=48000.0))
y = np.asarray(convolver_process(jnp.asarray(x), conv, 1.0))
np.save(%(out)r, y)
"""


def _cpu_conv_golden(x, ir, path="/tmp/convopeq_cpu_conv_ref.npy"):
    """f64 CPU golden of the stereo nuc3 convolution (subprocess)."""
    np.save("/tmp/convopeq_conv_x.npy", np.asarray(x, np.float64))
    np.save("/tmp/convopeq_conv_ir.npy", np.asarray(ir, np.float64))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = _CPU_CONV_SNIPPET % {"repo": REPO,
                                "xin": "/tmp/convopeq_conv_x.npy",
                                "irin": "/tmp/convopeq_conv_ir.npy",
                                "out": path}
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   cwd=REPO)
    return np.load(path)


def cpu_reference(path="/tmp/convopeq_cpu_ref.npy"):
    """Compute the f64 CPU golden in a subprocess pinned to the CPU
    backend (keeps this process's TPU backend untouched)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = _CPU_SNIPPET % {"repo": REPO, "out": path}
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   cwd=REPO)
    return np.load(path)


def main():
    t_all = time.time()
    y_cpu = cpu_reference()
    print(f"cpu golden done ({time.time() - t_all:.0f}s)", file=sys.stderr)

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from convopeq_tpu.models.chain import ChainConfig, process_chain
    from convopeq_tpu.models.convolver import stereo_prepare
    from convopeq_tpu.models.eq import EQParams
    from convopeq_tpu.models.nuc import FilterSpec

    ir, p, cfg, x = build_fixture()
    dev = jax.devices()[0]
    out = os.path.join(REPO, "PARITY_TPU.json")
    result = {"device": str(dev)}

    def flush():
        with open(out, "w") as f:
            json.dump(result, f, indent=1)

    # --- parity: f64 chain on the chip vs the CPU f64 golden -------------
    conv = stereo_prepare(jax.device_put(jnp.asarray(ir), dev), 512,
                          FilterSpec(sample_rate=SR))
    fn = jax.jit(lambda v, c: process_chain(v, cfg, p, c))
    t0 = time.time()
    y_tpu = np.asarray(fn(jax.device_put(jnp.asarray(x), dev), conv))
    print(f"tpu f64 chain done ({time.time() - t0:.0f}s incl. compile)",
          file=sys.stderr)
    rel = float(np.sqrt(np.mean((y_tpu - y_cpu) ** 2))
                / np.sqrt(np.mean(y_cpu ** 2)))
    result["chain_rms_rel_err_f64_tpu_vs_f64_cpu"] = rel
    result["contract_1e-9"] = bool(rel <= 1e-9)
    flush()

    # --- dd-mode RTF on the headline config ------------------------------
    # The dd chain is jitted STAGE-WISE (eq / conv / output): one monolithic
    # f64-emulated graph at this size OOM-kills the TPU compile helper;
    # three smaller graphs compile fine and the 3 extra dispatches are in
    # the measurement (honest wall time).
    from convopeq_tpu.ops.dc_blocker import dc_block
    from convopeq_tpu.models.eq import eq_process_bands
    from convopeq_tpu.models.convolver import convolver_process
    from convopeq_tpu.models.output_filter import output_filter_process
    from convopeq_tpu.utils.dsputil import K_OUTPUT_HEADROOM

    seconds = 20.0
    n = int(SR * seconds)
    ir1m, eqp, x_small = build_headline_fixture()
    rng = np.random.default_rng(1)

    def stage_in_eq(v):
        v = jnp.where(jnp.isfinite(v) & (jnp.abs(v) >= 1e-20), v, 0.0)
        v = jnp.clip(v, -1.0, 1.0)
        v, _ = dc_block(v, SR, 3.0)
        return eq_process_bands(v, eqp, SR, method="scan")

    def stage_conv(v, c):
        return convolver_process(v, c, 1.0)

    def stage_out(v):
        v = output_filter_process(v, SR, True, cfg.conv_hc_mode,
                                  cfg.conv_lc_mode, cfg.eq_lpf_mode)
        v, _ = dc_block(v, SR, 3.0)
        return jnp.sum(jnp.abs(v * K_OUTPUT_HEADROOM))

    for label, dtype, batch in (("dd(f64)", jnp.float64, 4),
                                ("f32", jnp.float32, 4)):
        # each mode is its own artifact: record a failure and keep going
        # so one bad compile can't lose the rest of the artifact set
        try:
            conv_h = stereo_prepare(
                jax.device_put(jnp.asarray(ir1m, dtype), dev), 512,
                FilterSpec(sample_rate=SR))
            f1 = jax.jit(stage_in_eq)
            f2 = jax.jit(stage_conv)
            f3 = jax.jit(stage_out)
            fn_h = lambda v, c: float(f3(f2(f1(v), c)))
            xb = jax.device_put(
                jnp.asarray(rng.normal(size=(batch, 2, n)) * 0.25, dtype),
                dev)
            t0 = time.time()
            fn_h(xb, conv_h)
            print(f"{label} compile+warm {time.time() - t0:.0f}s",
                  file=sys.stderr)
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn_h(xb, conv_h)
                walls.append(time.perf_counter() - t0)
            rtf = batch * seconds / min(walls)
            result[f"rtf_{label}"] = round(rtf, 1)
            print(f"{label}: RTF {rtf:.0f}x", file=sys.stderr)
        except Exception as e:                       # noqa: BLE001
            result[f"rtf_{label}_error"] = repr(e)[:400]
            print(f"{label}: FAILED {e!r}", file=sys.stderr)
        flush()

    # --- dd nuc3 CONV-only (config4 shapes, VERDICT r3 #4): the staged
    # 3-layer dd convolution with the dd Pallas pipeline wired at every
    # partition size it supports.  Honest state: at 20 s signals only
    # the L2 layer (p=32768) fits the dd MAC kernel's VMEM plan (the
    # phase-copy scratch scales with the frame count; L0/L1 fall back to
    # XLA f64 emulation and dominate: measured 254/190/44 ms per layer
    # at 8 ch-streams) — the dd >=1000x contract is carried by the
    # FOLDED dd artifact below; this line publishes the staged number.
    try:
        from convopeq_tpu.models.convolver import (convolver_process,
                                                   stereo_prepare)
        conv_dd = stereo_prepare(
            jax.device_put(jnp.asarray(ir1m, jnp.float64), dev), 512,
            FilterSpec(sample_rate=SR))
        fnc = jax.jit(lambda v, c: jnp.sum(jnp.abs(
            convolver_process(v, c, 1.0))))
        xb = jax.device_put(jnp.asarray(
            rng.normal(size=(4, 2, n)) * 0.25, jnp.float64), dev)
        float(fnc(xb, conv_dd))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fnc(xb, conv_dd))
            walls.append(time.perf_counter() - t0)
        result["rtf_dd(f64)_nuc3_conv_only"] = round(
            4 * seconds / min(walls), 1)
        # RMS vs CPU f64 on a short input (same conv state)
        x2s = np.random.default_rng(3).normal(size=(2, 96000)) * 0.25
        y_dd = np.asarray(jax.jit(lambda v, c: convolver_process(
            v, c, 1.0))(jax.device_put(jnp.asarray(x2s, jnp.float64),
                                       dev), conv_dd))
        y_ref = _cpu_conv_golden(x2s, ir1m)
        rel_c = float(np.sqrt(np.mean((y_dd - y_ref) ** 2))
                      / np.sqrt(np.mean(y_ref ** 2)))
        result["rms_rel_err_dd_nuc3_conv_vs_f64_cpu"] = rel_c
        print(f"dd nuc3 conv: RTF "
              f"{result['rtf_dd(f64)_nuc3_conv_only']}x, RMS {rel_c:.2e}",
              file=sys.stderr)
    except Exception as e:                           # noqa: BLE001
        result["rtf_dd(f64)_nuc3_conv_error"] = repr(e)[:400]
    flush()

    # --- folded static-config mode (models/chain.py): the same LTI
    # stages host-convolved into the IR at rebuild time; the runtime
    # chain is sanitize -> unit-gain NUC -> scalar gains.  Exactness vs
    # the staged cascade is pinned at ~1e-13 in f64 by the test suite,
    # so this is the same contract at rebuild-time cost. -----------------
    from convopeq_tpu.models.chain import (prepare_folded_convolver,
                                           process_chain_fused)
    cfg_lin = ChainConfig(sample_rate=SR)
    for label, dtype, batch in (("dd(f64)_folded", jnp.float64, 4),
                                ("f32_folded", jnp.float32, 4)):
        try:
            conv_f = prepare_folded_convolver(
                ir1m, 512, FilterSpec(sample_rate=SR), cfg_lin, eqp,
                dtype=dtype)
            fnf = jax.jit(lambda v, c: jnp.sum(jnp.abs(
                process_chain_fused(v, cfg_lin, c))))
            xb = jax.device_put(
                jnp.asarray(rng.normal(size=(batch, 2, n)) * 0.25, dtype),
                dev)
            t0 = time.time()
            float(fnf(xb, conv_f))
            print(f"{label} compile+warm {time.time() - t0:.0f}s",
                  file=sys.stderr)
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fnf(xb, conv_f))
                walls.append(time.perf_counter() - t0)
            rtf = batch * seconds / min(walls)
            result[f"rtf_{label}"] = round(rtf, 1)
            print(f"{label}: RTF {rtf:.0f}x", file=sys.stderr)
            if dtype == jnp.float64:
                result.update(_dd_folded_rms(jax, jnp, dev, cfg_lin,
                                             conv_f, x_small, rtf))
        except Exception as e:                       # noqa: BLE001
            result[f"rtf_{label}_error"] = repr(e)[:400]
            print(f"{label}: FAILED {e!r}", file=sys.stderr)
        flush()

    print(json.dumps(result))


def _dd_folded_rms(jax, jnp, dev, cfg_lin, conv_f, x_small, rtf):
    """SAME-CONFIG RMS: the dd-folded chain's own output (same conv
    state, same dd Pallas kernel path that produced the RTF) vs a CPU
    f64 golden of the same folded chain on a 2 s input — the north-star
    contract stated as one artifact: RMS <= 1e-9 AND RTF >= 1000x for
    ONE on-chip config.  Isolated so a golden/compile failure here
    records its own error key without clobbering the RTF entry."""
    from convopeq_tpu.models.chain import process_chain_fused
    try:
        y_cpu_f = cpu_folded_reference()
        fn_sig = jax.jit(lambda v, c: process_chain_fused(v, cfg_lin, c))
        y_dd = np.asarray(fn_sig(
            jax.device_put(jnp.asarray(x_small, jnp.float64), dev), conv_f))
        rel_f = float(np.sqrt(np.mean((y_dd - y_cpu_f) ** 2))
                      / np.sqrt(np.mean(y_cpu_f ** 2)))
        print(f"dd(f64)_folded: folded RMS {rel_f:.2e}", file=sys.stderr)
        return {"rms_rel_err_dd(f64)_folded_vs_f64_cpu": rel_f,
                "dd_folded_north_star": {
                    "rms_le_1e-9": bool(rel_f <= 1e-9),
                    "rtf_ge_1000x": bool(rtf >= 1000.0)}}
    except Exception as e:                           # noqa: BLE001
        print(f"dd folded RMS: FAILED {e!r}", file=sys.stderr)
        return {"rms_rel_err_dd(f64)_folded_error": repr(e)[:400]}


_CPU_SEMI_SNIPPET = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import sys, os
sys.path.insert(0, %(repo)r)
os.environ["CONVOPEQ_DD_DITHER"] = "scan"   # reference-semantics f64 scans
from tools.tpu_parity import build_semi_fixture
ir, eqp, cfg, x, u, k9, bits = build_semi_fixture(%(name)r)
from convopeq_tpu.models.chain import (prepare_semi_folded_convolver,
                                       process_chain_semi_fused)
from convopeq_tpu.models.dither import apply_dither, ADAPTIVE9
from convopeq_tpu.models.nuc import FilterSpec
conv = prepare_semi_folded_convolver(ir, 512,
                                     FilterSpec(sample_rate=cfg.sample_rate),
                                     cfg, eqp, dtype=jnp.float64)
y = process_chain_semi_fused(jnp.asarray(x, jnp.float64), cfg, conv)
if u is not None:
    y = apply_dither(y, ADAPTIVE9, cfg.sample_rate, bits,
                     uniforms=jnp.asarray(u), adaptive_coeffs=k9,
                     lattice_ladder="fir")
np.save(%(out)r, np.asarray(y))
"""


def _factory_bank(sr: float, bits: int, mode: int):
    import json as _json
    from convopeq_tpu.models.learner import AdaptiveCoefficientBanks
    with open(os.path.join(REPO, "convopeq_tpu", "data",
                           "learned_banks.json")) as f:
        banks = AdaptiveCoefficientBanks.from_dict(_json.load(f)["banks"])
    k = banks.get(sr, bits, mode)
    if k is None:         # nearest shipped bank (4 factory banks)
        for cand in ((48000.0, 16, 0), (96000.0, 24, 2), (384000.0, 24, 5)):
            k = banks.get(*cand)
            if k is not None:
                break
    return np.asarray(k)


def build_semi_fixture(name: str, seconds_rms: float | None = None):
    """Fixtures for the dd SEMI-FOLDED parity lines (VERDICT r4 #1):
    chains with the NONLINEAR suffix live (soft clip; optionally the
    adaptive lattice dither) run in dd on-chip vs an f64 CPU golden of
    the same semi-folded chain.

    name:
      "config5"      1M-tap + 20-band EQ + soft clip @48k (no dither).
      "config5d32"   config5 + adaptive lattice dither, 32-bit output.
          The full nonlinear chain INCLUDING the quantizer under the
          1e-9 contract: dither trajectories flip where the upstream
          dd-vs-f64 deviation (~6e-12 abs) crosses a rounding boundary,
          so the expected divergence is LSB*sqrt(dev/LSB) ~ 2e-10 rel
          at 32-bit (~3e-9 at 24-bit, ~4e-8 at 16-bit: deeper
          quantization makes flips rarer AND smaller — measured in the
          companion "config5d24" line).
      "config5d24"   same at 24-bit (the scaling-law companion line).
      "config6"      2s IR + 20-band EQ + soft clip + adaptive lattice
          dither @384 kHz / 24-bit (the literal BASELINE config[4]
          shape) — published at its honest dd RTF.
    Returns (ir, eqp, cfg, x, uniforms|None, k9|None, bits)."""
    from convopeq_tpu.models.chain import ChainConfig
    from convopeq_tpu.models.eq import EQParams
    rng = np.random.default_rng(0)
    eqp = EQParams()
    eqp.gains_db[:] = np.linspace(-4.0, 4.0, 20)
    if name.startswith("config5"):
        sr = 48000.0
        ir_len = 1_000_000
        seconds = 60.0 if seconds_rms is None else seconds_rms
        decay = np.exp(-np.arange(ir_len) / (ir_len / 10.0))
        ir = np.stack([rng.normal(size=ir_len) * decay,
                       rng.normal(size=ir_len) * decay]) * 0.02
        bits = {"config5": 0, "config5d32": 32, "config5d24": 24}[name]
    else:
        sr = 384000.0
        ir_len = int(sr * 2.0)
        seconds = 1.25 if seconds_rms is None else seconds_rms
        ir = np.stack([rng.normal(size=ir_len),
                       rng.normal(size=ir_len)]) \
            * np.exp(-np.arange(ir_len) / (ir_len / 6.0)) * 0.02
        bits = 24
    cfg = ChainConfig(sample_rate=sr, soft_clip_enabled=True,
                      saturation_amount=0.3, apply_output_headroom=False)
    n = int(sr * seconds)
    x = np.random.default_rng(7).normal(size=(2, n)) * 0.25
    if bits == 0:
        return ir, eqp, cfg, x, None, None, 0
    u = np.random.default_rng(11).random(size=(2, n, 2))
    k9 = _factory_bank(sr, 24 if bits >= 24 else bits,
                       5 if sr >= 384000.0 else 0)
    return ir, eqp, cfg, x, u, k9, bits


def cpu_semi_reference(name: str, path: str):
    if os.path.exists(path):      # deterministic fixture: reuse within
        return np.load(path)      # a session (delete /tmp to refresh)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = _CPU_SEMI_SNIPPET % {"repo": REPO, "name": name, "out": path}
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   cwd=REPO)
    return np.load(path)


def semi_main(batch_ladder=(16, 8, 4), batch_ladder_384=(32, 16, 8),
              names=("config5", "config5d32", "config5d24", "config6")):
    """dd SEMI-FOLDED artifact lines, merged into PARITY_TPU.json.

    RTF methodology mirrors the dd_folded lines (single-call walls, min
    of 3, scalar-readback fence); RMS compares the on-chip dd output
    against the f64 CPU golden of the SAME semi-folded chain on the RMS
    fixture (60 s @48k / 1.25 s @384k)."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from convopeq_tpu.models.chain import (prepare_semi_folded_convolver,
                                           process_chain_semi_fused)
    from convopeq_tpu.models.dither import apply_dither, ADAPTIVE9
    from convopeq_tpu.models.nuc import FilterSpec

    dev = jax.devices()[0]
    out = os.path.join(REPO, "PARITY_TPU.json")
    result = {}
    if os.path.exists(out):
        with open(out) as f:
            result = json.load(f)

    def flush():
        with open(out, "w") as f:
            json.dump(result, f, indent=1)

    rng = np.random.default_rng(1)
    for name in names:
        key = f"rtf_dd_semi_folded_{name}"
        if name.startswith("config5d"):
            # 7 Ozaki slices for the dithered dd lines: the quantizer
            # makes the chain's 2^-42-truncation deviation VISIBLE as
            # rounding flips (rel_rms ~ LSB*sqrt(dev/LSB); measured
            # 1.52e-9 at 32-bit with s=6) — s=7 cuts the upstream
            # deviation ~100x for ~1.3x the conv's MXU passes
            os.environ["CONVOPEQ_DD_SLICES"] = "7"
        else:
            os.environ.pop("CONVOPEQ_DD_SLICES", None)
        try:
            ir, eqp, cfg, x_rms, u_rms, k9, bits = build_semi_fixture(name)
            sr = cfg.sample_rate
            spec = FilterSpec(sample_rate=sr)
            # golden FIRST (subprocess, CPU): if the tunnel wedges on the
            # big device transfers below, the cheap artifact half exists
            golden_path = f"/tmp/convopeq_cpu_semi_{name}.npy"
            y_cpu = cpu_semi_reference(name, golden_path)
            print(f"{name}: cpu golden done", file=sys.stderr)
            conv = prepare_semi_folded_convolver(
                ir, 512, spec, cfg, eqp, dtype=jnp.float64)

            def chain(v, c, uu=None):
                y = process_chain_semi_fused(v, cfg, c)
                if bits:
                    if uu is None:
                        # f32 threefry: the residual quantizer consumes
                        # the TPDF draw at f32; an f64 draw is emulated
                        # (~400 ms at batch 32, measured)
                        uu = jax.random.uniform(jax.random.PRNGKey(0),
                                                y.shape + (2,),
                                                dtype=jnp.float32)
                    # the soft-clipped chain bounds |y| <= ~0.85 FS, so
                    # the clamp-free scaled-residual Pallas path is exact
                    y = apply_dither(y, ADAPTIVE9, sr, bits, uniforms=uu,
                                     adaptive_coeffs=k9,
                                     lattice_ladder="fir",
                                     assume_interior=True)
                return y

            # --- RMS vs the CPU f64 golden of the same chain ------------
            args = [jax.device_put(jnp.asarray(x_rms, jnp.float64), dev),
                    conv]
            if bits:
                args.append(jax.device_put(
                    jnp.asarray(u_rms, jnp.float64), dev))
            y_dd = np.asarray(jax.jit(chain)(*args))
            rel = float(np.sqrt(np.mean((y_dd - y_cpu) ** 2))
                        / np.sqrt(np.mean(y_cpu ** 2)))
            result[f"rms_rel_err_dd_semi_folded_{name}"] = rel
            result.pop(f"{key}_error", None)   # clear stale merge keys
            print(f"{name}: RMS {rel:.2e}", file=sys.stderr)
            flush()

            # --- RTF ----------------------------------------------------
            seconds = 20.0 if sr < 100000.0 else 1.25
            n = int(sr * seconds)
            fn = jax.jit(lambda v, c: jnp.sum(jnp.abs(chain(v, c))))
            ladder = batch_ladder if sr < 100000.0 else batch_ladder_384
            if name in ("config5d32", "config5d24"):
                ladder = (56, 52, 48)   # b64 OOMs; the quantizer wall is
                #                         batch-independent; amortize it
            rtf = None
            for batch in ladder:
                try:
                    xb = jax.device_put(jnp.asarray(
                        rng.normal(size=(batch, 2, n)) * 0.25,
                        jnp.float64), dev)
                    t0 = time.time()
                    float(fn(xb, conv))
                    print(f"{name} b{batch} compile+warm "
                          f"{time.time() - t0:.0f}s", file=sys.stderr)
                    walls = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        float(fn(xb, conv))
                        walls.append(time.perf_counter() - t0)
                    rtf = round(batch * seconds / min(walls), 1)
                    result[key] = rtf
                    result[f"{key}_batch"] = batch
                    break
                except Exception as e:          # noqa: BLE001
                    print(f"{name} b{batch}: {type(e).__name__}",
                          file=sys.stderr)
                    continue
            print(f"{name}: RTF {rtf}", file=sys.stderr)
            if name in ("config5", "config5d32"):
                result[f"dd_semi_folded_{name}_north_star"] = {
                    "rms_le_1e-9": bool(rel <= 1e-9),
                    "rtf_ge_1000x": bool(rtf is not None
                                         and rtf >= 1000.0)}
        except Exception as e:                   # noqa: BLE001
            result[f"{key}_error"] = repr(e)[:400]
            print(f"{name}: FAILED {e!r}", file=sys.stderr)
        flush()
    print(json.dumps({k: v for k, v in result.items()
                      if "semi" in k}, indent=1))


if __name__ == "__main__":
    if "--semi" in sys.argv:
        sel = [a.split("=", 1)[1].split(",") for a in sys.argv
               if a.startswith("--names=")]
        semi_main(names=tuple(sel[0]) if sel else (
            "config5", "config5d32", "config5d24", "config6"))
    else:
        main()
