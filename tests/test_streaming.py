"""Streaming runtime vs offline chain equivalence."""
import numpy as np
import pytest
import jax.numpy as jnp

from convopeq_tpu.models.chain import ChainConfig, process_chain
from convopeq_tpu.models.convolver import stereo_prepare
from convopeq_tpu.models.eq import EQParams
from convopeq_tpu.models.nuc import FilterSpec, TAIL_BYPASS, nuc_prepare, nuc_convolve
from convopeq_tpu.runtime.streaming import StreamingChain

RNG = np.random.default_rng(17)
SR = 48000.0


def _params(n_bands=4):
    p = EQParams()
    p.enabled[:] = False
    specs = [(1, 200.0, 5.0, 1.0, 0), (0, 80.0, -3.0, 0.7, 0),
             (1, 2000.0, 4.0, 2.0, 3), (2, 9000.0, 2.0, 0.7, 0)]
    for i, (t, f, g, q, m) in enumerate(specs[:n_bands]):
        p.set_band(i, band_type=t, freq=f, gain_db=g, q=q, mode=m, enabled=True)
    return p


def test_streaming_l0_only_matches_offline():
    """Short IR (L0-only) streaming == offline chain exactly."""
    ir = RNG.normal(size=(2, 3000)) * np.exp(-np.arange(3000) / 500.0)
    conv = stereo_prepare(jnp.asarray(ir), 512,
                          FilterSpec(sample_rate=SR, tail_mode=TAIL_BYPASS),
                          apply_spectrum_filter=False)
    eqp = _params()
    cfg = ChainConfig(sample_rate=SR, eq_method="scan")
    x = RNG.normal(size=(2, 4096)) * 0.3

    offline = np.asarray(process_chain(jnp.asarray(x), cfg, eqp, conv))
    sc = StreamingChain(cfg, eqp, conv.left, conv.right, dtype=jnp.float64)
    assert sc.block_size == 512
    y, _ = sc.process(jnp.asarray(x))
    err = np.sqrt(np.mean((np.asarray(y) - offline) ** 2))
    assert err < 1e-9, err


@pytest.mark.slow
def test_streaming_tail_layers_match_offline_steady_state():
    """Multi-layer NUC: streaming equals offline after the tail warmup."""
    n_ir = 40000
    ir = RNG.normal(size=n_ir) * np.exp(-np.arange(n_ir) / 8000.0)
    spec = FilterSpec(sample_rate=SR)
    conv_off = nuc_prepare(jnp.asarray(ir), 512, spec,
                           apply_spectrum_filter=False)
    assert len(conv_off.plan.layers) >= 2
    n = 65536
    x1 = RNG.normal(size=n) * 0.3
    offline = np.asarray(nuc_convolve(jnp.asarray(x1), conv_off))

    cfg = ChainConfig(sample_rate=SR, eq_bypassed=True, eq_method="scan",
                      apply_output_headroom=False)
    # disable output filter by bypassing both stages? output filter runs when
    # conv active; to isolate the NUC compare, wrap manually:
    from convopeq_tpu.runtime.streaming import StreamingChain
    sc = StreamingChain(ChainConfig(sample_rate=SR, eq_bypassed=True,
                                    apply_output_headroom=False,
                                    eq_method="scan"),
                        None, conv_off, conv_off, dtype=jnp.float64)
    # The chain applies DC blockers + output filter around the conv; compare
    # against the offline chain (same stages) instead of bare nuc_convolve.
    x = np.stack([x1, x1])
    off_chain = np.asarray(process_chain(
        jnp.asarray(x), ChainConfig(sample_rate=SR, eq_bypassed=True,
                                    apply_output_headroom=False,
                                    eq_method="scan"), None,
        __import__("convopeq_tpu.models.convolver",
                   fromlist=["StereoConvolverState"]).StereoConvolverState(
            left=conv_off, right=conv_off)))
    y, _ = sc.process(jnp.asarray(x))
    y = np.asarray(y)
    # steady state: after all tail layers have produced their first frames
    warmup = max(lp.offset + 2 * lp.part_size for lp in conv_off.plan.layers)
    sl = slice(warmup, n)
    err = np.sqrt(np.mean((y[..., sl] - off_chain[..., sl]) ** 2)) \
        / np.sqrt(np.mean(off_chain[..., sl] ** 2))
    # streaming (block-sized affine scans -> VPU scan backend) and offline
    # (megasample buffers -> MXU matmul backend) legitimately differ in
    # f64 reduction order; ~2e-10 observed, far under audible/contract
    # relevance
    assert err < 1e-9, err


def test_streaming_direct_head():
    ir = RNG.normal(size=2000)
    conv = nuc_prepare(jnp.asarray(ir), 512,
                       FilterSpec(sample_rate=SR, tail_mode=TAIL_BYPASS),
                       enable_direct_head=True, apply_spectrum_filter=False)
    from convopeq_tpu.models.convolver import StereoConvolverState
    st = StereoConvolverState(left=conv, right=conv)
    cfg = ChainConfig(sample_rate=SR, eq_bypassed=True,
                      apply_output_headroom=False, eq_method="scan")
    x = np.stack([RNG.normal(size=2048), RNG.normal(size=2048)]) * 0.3
    offline = np.asarray(process_chain(jnp.asarray(x), cfg, None, st))
    sc = StreamingChain(cfg, None, conv, conv, dtype=jnp.float64)
    y, _ = sc.process(jnp.asarray(x))
    err = np.sqrt(np.mean((np.asarray(y) - offline) ** 2))
    assert err < 1e-9, err


def test_streaming_batched_streams():
    ir = RNG.normal(size=(2, 2500)) * 0.3
    conv = stereo_prepare(jnp.asarray(ir), 512,
                          FilterSpec(sample_rate=SR, tail_mode=TAIL_BYPASS),
                          apply_spectrum_filter=False)
    eqp = _params(2)
    cfg = ChainConfig(sample_rate=SR, soft_clip_enabled=True,
                      saturation_amount=0.3, eq_method="scan")
    xb = RNG.normal(size=(3, 2, 2048)) * 0.3
    sc = StreamingChain(cfg, eqp, conv.left, conv.right, dtype=jnp.float64)
    yb, _ = sc.process(jnp.asarray(xb))
    off = np.asarray(process_chain(jnp.asarray(xb), cfg, eqp, conv))
    err = np.sqrt(np.mean((np.asarray(yb) - off) ** 2))
    assert err < 1e-9, err


def test_streaming_state_continuity():
    """Two separate step sequences with carried state == one sequence."""
    eqp = _params(3)
    cfg = ChainConfig(sample_rate=SR, conv_bypassed=True, eq_method="scan")
    sc = StreamingChain(cfg, eqp, None, dtype=jnp.float64)
    x = RNG.normal(size=(2, 2048)) * 0.3
    y_full, _ = sc.process(jnp.asarray(x))
    st = sc.init_state(())
    st, y1 = sc.step(st, jnp.asarray(x[..., :512]))
    st, y2 = sc.step(st, jnp.asarray(x[..., 512:1024]))
    y_part, _ = sc.process(jnp.asarray(x[..., 1024:]), st)
    y_cat = np.concatenate([np.asarray(y1), np.asarray(y2),
                            np.asarray(y_part)], axis=-1)
    np.testing.assert_allclose(y_cat, np.asarray(y_full), atol=1e-12)


@pytest.mark.parametrize("os_req,sc_on", [(2, True), (4, False)])
def test_streaming_oversampled_matches_offline(os_req, sc_on):
    """Oversampled streaming (stateful halfband cascades + OS-rate DSP)
    == the offline chain exactly (L0-only conv)."""
    os_f = os_req
    ir = RNG.normal(size=(2, 1500)) * np.exp(-np.arange(1500) / 300.0)
    conv = stereo_prepare(jnp.asarray(ir), 512 * os_f,
                          FilterSpec(sample_rate=SR * os_f,
                                     tail_mode=TAIL_BYPASS),
                          apply_spectrum_filter=False)
    eqp = _params(3)
    cfg = ChainConfig(sample_rate=SR, oversampling_factor=os_req,
                      soft_clip_enabled=sc_on, saturation_amount=0.3,
                      eq_method="scan")
    x = RNG.normal(size=(2, 4096)) * 0.3

    offline = np.asarray(process_chain(jnp.asarray(x), cfg, eqp, conv))
    sc = StreamingChain(cfg, eqp, conv.left, conv.right, dtype=jnp.float64)
    assert sc.block_size == 512
    assert sc.os_factor == os_f
    y, st = sc.process(jnp.asarray(x))
    err = np.sqrt(np.mean((np.asarray(y) - offline) ** 2))
    # blocked vs monolithic scans of the 1 Hz OS-rate DC blocker (pole at
    # 1-6.5e-5) drift by ~1e-8 f64 roundoff; anything above 1e-7 is a bug
    assert err < 1e-7, err
    # state carries across calls: second half equals offline second half
    y1, st1 = sc.process(jnp.asarray(x[..., :2048]))
    y2, _ = sc.process(jnp.asarray(x[..., 2048:]), st1)
    two = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    assert np.sqrt(np.mean((two - offline) ** 2)) < 1e-7


def test_streaming_agc_matches_offline():
    """AGC state (env_in, env_out, gain) carries across streaming blocks
    and reproduces the offline block-rate AGC exactly."""
    ir = RNG.normal(size=(2, 2000)) * np.exp(-np.arange(2000) / 400.0)
    conv = stereo_prepare(jnp.asarray(ir), 512,
                          FilterSpec(sample_rate=SR, tail_mode=TAIL_BYPASS),
                          apply_spectrum_filter=False)
    eqp = _params(3)
    eqp.agc_enabled = True
    cfg = ChainConfig(sample_rate=SR, eq_method="scan", agc_block_size=512)
    x = RNG.normal(size=(2, 4096)) * 0.4

    offline = np.asarray(process_chain(jnp.asarray(x), cfg, eqp, conv))
    sc = StreamingChain(cfg, eqp, conv.left, conv.right, dtype=jnp.float64)
    y, st = sc.process(jnp.asarray(x))
    err = np.sqrt(np.mean((np.asarray(y) - offline) ** 2))
    assert err < 1e-9, err
    assert st.agc is not None and st.agc.shape[-1] == 3


def test_multi_step_equals_single_steps():
    """multi_step (M blocks per dispatch, the serving transport-latency
    amortization) carries identical state and outputs as M single steps."""
    import jax.numpy as jnp
    from convopeq_tpu.models.chain import ChainConfig
    from convopeq_tpu.models.eq import EQParams
    from convopeq_tpu.models.nuc import FilterSpec, nuc_prepare
    from convopeq_tpu.runtime.streaming import StreamingChain
    rng = np.random.default_rng(9)
    ir = rng.normal(size=4000) * np.exp(-np.arange(4000) / 600.0) * 0.2
    nuc = nuc_prepare(jnp.asarray(ir), 512, FilterSpec(sample_rate=48000.0))
    eqp = EQParams()
    eqp.gains_db[:3] = [3.0, -2.0, 1.0]
    sc = StreamingChain(ChainConfig(sample_rate=48000.0), eqp, nuc,
                        dtype=jnp.float64)
    x = rng.normal(size=(1, 2, 512 * 8)) * 0.25

    st1 = sc.init_state((1,))
    outs = []
    for k in range(8):
        st1, y = sc.step(st1, jnp.asarray(x[..., k * 512:(k + 1) * 512]))
        outs.append(np.asarray(y))
    y_single = np.concatenate(outs, axis=-1)

    st2 = sc.init_state((1,))
    st2, y_multi = sc.multi_step(st2, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_multi), y_single, atol=1e-14)
    # carried states agree
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(st1),
                    jax.tree_util.tree_leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-14)


@pytest.mark.slow
def test_streaming_fdl_f16_tracks_f32(monkeypatch):
    """The f16 FDL storage tier (serving scale: halves the dominant
    per-stream state) tracks the f32-FDL streaming output within the f32
    chain floor.  Measured here: ~2e-4 relative on a multi-layer NUC —
    on par with the ~5.6e-4 f32 whole-chain floor (PERF.md), because the
    MAC still accumulates in f32 and only STORED frame spectra round to
    10-bit mantissa."""
    n_ir = 40000
    ir = RNG.normal(size=n_ir) * np.exp(-np.arange(n_ir) / 8000.0)
    spec = FilterSpec(sample_rate=SR)
    conv = nuc_prepare(jnp.asarray(ir, jnp.float32), 512, spec,
                       apply_spectrum_filter=False)
    assert len(conv.plan.layers) >= 2
    cfg = ChainConfig(sample_rate=SR, eq_bypassed=True, eq_method="scan",
                      apply_output_headroom=False)
    x = (RNG.normal(size=(2, 32768)) * 0.3).astype(np.float32)

    outs = {}
    for label, fdt in (("f32", None), ("f16", jnp.float16)):
        sc = StreamingChain(cfg, None, conv, dtype=jnp.float32,
                            fdl_dtype=fdt)
        st = sc.init_state(())
        ys = []
        for b in range(x.shape[-1] // sc.block_size):
            st, y = sc.step(st, jnp.asarray(
                x[:, b * sc.block_size:(b + 1) * sc.block_size]))
            ys.append(np.asarray(y))
        outs[label] = np.concatenate(ys, axis=-1)
        if fdt is not None:
            layer0 = st.conv_layers[0][1]       # a tail layer's state
            assert layer0.fdl_r.dtype == jnp.float16

    ref = outs["f32"]
    err = (np.sqrt(np.mean((outs["f16"] - ref) ** 2))
           / np.sqrt(np.mean(ref ** 2)))
    assert err < 1e-3, err


@pytest.mark.slow
def test_streaming_amortized_tail_equals_offline():
    """The amortized tail MAC (partsPerCallback analog: j>=1 terms of
    each frame spread over its ratio block-steps) computes the SAME
    convolution as the offline path — here with a long IR so both tail
    layers carry many partitions and the chunk masking (last partial
    chunk) is exercised."""
    n_ir = 120000
    ir = RNG.normal(size=n_ir) * np.exp(-np.arange(n_ir) / 20000.0)
    spec = FilterSpec(sample_rate=SR)
    conv = nuc_prepare(jnp.asarray(ir), 512, spec,
                       apply_spectrum_filter=False)
    assert len(conv.plan.layers) >= 2
    assert any(lp.num_parts > 8 and lp.part_size > 512
               for lp in conv.plan.layers)
    n = 131072
    x1 = RNG.normal(size=n) * 0.3
    x = np.stack([x1, x1])
    cfg = ChainConfig(sample_rate=SR, eq_bypassed=True, eq_method="scan",
                      apply_output_headroom=False)
    from convopeq_tpu.models.convolver import StereoConvolverState
    off_chain = np.asarray(process_chain(
        jnp.asarray(x), cfg, None,
        StereoConvolverState(left=conv, right=conv)))

    sc = StreamingChain(cfg, None, conv, conv, dtype=jnp.float64)
    y, _ = sc.process(jnp.asarray(x))
    y = np.asarray(y)
    warmup = max(lp.offset + 2 * lp.part_size for lp in conv.plan.layers)
    sl = slice(warmup, n)
    err = (np.sqrt(np.mean((y[..., sl] - off_chain[..., sl]) ** 2))
           / np.sqrt(np.mean(off_chain[..., sl] ** 2)))
    assert err < 1e-9, err


@pytest.mark.slow
def test_streaming_folded_matches_offline_fused():
    """Folded streaming (LTI stages baked into the IR at rebuild time,
    3-layer streaming plan) == the offline folded chain in steady state,
    and == the STAGED streaming chain up to the prefilter truncation —
    the serving analog of the offline folded mode."""
    from convopeq_tpu.models.chain import (
        fused_eligible, prepare_folded_convolver, process_chain_fused)
    n_ir = 20000
    ir = RNG.normal(size=(2, n_ir)) * np.exp(-np.arange(n_ir) / 4000.0) * 0.2
    spec = FilterSpec(sample_rate=SR)     # TAIL_CONTOUR: fused-eligible
    eqp = _params(2)                      # stereo-only bands
    cfg = ChainConfig(sample_rate=SR, eq_method="scan",
                      input_headroom_gain=0.9, output_makeup_gain=1.1,
                      convolver_input_trim_gain=0.95, order=1)
    assert fused_eligible(cfg, eqp, True)

    sc = StreamingChain.folded_from_ir(cfg, eqp, jnp.asarray(ir), spec,
                                       block_size=512, dtype=jnp.float64)
    assert sc.block_size == 512
    plan = sc.left.plan
    assert len(plan.layers) >= 2          # the folded IR spans tail layers

    n = 65536
    x = RNG.normal(size=(2, n)) * 0.3
    y_stream, _ = sc.process(jnp.asarray(x))
    y_stream = np.asarray(y_stream)

    # 1) == offline folded chain (same conv state) after tail warmup
    st = prepare_folded_convolver(jnp.asarray(ir), 512, spec, cfg, eqp,
                                  dtype=jnp.float64, partition=None)
    y_off = np.asarray(process_chain_fused(jnp.asarray(x), cfg, st))
    warmup = max(lp.offset + 2 * lp.part_size for lp in plan.layers)
    sl = slice(warmup, n)
    ref = np.sqrt(np.mean(y_off[..., sl] ** 2))
    err = np.sqrt(np.mean((y_stream[..., sl] - y_off[..., sl]) ** 2)) / ref
    assert err < 1e-9, err
    # (folded == staged exact cascade is pinned offline by
    # test_fused_chain_matches_exact_cascade; this test pins the
    # streaming step against the offline folded chain.)


def test_streaming_folded_rejects_ineligible():
    from convopeq_tpu.models.chain import ChainConfig
    ir = RNG.normal(size=(2, 4000)) * 0.1
    spec = FilterSpec(sample_rate=SR, tail_mode=TAIL_BYPASS)
    with pytest.raises(ValueError):
        StreamingChain.folded_from_ir(
            ChainConfig(sample_rate=SR, soft_clip_enabled=True),
            None, jnp.asarray(ir), spec)
    with pytest.raises(ValueError):
        StreamingChain.folded_from_ir(
            ChainConfig(sample_rate=SR, wet_dry_mix=0.5),
            None, jnp.asarray(ir), spec)


def test_streaming_bigblock_single_layer_matches_offline():
    """The bigblock serving tier (tools/serving_bench.py --frontier):
    folded single-layer plan at partition = window size, streamed one
    window per step — must equal the offline folded chain in steady
    state.  Exercises the big-partition layer machinery (part_size >
    callback block, every step fires) plus the fold with an explicit
    partition override."""
    from convopeq_tpu.models.chain import (
        fused_eligible, prepare_folded_convolver, process_chain_fused)
    n_ir = 40000
    ir = RNG.normal(size=(2, n_ir)) * np.exp(-np.arange(n_ir) / 8000.0) * 0.2
    spec = FilterSpec(sample_rate=SR)
    eqp = _params(2)
    cfg = ChainConfig(sample_rate=SR, input_headroom_gain=0.9,
                      output_makeup_gain=1.1)
    assert fused_eligible(cfg, eqp, True)
    # fold at the reference 512-block gain plan, partition = 8 blocks
    part = 4096
    st = prepare_folded_convolver(ir, 512, spec, cfg, eqp,
                                  dtype=jnp.float64, partition=part)
    sc = StreamingChain(cfg, None, st.left, st.right, dtype=jnp.float64,
                        folded=True)
    assert sc.block_size == part                 # one step per window
    n = 16 * part
    x = RNG.normal(size=(2, n)) * 0.3
    y_stream, _ = sc.process(jnp.asarray(x))
    y_stream = np.asarray(y_stream)
    y_off = np.asarray(process_chain_fused(jnp.asarray(x), cfg, st))
    # single-layer plan: offset 0, warmup = one partition
    sl = slice(2 * part, n)
    ref = np.sqrt(np.mean(y_off[..., sl] ** 2))
    err = np.sqrt(np.mean((y_stream[..., sl] - y_off[..., sl]) ** 2)) / ref
    assert err < 1e-9, err
