"""Native C++ runtime library: WAV decode, SPSC ring, framing kernels."""
import threading

import numpy as np
import pytest

try:
    from convopeq_tpu.utils import native
    native.load()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native library unavailable")

from convopeq_tpu.utils.wavio import write_wav, read_wav

RNG = np.random.default_rng(12)


def test_native_wav_roundtrip(tmp_path):
    x = (RNG.normal(size=(2, 5000)) * 0.4).clip(-1, 1)
    for bits, float_fmt in [(32, True), (16, False), (24, False), (32, False)]:
        p = tmp_path / f"t{bits}{float_fmt}.wav"
        write_wav(p, x, 48000, bits=bits, float_format=float_fmt)
        got, sr = native.read_wav_native(p)
        ref = read_wav(p)
        assert sr == 48000
        np.testing.assert_allclose(got, ref.samples, atol=1e-12)


def test_native_reads_reference_fixture():
    got, sr = native.read_wav_native(
        "/root/reference/sampledata/impulse_room_correction_hpf_lpf.wav")
    ref = read_wav(
        "/root/reference/sampledata/impulse_room_correction_hpf_lpf.wav")
    assert sr == ref.sample_rate
    np.testing.assert_allclose(got, ref.samples, atol=1e-12)


def test_ring_push_pop():
    r = native.NativeRing(1024)
    assert r.writable == 1024 and r.readable == 0
    a = RNG.normal(size=300)
    assert r.push(a)
    assert r.readable == 300
    out = r.pop(300)
    np.testing.assert_array_equal(out, a)
    assert r.pop(1) is None                # empty -> all-or-nothing fail
    # fill to capacity and check overflow rejection
    assert r.push(np.zeros(1024))
    assert not r.push(np.ones(1))
    assert r.pop(1024) is not None


def test_ring_wraparound():
    r = native.NativeRing(256)
    for _ in range(10):                    # force wrap multiple times
        a = RNG.normal(size=200)
        assert r.push(a)
        np.testing.assert_array_equal(r.pop(200), a)


def test_ring_threaded_spsc():
    """Producer and consumer on separate threads — data arrives in order."""
    r = native.NativeRing(1 << 12)
    n_blocks, bs = 200, 256
    data = RNG.normal(size=(n_blocks, bs))
    received = []

    def producer():
        i = 0
        while i < n_blocks:
            if r.push(data[i]):
                i += 1

    def consumer():
        while len(received) < n_blocks:
            out = r.pop(bs)
            if out is not None:
                received.append(out)

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tp.join(timeout=30); tc.join(timeout=30)
    assert len(received) == n_blocks
    np.testing.assert_array_equal(np.stack(received), data)


def test_framing_kernels():
    inter = RNG.normal(size=2 * 1000).astype(np.float32)
    planar = native.deinterleave(inter, 2, gain=0.5)
    ref = inter.reshape(-1, 2).T.astype(np.float64) * 0.5
    np.testing.assert_allclose(planar, ref, atol=1e-12)
    back = native.interleave(planar, gain=2.0)
    np.testing.assert_allclose(back, inter.clip(-1, 1), atol=1e-6)


def test_mpsc_ring_basics():
    """Bounded MPSC ring: fill to capacity, reject when full, FIFO pop."""
    from convopeq_tpu.utils.native import NativeMpscRing
    q = NativeMpscRing(8, 16)
    recs = [i.to_bytes(4, "little") + bytes(12) for i in range(8)]
    for r in recs:
        assert q.push(r)
    assert not q.push(recs[0])            # full, bounded — no drop
    assert q.size_approx == 8
    out = [q.pop() for _ in range(8)]
    assert out == recs
    assert q.pop() is None                # empty
    with pytest.raises(ValueError):
        q.push(b"short")
    with pytest.raises(ValueError):
        NativeMpscRing(6, 8)              # non power of two


def test_mpsc_ring_multiproducer():
    """Concurrent producers: every record arrives exactly once; the single
    consumer sees per-producer FIFO order."""
    import threading
    from convopeq_tpu.utils.native import NativeMpscRing
    q = NativeMpscRing(1024, 8)
    n_per = 2000
    n_prod = 4

    def produce(pid):
        for i in range(n_per):
            rec = pid.to_bytes(4, "little") + i.to_bytes(4, "little")
            while not q.push(rec):
                pass

    threads = [threading.Thread(target=produce, args=(p,))
               for p in range(n_prod)]
    for t in threads:
        t.start()
    got = []
    while len(got) < n_per * n_prod:
        r = q.pop()
        if r is not None:
            got.append(r)
    for t in threads:
        t.join()
    assert q.pop() is None
    # exactly-once delivery
    assert len(set(got)) == n_per * n_prod
    # per-producer FIFO
    last = [-1] * n_prod
    for r in got:
        pid = int.from_bytes(r[:4], "little")
        i = int.from_bytes(r[4:], "little")
        assert i > last[pid]
        last[pid] = i


def test_block_scheduler_basics():
    """Native cq_sched: push/gather/commit/pop mechanics + stats."""
    from convopeq_tpu.utils.native import NativeBlockScheduler
    sched = NativeBlockScheduler(2, 64, 48000.0, capacity_blocks=4)
    rng = np.random.default_rng(0)
    b0 = rng.normal(size=(2, 64)).astype(np.float32)
    assert sched.push(0, b0)
    # idle streams: stream 1 has nothing; gather runs (stream 0 ready)
    batch, mask, n = sched.gather()
    assert n == 1 and mask[0] == 1 and mask[1] == 0
    np.testing.assert_array_equal(batch[0], b0)
    np.testing.assert_array_equal(batch[1], 0.0)
    # commit only the ready stream; wall over 1.5x budget -> one XRUN
    y = batch * 2.0
    sched.commit(y, mask, int(64 / 48000.0 * 1e9 * 2.0))
    out = sched.pop(0)
    np.testing.assert_array_equal(out, b0 * 2.0)
    assert sched.pop(1) is None
    st = sched.stats()
    assert st["served_blocks"] == 1 and st["xruns"] == 1
    assert st["underruns"] == 1            # stream 1 in the served window
    # fully-idle poll: consumes nothing, counts nothing
    _, _, n2 = sched.gather()
    assert n2 == 0
    assert sched.stats()["underruns"] == 1
    # overflow accounting: capacity 4 blocks
    for _ in range(4):
        assert sched.push(1, b0)
    assert not sched.push(1, b0)
    assert sched.stats()["in_overflows"] == 1
    assert sched.in_ready(1) == 4


def test_native_serving_loop_threaded_equivalence():
    """Producer threads feed the native scheduler; the serving loop's
    outputs per stream must EQUAL running the same blocks through
    StreamingChain.step directly (same order, same state thread)."""
    import threading
    import jax.numpy as jnp
    from convopeq_tpu.models.chain import ChainConfig
    from convopeq_tpu.models.eq import EQParams
    from convopeq_tpu.models.nuc import FilterSpec, nuc_prepare
    from convopeq_tpu.runtime.streaming import StreamingChain
    from convopeq_tpu.runtime.native_serving import NativeServingLoop

    rng = np.random.default_rng(3)
    sr, block, ns, nblocks = 48000.0, 512, 3, 12
    ir = rng.normal(size=3000) * np.exp(-np.arange(3000) / 500.0) * 0.1
    nuc = nuc_prepare(jnp.asarray(ir), block, FilterSpec(sample_rate=sr))
    eqp = EQParams()
    eqp.gains_db[:] = np.linspace(-3.0, 3.0, 20)
    cfg = ChainConfig(sample_rate=sr)

    blocks = rng.normal(size=(nblocks, ns, 2, block)).astype(np.float32) * 0.2

    # ground truth: the same chain stepped directly, same block order
    sc_ref = StreamingChain(cfg, eqp, nuc, dtype=jnp.float32)
    st = sc_ref.init_state((ns,))
    want = []
    for k in range(nblocks):
        st, y = sc_ref.step(st, jnp.asarray(blocks[k]))
        want.append(np.asarray(y))

    loop = NativeServingLoop(StreamingChain(cfg, eqp, nuc,
                                            dtype=jnp.float32), ns)

    # producers: one thread per stream, pushing with tiny jitter; the
    # dispatcher may idle-poll between pushes but the PER-WINDOW block
    # alignment is enforced by pushing block k everywhere before k+1
    # (barrier), so the batch composition matches the ground truth.
    barrier = threading.Barrier(ns + 1)

    def produce(si):
        for k in range(nblocks):
            barrier.wait()
            assert loop.push(si, blocks[k][si])
            barrier.wait()

    threads = [threading.Thread(target=produce, args=(si,))
               for si in range(ns)]
    for t in threads:
        t.start()

    got = [[] for _ in range(ns)]
    for k in range(nblocks):
        barrier.wait()   # producers push block k
        barrier.wait()   # all pushed
        served = loop.serve_window()
        assert served == ns
        for si in range(ns):
            blk = loop.pop(si)
            assert blk is not None
            got[si].append(blk)
    for t in threads:
        t.join()

    for si in range(ns):
        np.testing.assert_allclose(
            np.concatenate([g[None] for g in got[si]]),
            np.concatenate([w[si][None] for w in want]), atol=1e-6)

    st = loop.stats()
    assert st["served_blocks"] == ns * nblocks
    assert st["underruns"] == 0 and st["out_drops"] == 0
