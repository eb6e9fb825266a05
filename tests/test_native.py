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
