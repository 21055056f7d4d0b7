"""Native ingest runtime tests: conversions parity + concurrent ring."""

import threading

import numpy as np
import pytest

runtime = pytest.importorskip("cardio_dmz_tpu.runtime")

RNG = np.random.RandomState(0)


def test_deinterleave_c2_matches_numpy():
    x = RNG.randint(0, 256, (32, 128), dtype=np.uint8)
    c1, c2 = runtime.deinterleave_c2(x)
    np.testing.assert_array_equal(c1, x[:, 0::2])
    np.testing.assert_array_equal(c2, x[:, 1::2])


def test_rgba_to_r():
    x = RNG.randint(0, 256, (16, 64), dtype=np.uint8)
    r = runtime.rgba_to_r(x)
    np.testing.assert_array_equal(r, x[:, 0::4])


def test_ycbcr422_split():
    w, h = 64, 8
    frame = RNG.randint(0, 256, h * w * 2, dtype=np.uint8)
    y, cb, cr = runtime.ycbcr422_split(frame, w, h)
    f = frame.reshape(h, w // 2, 4)
    np.testing.assert_array_equal(cb, f[:, :, 0])
    np.testing.assert_array_equal(y[:, 0::2], f[:, :, 1])
    np.testing.assert_array_equal(cr, f[:, :, 2])
    np.testing.assert_array_equal(y[:, 1::2], f[:, :, 3])


def test_framepump_basic():
    pump = runtime.FramePump(4, frame_shape=(8, 8))
    frames = [np.full((8, 8), i + 1, np.uint8) for i in range(4)]
    for i, f in enumerate(frames):
        pump.push(i, f, frame_id=100 + i)
    batch, ids, fresh = pump.acquire_batch()
    assert fresh == 4
    for i in range(4):
        np.testing.assert_array_equal(batch[i], frames[i])
        assert ids[i] == 100 + i
    # no new frames -> nothing fresh
    _, _, fresh2 = pump.acquire_batch()
    assert fresh2 == 0
    # newer frame replaces older
    pump.push(2, np.full((8, 8), 99, np.uint8), frame_id=200)
    batch3, ids3, fresh3 = pump.acquire_batch()
    assert fresh3 == 1
    assert batch3[2][0, 0] == 99 and ids3[2] == 200
    pump.close()


def test_framepump_bad_stream():
    pump = runtime.FramePump(2, frame_shape=(4, 4))
    with pytest.raises(IndexError):
        pump.push(5, np.zeros((4, 4), np.uint8), 1)
    pump.close()


def test_framepump_concurrent_producers():
    """Camera threads hammer the ring while the consumer acquires batches;
    every acquired frame must be internally consistent (constant-valued)."""
    n_streams, iters = 8, 300
    pump = runtime.FramePump(n_streams, frame_shape=(32, 32))
    stop = threading.Event()

    def producer(sid):
        i = 0
        while not stop.is_set():
            i += 1
            pump.push(sid, np.full((32, 32), (sid * 37 + i) % 256, np.uint8),
                      frame_id=i)

    threads = [threading.Thread(target=producer, args=(s,), daemon=True)
               for s in range(n_streams)]
    for t in threads:
        t.start()
    torn = 0
    for _ in range(iters):
        batch, ids, _ = pump.acquire_batch()
        for s in range(n_streams):
            vals = np.unique(batch[s])
            if len(vals) != 1:
                torn += 1
    stop.set()
    for t in threads:
        t.join(timeout=2)
    pump.close()
    assert torn == 0  # seqlock must never yield a torn frame
