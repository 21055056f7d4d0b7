"""Aux subsystem tests: config, debug timers, platform registry,
session checkpoint/resume."""

import os

import numpy as np

from cardio_dmz_tpu.config import ScanConfig, config_from_env
from cardio_dmz_tpu.utils import debug as dbg
from cardio_dmz_tpu.utils import platform as plat
from cardio_dmz_tpu.session import scanner_reset
from cardio_dmz_tpu.session.checkpoint import (
    save_session_npz, load_session_npz, save_params, load_params_npz)


def test_config_replace_and_env(monkeypatch):
    c = ScanConfig()
    assert c.scan_expiry
    c2 = c.replace(scan_expiry=False, n_streams=64)
    assert not c2.scan_expiry and c2.n_streams == 64
    monkeypatch.setenv("CARDIO_SCAN_FOREVER", "1")
    monkeypatch.setenv("CARDIO_N_STREAMS", "32")
    c3 = config_from_env()
    assert c3.scan_forever and c3.n_streams == 32


def test_timers():
    t = dbg.Timers()
    t.start(3)
    us = t.lap(3)
    assert us >= 0
    assert t.stop(3) >= us


def test_platform_registry():
    info = plat.device_summary()
    assert info["backend"] in ("cpu", "tpu", "gpu")
    assert info["n_devices"] >= 1
    # fallback latch
    assert not plat._pallas_disabled[0]
    plat.disable_pallas("test")
    assert not plat.has_pallas_tpu()
    plat._pallas_disabled[0] = False  # restore for other tests


def test_session_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    state = scanner_reset()._replace(
        count16=jnp.asarray(5, jnp.int32),
        number_complete=jnp.asarray(True),
        completed_digits=jnp.arange(16, dtype=jnp.int32),
    )
    path = str(tmp_path / "session.npz")
    save_session_npz(path, state)
    restored = load_session_npz(path)
    assert int(restored.count16) == 5
    assert bool(restored.number_complete)
    np.testing.assert_array_equal(np.asarray(restored.completed_digits),
                                  np.arange(16))


def test_params_checkpoint_roundtrip(tmp_path):
    from cardio_dmz_tpu.models.weights import load_params
    params = {"vseg_mlp": load_params("vseg_mlp")}
    path = str(tmp_path / "params.npz")
    save_params(path, params)
    restored = load_params_npz(path)
    np.testing.assert_allclose(np.asarray(restored["vseg_mlp"]["hidden_b"]),
                               np.asarray(params["vseg_mlp"]["hidden_b"]))


def test_debug_image_dumps(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    import synthetic
    from cardio_dmz_tpu.models.weights import load_params
    from cardio_dmz_tpu.utils.debug_images import dump_expiry_stages
    y = synthetic.render_frame_with_expiry(
        "4111111111111111", "08/28", y0=150, offset=35, expiry_y=212,
        expiry_x=120, noise=1, seed=0)
    paths = dump_expiry_stages(y, 150, load_params("slash_mlp"),
                               str(tmp_path))
    assert len(paths) == 4
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_serving_metrics_surface():
    """Loop-level metrics registry: counters, gauges, timers, and the
    text exposition the serving loop exports (SURVEY.md §5 observability
    gap — the reference's analytics ring is per-session and unexported)."""
    import time as _time
    from cardio_dmz_tpu.runtime.metrics import Metrics

    m = Metrics()
    m.inc("frames_scanned", 64)
    m.inc("frames_scanned", 64)
    m.set("streams", 64)
    with m.time("step"):
        _time.sleep(0.01)
    snap = m.snapshot()
    assert snap["counter_frames_scanned"] == 128
    assert snap["gauge_streams"] == 64
    assert snap["timer_step_count"] == 1
    assert snap["timer_step_seconds_total"] >= 0.01
    text = m.render_text()
    assert "cardio_frames_scanned 128" in text
    assert "# TYPE cardio_frames_scanned counter" in text
    assert "cardio_step_seconds_avg" in text
    # kind-namespaced keys cannot collide: a gauge named step_count does
    # not overwrite the timer-derived step_count
    m.set("step_count", -1)
    snap = m.snapshot()
    assert snap["timer_step_count"] == 1 and snap["gauge_step_count"] == -1
    # non-numeric values are dropped from exposition, bools become 0/1
    m.set("label", "abc")
    m.set("ready", True)
    text = m.render_text()
    assert "abc" not in text and "cardio_ready 1" in text
