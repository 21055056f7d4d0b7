"""Golden model regression tests.

Each reference model ships a baked test input and known-good output which its
pass*() self-check compares at 1e-5 abs tolerance (e.g. modelc_5c241121.cpp
passc fn; models/TestGeneratedModels.mm:35-41). We ported those vectors with
the weights and apply the same tolerance — the strongest parity anchor the
reference provides.
"""

import numpy as np
import pytest

from cardio_dmz_tpu.models import apply_mlp, apply_pan_conv, apply_expiry_conv
from cardio_dmz_tpu.models.weights import load_params
from cardio_dmz_tpu.models.zoo import set_precision

TOL = 1e-5


@pytest.fixture(autouse=True)
def _golden_precision():
    # golden parity requires full fp32 matmuls; serving uses the fast default
    prev = set_precision("highest")
    yield
    set_precision(prev)


@pytest.mark.parametrize("name,n_in", [("vseg_mlp", 204), ("slash_mlp", 176)])
def test_mlp_golden(name, n_in):
    params = load_params(name, include_test_vectors=True)
    out = np.asarray(apply_mlp(params, params["test_input"]))
    expected = np.asarray(params["test_output"])
    np.testing.assert_allclose(out, expected, atol=TOL)


@pytest.mark.parametrize("name", ["pan_conv_a", "pan_conv_b", "pan_conv_c"])
def test_pan_conv_golden(name):
    params = load_params(name, include_test_vectors=True)
    out = np.asarray(apply_pan_conv(params, params["test_input"]))
    expected = np.asarray(params["test_output"])
    np.testing.assert_allclose(out, expected, atol=TOL)


def test_expiry_conv_golden():
    params = load_params("expiry_conv", include_test_vectors=True)
    probs, a1, a2, h = apply_expiry_conv(
        params, params["test_input"], return_intermediates=True)
    # intermediate goldens too (modelc_bf4dd6c8.cpp checks conv/hidden layers)
    np.testing.assert_allclose(
        np.asarray(a1).reshape(50, 70), np.asarray(params["test_conv1_out"]),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(a2), np.asarray(params["test_conv2_out"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(params["test_hidden_out"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(probs), np.asarray(params["test_output"]), atol=TOL)


def test_pan_conv_batched_matches_single():
    params = load_params("pan_conv_a", include_test_vectors=True)
    img = np.asarray(params["test_input"])
    batch = np.stack([img, img * 0.5, np.flipud(img)])
    out_b = np.asarray(apply_pan_conv(params, batch))
    for i in range(3):
        out_s = np.asarray(apply_pan_conv(params, batch[i]))
        np.testing.assert_allclose(out_b[i], out_s, atol=1e-6)


def test_runtime_self_check():
    """TestGeneratedModels +selfCheck equivalent: all six model instances
    reproduce their baked golden outputs at 1e-5."""
    from cardio_dmz_tpu.models import self_check
    results = self_check()
    assert len(results) == 6
    assert all(results.values()), results


def test_pan_conv_mm_matches_conv_form():
    """The serving matmul lowering (apply_pan_conv_mm) == the conv form on
    random cells to float-rounding noise, at both precisions (the matmul
    is the same tap sums with interleaved exact zeros + a column
    permutation)."""
    import numpy as np
    from cardio_dmz_tpu.models import apply_pan_conv, apply_pan_conv_mm
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.models import zoo

    rng = np.random.default_rng(9)
    cells = rng.uniform(0, 1, (7, 27, 19)).astype(np.float32)
    for key in ("pan_conv_a", "pan_conv_b", "pan_conv_c"):
        p = load_all_params()[key]
        zoo.set_precision("highest")
        try:
            a = np.asarray(apply_pan_conv(p, cells))
            b = np.asarray(apply_pan_conv_mm(p, cells))
        finally:
            zoo.set_precision("default")
        np.testing.assert_allclose(a, b, atol=2e-6)
