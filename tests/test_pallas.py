"""Pallas kernel tests (interpret mode on CPU; the same kernels compile on
TPU — parity there is exercised by running the suite on a TPU host)."""

import jax
import jax.numpy as jnp
import numpy as np

from cardio_dmz_tpu.ops.pallas.digit_prep import prepare_digit_cells_pallas
from cardio_dmz_tpu.scan.categorize import extract_cells, prepare_cells

INTERPRET = jax.default_backend() != "tpu"

RNG = np.random.RandomState(7)


def _case(seed):
    rng = np.random.RandomState(seed)
    strip = rng.randint(0, 256, (27, 428)).astype(np.uint8)
    offsets = np.sort(rng.choice(409, 16, replace=False)).astype(np.int32)
    return strip, offsets


def test_digit_prep_matches_jnp_path():
    for seed in range(3):
        strip, offsets = _case(seed)
        ref = np.asarray(prepare_cells(
            extract_cells(jnp.asarray(strip), jnp.asarray(offsets))))
        out = np.asarray(prepare_digit_cells_pallas(
            jnp.asarray(strip), jnp.asarray(offsets), interpret=INTERPRET))
        np.testing.assert_allclose(out, ref, atol=1e-6)


def test_digit_prep_edge_offsets():
    strip, _ = _case(0)
    # extreme offsets: 0 and the rightmost legal cell
    offsets = np.array([0, 409] + [20 * i for i in range(1, 15)],
                       np.int32)
    ref = np.asarray(prepare_cells(
        extract_cells(jnp.asarray(strip), jnp.asarray(offsets))))
    out = np.asarray(prepare_digit_cells_pallas(
        jnp.asarray(strip), jnp.asarray(offsets), interpret=INTERPRET))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_number_scores_pallas_path_matches():
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.scan.categorize import number_scores
    if INTERPRET:
        # the pallas route inside number_scores targets compiled TPU;
        # the kernel itself is covered above in interpret mode
        return
    params = load_all_params()
    strip, offsets = _case(1)
    a = np.asarray(number_scores(params, jnp.asarray(strip),
                                 jnp.asarray(offsets), 16))
    b = np.asarray(number_scores(params, jnp.asarray(strip),
                                 jnp.asarray(offsets), 16, use_pallas=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_warp_gather_pallas_matches_xla_exact():
    """The Mosaic warp-gather kernel (ops/pallas/warp_gather.py) is
    bit-identical to warp_perspective_exact's XLA one-hot form — the form
    that is itself bit-exact vs the compiled reference
    (tests/test_cpp_parity.py::test_warp_exact_pixel_parity) — over
    detector-realistic perspective quads on random noise (worst case:
    every quantization flip changes the output)."""
    from cardio_dmz_tpu.ops.persp import eigen_persp_transform
    from cardio_dmz_tpu.ops.warp import warp_perspective_exact

    rng = np.random.RandomState(9)
    dst = jnp.asarray([[0.0, 0.0], [427.0, 0.0], [0.0, 269.0],
                       [427.0, 269.0]], jnp.float32)
    xla = jax.jit(lambda im, m: warp_perspective_exact(
        im, m, (270, 428), use_pallas=False))
    pal = jax.jit(lambda im, m: warp_perspective_exact(
        im, m, (270, 428), use_pallas=True, interpret=INTERPRET))
    for t in range(2):
        src = (np.float32([[106, 105], [534, 105], [106, 375], [534, 375]])
               + rng.uniform(-12, 12, (4, 2)).astype(np.float32))
        img = rng.randint(0, 256, (480, 640)).astype(np.uint8)
        m = eigen_persp_transform(jnp.asarray(src), dst)
        np.testing.assert_array_equal(np.asarray(pal(img, m)),
                                      np.asarray(xla(img, m)))
