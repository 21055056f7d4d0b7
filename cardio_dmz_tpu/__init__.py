"""cardio_dmz_tpu — a TPU-native card-scanning framework.

A from-scratch JAX/XLA re-design with the full capability surface of the
card.io-dmz reference library (see SURVEY.md): real-time credit-card PAN +
expiry extraction from camera frames, built as pure jittable functions that
batch over concurrent streams and shard over device meshes.

Layering (bottom-up):
  ops/       low-level CV kernels (sobel, canny, hough, morph, warp, ...)
  models/    the five tiny NN models with ported reference weights
  scan/      per-frame pipeline (vseg -> hseg -> categorize -> frame)
  session/   cross-frame scanner state machine (pytree + lax.scan)
  api        dmz.h-equivalent public surface
  parallel/  mesh / sharding utilities for multi-chip stream batches
  train/     training for the tiny models (new capability)
"""

__version__ = "0.1.0"

from . import api, constants, models, ops, scan, session, utils  # noqa: F401
