from .ingest import FramePump, deinterleave_c2, rgba_to_r, ycbcr422_split  # noqa: F401
from .metrics import Metrics  # noqa: F401
