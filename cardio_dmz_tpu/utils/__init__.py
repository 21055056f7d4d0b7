from .olm import (  # noqa: F401
    CardType,
    CardInfo,
    passes_luhn_checksum,
    luhn_checksum_jax,
    card_info_for_prefix_and_length,
    card_type_valid_jax,
    guide_frame,
    opposite_orientation,
    Rect,
    Point,
    rect_points,
    scale_point,
)
from .geometry import (  # noqa: F401
    ParametricLine,
    parametric_line_none,
    is_parametric_line_none,
    parametric_intersect,
    line_by_shifting_origin,
    inset_rect,
)
