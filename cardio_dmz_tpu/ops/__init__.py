from .morph import morph_grad3_1d_u8, morph_grad3_2d_cross_u8  # noqa: F401
from .convert import (  # noqa: F401
    split_u8,
    lineardown2_1d_u8,
    norm_convert_minmax,
    ycbcr_to_rgb,
    deinterleave_rgba_to_r,
)
from .sobel import (  # noqa: F401
    sobel7,
    sobel3_dx_dy,
    scharr3_dx_abs,
    scharr3_dy_abs,
)
from .stats import stddev_of_abs, equalize_hist, brightness_mean  # noqa: F401
from .canny import (adaptive_canny7, canny7,  # noqa: F401
                    canny7_precomputed_sobel)
from .hough import hough_best_line  # noqa: F401
from .warp import (calc_persp_transform, warp_perspective,  # noqa: F401
                   warp_perspective_exact, unwarp_card)
from .persp import eigen_persp_transform, warp_coord_maps  # noqa: F401
from .filter import bilateral3x3, median_blur  # noqa: F401
