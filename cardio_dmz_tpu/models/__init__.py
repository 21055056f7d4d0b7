from .zoo import (  # noqa: F401
    apply_mlp,
    apply_pan_conv,
    apply_pan_conv_mm,
    apply_expiry_conv,
    apply_expiry_conv_mm,
    pan_digit_scores,
)
from .weights import load_params, load_all_params  # noqa: F401
from .selfcheck import self_check, all_models_pass  # noqa: F401
