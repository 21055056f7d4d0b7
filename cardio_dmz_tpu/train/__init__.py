from .trainer import (  # noqa: F401
    init_pan_conv_params,
    init_mlp_params,
    pan_conv_loss,
    mlp_loss,
    make_train_step,
    fit,
)
from .data import synthetic_digit_batch  # noqa: F401
