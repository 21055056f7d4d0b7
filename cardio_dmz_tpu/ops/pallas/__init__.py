from .digit_prep import prepare_digit_cells_pallas  # noqa: F401
