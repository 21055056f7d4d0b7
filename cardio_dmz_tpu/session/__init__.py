from .state import (  # noqa: F401
    ScannerState,
    ScannerResult,
    scanner_initialize,
    scanner_reset,
    scanner_add_frame,
    scanner_result,
    scanner_step,
    scan_frames,
)
from .analytics import ScanAnalytics, analytics_init, analytics_record_frame  # noqa: F401
