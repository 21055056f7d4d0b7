#!/usr/bin/env python
"""Driver hook: full scan-pipeline throughput bench (one JSON line).

Thin shim over cardio_dmz_tpu.tools.bench so the benchmark ships inside the
package (console script `cardio-bench`) while the driver keeps invoking
`python bench.py` at the repo root.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cardio_dmz_tpu.tools.bench import main

if __name__ == "__main__":
    main()
