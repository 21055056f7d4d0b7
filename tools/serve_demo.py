#!/usr/bin/env python
"""Shim: tool moved into the package (cardio_dmz_tpu/tools/serve_demo.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cardio_dmz_tpu.tools.serve_demo import main

if __name__ == "__main__":
    main()
