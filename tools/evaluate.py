"""Offline evaluation — compatibility shim.

The implementation moved into the installed package as ``posetpu-eval``
(:mod:`posetpu.eval.cli`) so checkpoint evaluation works from any cwd;
this script keeps the historical ``python tools/evaluate.py`` invocation
(and its importable ``head_sizes``/``head_sizes_from_pts``/``main``)
working unchanged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from posetpu.eval.cli import (  # noqa: E402,F401
    head_sizes,
    head_sizes_from_pts,
    main,
)

if __name__ == "__main__":
    main()
