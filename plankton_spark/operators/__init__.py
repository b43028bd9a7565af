"""Reusable distributed operator building blocks.

Operators here exist because the naive DataFrame spelling compiles to
a plan that melts at scale (single-partition windows, unpartitioned
prefix scans). Each helper keeps the exact semantics while staying
P-way parallel; queries compose them instead of re-deriving the
pattern.
"""

from plankton_spark.operators.cdc import cdf_last_image
from plankton_spark.operators.profiling import profile_table
from plankton_spark.operators.ranking import (
    exclusive_prefix_max,
    global_row_number,
)

__all__ = [
    "global_row_number",
    "exclusive_prefix_max",
    "profile_table",
    "cdf_last_image",
]
