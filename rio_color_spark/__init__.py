"""rio_color_spark — a PySpark-native spatial tiling + color-correction engine.

A from-scratch engine with the pixel-math semantics of mapbox/rio-color
(reference at /root/reference, cited per-module by file:line) re-expressed
Spark-first: Iceberg-style image+caption tables, Arrow-vectorized NumPy
kernels inside ``mapInPandas`` operators, S2-style cell / Web-Mercator XYZ
tile indexing, broadcast point-in-polygon joins, kNN neighbor lookups,
salted rasterization, and checkpoint/lineage-tracked writes.

Nothing in this package is a port of the reference's Cython/Python code:
the per-pixel Cython loops are re-derived as whole-array NumPy expressions,
and the execution engine is Spark DataFrames, not a process pool.
"""

__version__ = "0.1.0"

from rio_color_spark.functions.utils import to_math_type, scale_dtype, magick_to_rio
from rio_color_spark.functions.operations import (
    sigmoidal,
    gamma,
    saturation,
    simple_atmo,
    simple_atmo_opstring,
)
from rio_color_spark.functions.colorspace import (
    ColorSpace,
    convert,
    convert_arr,
    saturate_rgb,
)
from rio_color_spark.plans.dsl import parse_operations

__all__ = [
    "to_math_type",
    "scale_dtype",
    "magick_to_rio",
    "sigmoidal",
    "gamma",
    "saturation",
    "simple_atmo",
    "simple_atmo_opstring",
    "ColorSpace",
    "convert",
    "convert_arr",
    "saturate_rgb",
    "parse_operations",
]
