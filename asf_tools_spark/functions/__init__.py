"""Catalyst column-expression functions (JVM-side, whole-stage codegen).

These are the fast path: every function here compiles to built-in Spark SQL
expressions — no Python workers, no Arrow transfer. pandas-UDF variants live
in ``asf_tools_spark.operators`` only where Catalyst can't express the
semantics (EM fitting, point-in-polygon, connected components).
"""

from .scale import convert_scale_col, db_to_gaussian, power_to_gaussian  # noqa: F401
from .spatial import cell_col, subtile_col, tile_col, tile_name_col  # noqa: F401
from .membership import zmf_col  # noqa: F401
