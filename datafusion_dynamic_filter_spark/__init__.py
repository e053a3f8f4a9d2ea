"""datafusion_dynamic_filter_spark — a PySpark-native analytics engine with
the capabilities of the ``datafusion-dynamic-filter`` reference crate:
prepared statements with parameter pushdown to the scan, over the full
Spark SQL surface, plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""

from .engine import Engine, get_session, load_tables
from .errors import EngineError, ParameterError, PrepareError
from .prepared import PreparedStatement

__all__ = [
    "Engine",
    "PreparedStatement",
    "EngineError",
    "PrepareError",
    "ParameterError",
    "get_session",
    "load_tables",
]

__version__ = "0.1.0"
