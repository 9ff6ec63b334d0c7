"""osmapreduceproject_spark — PySpark-native analytics engine.

A ground-up re-expression of ``marcoisabella9/OSMapReduceProject``'s
MapReduce semantics (see ``/root/repo/SURVEY.md``) on the Spark DataFrame
engine, extended with the relational + LLM-data-pipeline operator surface
required for 100 TB-scale training-data work.
"""

from .engine import Engine
from .session import get_spark, load_tables

__all__ = ["Engine", "get_spark", "load_tables"]
__version__ = "0.1.0"
