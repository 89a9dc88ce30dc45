"""tl_spark — a PySpark-native HTML main-content extraction engine.

Re-implements the parsing/extraction semantics of the reference HTML
parser (y21/tl, see /root/reference) as:

- a pure-Python byte-level kernel (``tl_spark.kernel``) with byte-exact
  output parity against the reference's stable build,
- vectorized Arrow-batch Spark UDFs (``tl_spark.functions``) — whole
  record batches cross the JVM/Python boundary, never per-row Python,
- distributed pipeline operators (``tl_spark.operators``,
  ``tl_spark.pipeline``) for 10^12-turn-scale transcript tables:
  skew-aware bucketing, stable turn ordering, dedup, similarity,
  text analysis, lineage and resume bookkeeping.
"""

from tl_spark.kernel.htmlparse import parse, TlDom  # noqa: F401

__version__ = "0.1.0"
