"""hbasewd_spark — a PySpark-native engine with the capabilities of
sematext/HBaseWD (write-distribution key salting + salt-aware ordered
range scans), extended with the relational surface the reference gets
from HBase and LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns), designed for 100 TB scale.

Reference: /root/reference (sematext/HBaseWD). See SURVEY.md for the
operator inventory and the Spark mapping rationale.
"""

from hbasewd_spark.session import get_spark

__all__ = ["get_spark"]
