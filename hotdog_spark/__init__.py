"""hotdog_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of buoyant-data/hotdog (reference studied at
/root/reference; see SURVEY.md for the file:line parity map).

The reference is a syslog→Kafka/Parquet streaming forwarder whose "query
language" is a YAML rules file (regex / JMESPath matchers + an ordered
action chain of replace/merge/forward/stop).  This engine re-expresses that
dataflow Spark-first:

* the YAML config is compiled into pure Catalyst ``Column`` expressions
  (``plans.compiler``) — no per-row Python in the hot path;
* syslog parsing (RFC 5424 / RFC 3164) is a ``regexp_extract`` cascade
  (``functions.syslog``), fully whole-stage-codegen'd;
* routing is a first-match-wins ``CASE WHEN`` chain; sinks are the stock
  Kafka / Parquet ``writeStream`` sinks with per-row ``topic`` routing
  (``streaming``);
* beyond the reference surface, ``operators/`` adds the relational and
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) designed for 100 TB scale.
"""

from hotdog_spark.version import ENGINE_VERSION

__version__ = ENGINE_VERSION

__all__ = ["ENGINE_VERSION"]
