"""PySpark-native analytics engine with the query/data-processing
capabilities of agnivesh13/Automated-OHLCV-Data-Pipeline-for-Algorithmic-Trading.

Built from scratch on idiomatic Spark (DataFrame / SQL / Catalyst /
Structured Streaming). The reference is an AWS-Lambda pipeline over OHLCV
candle data; this engine re-expresses its entire query surface (see
SURVEY.md SS2) as lazy DataFrame transforms so Catalyst handles pruning,
pushdown, and join strategy, and it is designed to run unchanged on a
multi-executor cluster at 100 TB scale.

Subpackages
-----------
operators  : relational/analytic operators (rollups, dedup, resample,
             windows, top-k, joins, text analysis, similarity search)
functions  : scalar column helpers (symbol cleaning, time parsing, ...)
sources    : readers for raw OHLCV envelopes, tables, mock generators
plans      : composed jobs (bronze->silver ETL, SQL view registry)
streaming  : Structured Streaming equivalents of the micro-batch pipeline
"""

from .session import get_spark, stateful_partitions, tune  # noqa: F401

__version__ = "0.1.0"
