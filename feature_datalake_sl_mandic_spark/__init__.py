"""feature_datalake_sl_mandic_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of the
reference repo ``GersonMandic/feature-Datalake-SL-Mandic`` (an Airflow +
Dataproc JDBC->BigQuery ELT pipeline; see SURVEY.md), extended with the
analytics / LLM-data-pipeline operator surface the driver exercises
(relational queries, dedup, similarity search, text analysis, event
analytics, streaming, multimodal plumbing).

Design stance (SURVEY.md section 7): no bespoke execution engine. Every
operator is a declarative DataFrame/SQL plan; Catalyst + Tungsten + AQE do
the planning. Python only ever builds plans or handles provably-small
control-plane data.
"""

from feature_datalake_sl_mandic_spark.session import get_spark
from feature_datalake_sl_mandic_spark.catalog import load_tables, TABLE_NAMES

__all__ = ["get_spark", "load_tables", "TABLE_NAMES"]
__version__ = "0.1.0"
