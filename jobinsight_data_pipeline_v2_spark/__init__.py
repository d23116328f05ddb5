"""jobinsight_data_pipeline_v2_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first reimplementation of the query and
data-processing capabilities of the reference ETL/analytics system
(Trantuan24/JobInsight_Data_Pipeline_v2): star-schema warehouse build
(SCD2 dimensions, periodic-snapshot fact with carry-forward, M:N
location bridge), 16 analytic views, quality validators/gates, plus
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal column plumbing) that the reference lacks.

Everything is expressed declaratively with the DataFrame / Spark SQL
API so Catalyst + Tungsten pick the physical strategy; Python UDFs are
reserved for edges the built-ins genuinely cannot express.
"""

__version__ = "0.1.0"
