"""PySpark-native analytics engine with the query/data-processing
capabilities of ``carlosaezp/Pipeline_Apache_Beam_Entrega1_CS`` (reference:
a single-dataflow Apache Beam ETL, see ``/root/reference/src/pipeline.py``),
rebuilt Spark-first and extended with the relational / streaming /
LLM-data-pipeline operator surface described in SURVEY.md §2.

Design stance (SURVEY.md §7): DataFrame/Catalyst-native, zero Python UDFs
in the core, explicit schemas, broadcast joins for dimensions, AQE on.
"""

__version__ = "0.1.0"
