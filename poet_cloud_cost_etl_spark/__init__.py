"""PySpark-native analytics engine with the query and data-processing
capabilities of ``cambridge-pte/poet-cloud-cost-etl``.

The reference is a single-process DuckDB + pandas + psycopg2 ETL
(see SURVEY.md). This engine re-expresses every operator it supports —
plus the LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis) — on the Spark DataFrame/SQL API so
Catalyst/Tungsten handle physical execution, and the design survives a
1000-executor / 100 TB deployment (no driver-side materialization,
broadcast-able dims, partition-prunable scans).
"""

__version__ = "0.1.0"
