"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference malaria-surveillance ETL platform
(ericmaniraguh/geoscale-healthflow-etl-django-analytics).

Built Spark-first: every operator is declared with the DataFrame/SQL
API so Catalyst owns pushdown, pruning, join strategy, partial
aggregation and AQE re-planning. See SURVEY.md for the operator
inventory this package implements.

Layout:
- ``session``    SparkSession factory tuned for scale (AQE, pushdown).
- ``sources``    parquet catalog + the semantic layer mapping the
                 reference's document collections onto test tables.
- ``functions``  pure-Column expression library (cleaning, text,
                 vector math) — zero row-at-a-time UDFs in hot paths.
- ``operators``  the relational operator inventory (SURVEY.md §2):
                 aggregations, joins, upserts, dedup, similarity.
- ``plans``      plan-inspection helpers (explain/shuffle audits).
- ``streaming``  Structured Streaming generalizations (§2.10).
"""

__version__ = "0.1.0"
