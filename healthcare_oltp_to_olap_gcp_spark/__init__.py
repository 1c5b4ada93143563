"""PySpark-native analytics engine with the capabilities of the
reference GCP healthcare OLTP->OLAP pipeline (see SURVEY.md).

Everything here is DataFrame/SQL-first: logical plans are declared with
the PySpark DataFrame API so Catalyst/Tungsten pick the physical
strategy (pushdown, pruning, broadcast, whole-stage codegen, AQE).
"""

__version__ = "0.1.0"
