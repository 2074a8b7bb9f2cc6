"""Operator library — each module mirrors a SURVEY.md §2 operator family.

All operators are DataFrame → DataFrame builders (declarative, lazy);
Catalyst picks the physical strategy.  Nothing in here collects to the
driver except the explicitly-named export sinks.
"""

from timesearch_spark.operators.breakdown import breakdown  # noqa: F401
from timesearch_spark.operators.merge import anti_join_merge  # noqa: F401
from timesearch_spark.operators.upsert import upsert_snapshot  # noqa: F401
