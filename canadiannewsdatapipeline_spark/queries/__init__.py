"""Query registry: every operator from SURVEY.md §2 (plus the
large-scale training-data extensions) as a (Spark callable, DuckDB
oracle SQL) pair. The driver's correctness gate runs both sides at
sf=0.01 and hash-compares values; ``tests/test_oracle_parity.py``
replicates that check locally at sf=0.001.
"""

from .registry import QUERIES, QuerySpec, oracle_sql_map, query_map

# Importing the modules populates the registry.
from . import core  # noqa: E402,F401
from . import news  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import dashboard  # noqa: E402,F401
from . import training  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import history  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "query_map", "oracle_sql_map"]
