"""Query catalog: every public operator as a (Spark builder, DuckDB oracle) pair.

The driver contract (``__spark_entry__.py``) needs, per operator, a callable
``(spark, sf_dir) -> DataFrame`` and an equivalent ANSI-SQL string DuckDB can
run over the same parquet tables. Registering both together — generated from
the same constants — keeps them in lockstep.
"""

from .registry import QUERIES, QuerySpec, query  # noqa: F401

# importing the modules populates the registry
from . import text_queries  # noqa: F401,E402
from . import series_queries  # noqa: F401,E402
from . import relational_queries  # noqa: F401,E402
from . import pipeline_queries  # noqa: F401,E402
from . import skew_queries  # noqa: F401,E402
from . import extras_queries  # noqa: F401,E402
from . import mixing_queries  # noqa: F401,E402
