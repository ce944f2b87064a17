"""dbt_extrica_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``extricatrianz/dbt-extrica``.

The reference (/root/reference) is a thin dbt adapter that ships SQL text to a
Trino cluster. This package re-expresses its four capability layers natively
on Spark:

1. Materialization orchestration (table / view / incremental / snapshot /
   materialized view / seed)                    -> :mod:`.operators`
2. Cross-database SQL function shims            -> :mod:`.functions`
3. Catalog / metadata introspection             -> :mod:`.catalog`
4. Connection & execution management            -> :mod:`.connections`

Plus [EXTENSION] large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) -> :mod:`.extensions`.

Everything is DataFrame-to-DataFrame / Spark-SQL; Catalyst provides the
optimizer (predicate pushdown, join selection, AQE). Designed for a
1000-executor cluster; tested on local mode.
"""

__version__ = "0.1.0"

from .session import get_spark, configure_session
from .relation import Relation, RelationType
from .column import Column
from .engine import Engine
from .plans.model import Model

__all__ = [
    "get_spark",
    "configure_session",
    "Relation",
    "RelationType",
    "Column",
    "Engine",
    "Model",
    "__version__",
]
