"""Whole-query plans: the flagship analytics query, the oracle-paired
relational operator suite, and the SF 11-table normalization pipeline.

Importing this package registers every query module into
``relational.QUERIES`` / ``relational.ORACLE_SQL``.
"""

from . import analytics as analytics  # windows / set ops / rollup / time-series
from . import extensions as extensions  # streaming / ml / multimodal
from . import frame_api as frame_api  # crosstab / top-k sketch / pagination
from . import lakehouse as lakehouse  # merge upsert / scd2 / funnel
from . import modern_sql as modern_sql  # bitmap / variant / recursive CTE / listagg
from . import relational as relational  # base registry
from . import sf_pipeline as sf_pipeline  # SF 11-table pipeline entries
from . import similarity_search as similarity_search  # embedding ANN / near-dup
from . import sql_features as sql_features  # pipe syntax / SQL UDF / collation
from . import text_analysis as text_analysis  # text stats / dedup family
from . import tpch_suite as tpch_suite  # Q5-Q22 decision-support shapes
