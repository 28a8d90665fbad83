"""Central query/oracle registry consumed by ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
extensions) has a named query here; keys present in ``QUERIES`` but not
``ORACLES`` get the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible ops).

STABILITY: query keys (q1..q29) are part of the cross-round correctness
record — the driver compares CORRECTNESS_r{N}.json between rounds. Add
new keys freely; never rename or repurpose existing ones.
"""

from __future__ import annotations

from .analytics import ANALYTICS_ORACLES, ANALYTICS_QUERIES
from .etl_queries import ETL_ORACLES, ETL_QUERIES
from .llm_queries import LLM_ORACLES, LLM_QUERIES
from .multimodal_queries import MULTIMODAL_ORACLES, MULTIMODAL_QUERIES
from .olap_queries import OLAP_ORACLES, OLAP_QUERIES
from .sampling_queries import SAMPLING_ORACLES, SAMPLING_QUERIES
from .streaming_queries import STREAMING_ORACLES, STREAMING_QUERIES
from .temporal_queries import TEMPORAL_ORACLES, TEMPORAL_QUERIES
from .tpch_queries import TPCH_ORACLES, TPCH_QUERIES

QUERIES = {
    **ANALYTICS_QUERIES,
    **ETL_QUERIES,
    **LLM_QUERIES,
    **STREAMING_QUERIES,
    **MULTIMODAL_QUERIES,
    **TPCH_QUERIES,
    **TEMPORAL_QUERIES,
    **OLAP_QUERIES,
    **SAMPLING_QUERIES,
}
ORACLES = {
    **ANALYTICS_ORACLES,
    **ETL_ORACLES,
    **LLM_ORACLES,
    **STREAMING_ORACLES,
    **MULTIMODAL_ORACLES,
    **TPCH_ORACLES,
    **TEMPORAL_ORACLES,
    **OLAP_ORACLES,
    **SAMPLING_ORACLES,
}
