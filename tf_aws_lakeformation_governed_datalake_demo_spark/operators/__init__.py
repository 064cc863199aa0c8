"""Operator library. Importing this package populates the query REGISTRY."""

from .registry import REGISTRY, QuerySpec, query

from . import relational  # noqa: E402,F401 — registers relational queries
from . import governed  # noqa: E402,F401 — registers governance queries
from . import text  # noqa: E402,F401 — text analysis
from . import dedup  # noqa: E402,F401 — deduplication family
from . import similarity  # noqa: E402,F401 — embedding similarity search
from . import multimodal  # noqa: E402,F401 — multimodal plumbing
from . import streaming_ops  # noqa: E402,F401 — structured streaming shapes
from . import advanced  # noqa: E402,F401 — as-of/range joins, percentiles, etc.
from . import sources_ops  # noqa: E402,F401 — CSV/JSON round-trips, partitioned writes
from . import tpch_extra  # noqa: E402,F401 — Q6/Q12/Q14/Q18 shapes
from . import tpch_more  # noqa: E402,F401 — Q4/Q7/Q8/Q10/Q13/Q15/Q17/Q19/Q22 shapes
from . import udf_ops  # noqa: E402,F401 — pandas-UDF surface
from . import iterative  # noqa: E402,F401 — k-means, connected components
from . import pipelines  # noqa: E402,F401 — end-to-end curation pipelines
from . import curation  # noqa: E402,F401 — split/sample/decontaminate/repetition
from . import privacy  # noqa: E402,F401 — corpus PII scrubbing
from . import quantization  # noqa: E402,F401 — product quantization (ADC ANN)
from . import maintenance  # noqa: E402,F401 — CDC diff, incremental MV refresh
from . import semantic  # noqa: E402,F401 — cluster-scoped semantic dedup
from . import graph  # noqa: E402,F401 — co-purchase graph analytics
from . import sketches  # noqa: E402,F401 — heavy hitters / frequency sketches
from . import ml  # noqa: E402,F401 — MLlib quality-classifier curation rung
from . import statements_ops  # noqa: E402,F401 — governed SQL DML statements

__all__ = ["REGISTRY", "QuerySpec", "query"]
