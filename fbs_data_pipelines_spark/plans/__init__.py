"""Entity transform plans: lazy DataFrame pipelines per (layer, entity).

The reference dispatches ``{layer}_{entity}_`` methods by reflection
(/root/reference/etl.py:53-54,73-74); here it's an explicit registry —
same late binding, no getattr tricks.
"""

from fbs_data_pipelines_spark.plans.creditos import modeled_creditos, raw_creditos
from fbs_data_pipelines_spark.plans.radicados import (
    WORKING_GROUPS,
    modeled_radicados,
    raw_radicados,
)

#: (layer, entity) → transform fn — the reflection-free dispatch table
TRANSFORMS = {
    ("raw", "creditos"): raw_creditos,
    ("raw", "radicados"): raw_radicados,
    ("modeled", "creditos"): modeled_creditos,
    ("modeled", "radicados"): modeled_radicados,
}

__all__ = [
    "raw_creditos",
    "modeled_creditos",
    "raw_radicados",
    "modeled_radicados",
    "WORKING_GROUPS",
    "TRANSFORMS",
]
