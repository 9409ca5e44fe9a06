"""Plan-inspection helpers (explain / shuffle / broadcast assertions)."""

from capstone_etl_spark.plans.contracts import (  # noqa: F401
    ALLOWED_CARTESIAN,
    HEADLINE,
)
from capstone_etl_spark.plans.inspect import (  # noqa: F401
    broadcast_hash_join_count,
    exchange_count,
    executed_plan,
    formatted_plan,
    has_cartesian,
    pushed_filters,
    unpartitioned_window_count,
    wholestage_codegen_count,
)
