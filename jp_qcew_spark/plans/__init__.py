from jp_qcew_spark.plans.inspect import (  # noqa: F401
    broadcast_hash_joins,
    count_exchanges,
    formatted_plan,
    has_cartesian_product,
    has_partial_aggregation,
    pushed_filters,
    read_schemas,
    sort_merge_joins,
    wholestage_codegen_spans,
)
