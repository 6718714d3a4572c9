"""Plan inspection utilities — used by tests to assert that Catalyst did
what the 100 TB design requires (pushdown, pruning, broadcast, codegen)."""

from mongodb_mysql_cdc_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
