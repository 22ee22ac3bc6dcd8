"""Plan-inspection helpers (scale hygiene).

SURVEY.md §4: every reference semantic maps onto Catalyst built-ins;
what remains is *verifying* the physical plans are the ones you'd want
at 100 TB — filters reaching the scan, dims broadcast, no stray
exchanges. These helpers parse ``explain`` output so tests can assert
plan shape, not just results.
"""

from vbb_data_pipeline_spark.plans.explain import (  # noqa: F401
    assert_broadcast_join,
    assert_pushed_filter,
    count_exchanges,
    formatted,
)
