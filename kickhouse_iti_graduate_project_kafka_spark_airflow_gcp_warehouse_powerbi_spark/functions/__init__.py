from .expressions import (  # noqa: F401
    composite_pk,
    decimal_avg,
    decimal_sum,
    multi_if,
    null_if_zero_key,
    payload_hash,
    repair_ingested_at,
    required_fields_ok,
    sport_ok,
    surrogate_key,
)
