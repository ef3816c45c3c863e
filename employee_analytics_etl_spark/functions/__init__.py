from .expr import (  # noqa: F401
    bucketize,
    davg,
    dsum,
    keep_null_neq,
    null_safe_eq_bool,
    performance_category,
    salary_bucket,
    sentinel_fk,
    yn_to_int,
)
