"""Column-expression helpers (the engine's scalar-function surface).

Everything here is a *native* Catalyst expression builder — no Python UDFs —
so the hot path stays inside whole-stage codegen (SURVEY.md §2.10 strategy:
demote reference UDFs to column expressions wherever semantics allow).
"""

from job_etl_spark.functions.identity import company_id_expr, hash_key_expr, ws_normalize
from job_etl_spark.functions.text import (
    clean_company_name_expr,
    seniority_level_expr,
    validate_enum_expr,
)
from job_etl_spark.functions.timeparse import parse_timestamp_expr
from job_etl_spark.functions.numeric import safe_double_expr, salary_bounds_exprs

__all__ = [
    "hash_key_expr",
    "company_id_expr",
    "ws_normalize",
    "seniority_level_expr",
    "validate_enum_expr",
    "clean_company_name_expr",
    "parse_timestamp_expr",
    "safe_double_expr",
    "salary_bounds_exprs",
]
