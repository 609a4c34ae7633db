"""Canonical schemas and enum domains (reference parity: §1).

The reference's layers (``scripts/bootstrap_db.sql``): raw landing
(``raw.job_postings_raw:22-27``), typed staging
(``staging.job_postings_stg:38-62``), companies
(``staging.companies_stg:74-114``), marts (``124-153``). The 16-field
common format is the adapter contract
(``services/source_extractor/base.py:92-128``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# enum domains (bootstrap_db.sql:45-50,139-141; normalize.py:25-27)
VALID_REMOTE_TYPES = ["remote", "hybrid", "onsite", "unknown"]
VALID_CONTRACT_TYPES = ["full_time", "part_time", "contract", "intern", "temp", "unknown"]
VALID_COMPANY_SIZES = [
    "1-10", "11-50", "51-200", "201-500", "501-1000", "1001-5000", "5001+", "unknown",
]
VALID_SENIORITY_LEVELS = ["junior", "intermediate", "senior", "unknown"]
SENIORITY_STATUSES = ["not_tried", "upgraded", "failed_to_upgrade"]

RAW_SCHEMA = StructType(
    [
        StructField("raw_id", StringType(), False),
        StructField("source", StringType(), False),
        StructField("payload", StringType(), False),  # provider JSON, untyped
        StructField("collected_at", TimestampType(), False),
    ]
)

# the 16-field canonical adapter output (base.py:92-128), pre-normalization:
# loosely-typed strings; normalize.py tightens types
COMMON_SCHEMA = StructType(
    [
        StructField("provider_job_id", StringType()),
        StructField("job_link", StringType()),
        StructField("job_title", StringType()),
        StructField("company", StringType()),
        StructField("company_size", StringType()),
        StructField("location", StringType()),
        StructField("remote_type", StringType()),
        StructField("contract_type", StringType()),
        StructField("salary_min", StringType()),
        StructField("salary_max", StringType()),
        StructField("salary_currency", StringType()),
        StructField("description", StringType()),
        StructField("skills_raw", ArrayType(StringType())),
        StructField("posted_at", StringType()),
        StructField("apply_url", StringType()),
        StructField("source", StringType()),
    ]
)

STAGING_SCHEMA = StructType(
    [
        StructField("hash_key", StringType(), False),
        StructField("provider_job_id", StringType()),
        StructField("job_link", StringType()),
        StructField("job_title", StringType(), False),
        StructField("company", StringType(), False),
        StructField("company_size", StringType(), False),
        StructField("location", StringType(), False),
        StructField("remote_type", StringType(), False),
        StructField("contract_type", StringType(), False),
        StructField("seniority_level", StringType(), False),
        StructField("seniority_enrichment_status", StringType(), False),
        StructField("salary_min", DoubleType()),
        StructField("salary_max", DoubleType()),
        StructField("salary_currency", StringType()),
        StructField("description", StringType()),
        StructField("skills_raw", ArrayType(StringType())),
        StructField("posted_at", TimestampType()),
        StructField("apply_url", StringType()),
        StructField("source", StringType(), False),
        StructField("first_seen_at", TimestampType(), False),
        StructField("last_seen_at", TimestampType(), False),
    ]
)

# the 11 nullable payload columns merged via COALESCE(new, old) on upsert
# (db_operations.py:427-460)
STAGING_COALESCE_COLS = [
    "provider_job_id",
    "job_link",
    "company_size",
    "salary_min",
    "salary_max",
    "salary_currency",
    "description",
    "skills_raw",
    "posted_at",
    "apply_url",
    "seniority_level",
]
STAGING_OVERWRITE_COLS = ["job_title", "company", "location", "source", "last_seen_at"]
STAGING_KEEP_FIRST_COLS = ["first_seen_at"]

FACT_JOBS_SCHEMA = StructType(
    [
        StructField("hash_key", StringType(), False),
        StructField("job_title_std", StringType()),
        StructField("company_id", StringType()),
        StructField("location_std", StringType()),
        StructField("location_lat", DoubleType()),  # always NULL (fact_jobs.sql:71-72)
        StructField("location_lon", DoubleType()),
        StructField("remote_type", StringType()),
        StructField("contract_type", StringType()),
        StructField("seniority_level", StringType()),
        StructField("salary_min_norm", DoubleType()),
        StructField("salary_max_norm", DoubleType()),
        StructField("salary_currency_norm", StringType()),
        StructField("skills", ArrayType(StringType())),
        StructField("posted_at", TimestampType()),
        StructField("source", StringType()),
        StructField("apply_url", StringType()),
        StructField("rank_score", DoubleType()),
        StructField("rank_explain", MapType(StringType(), DoubleType())),
        StructField("ingested_at", TimestampType()),
        StructField("last_seen_at", TimestampType()),
    ]
)

DIM_COMPANIES_COLS = [
    "company_id",
    "company",
    "rating",
    "company_size",
    "year_founded",
    "company_type",
    "company_link",
    "compensation_and_benefits_rating",
    "work_life_balance_rating",
    "office_locations",
    "source_first_seen",
    "created_at",
]
