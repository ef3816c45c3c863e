"""Explicit schema registry.

The reference infers every schema with ``pd.read_csv`` (reference
scripts/extract.py:28) which mutates types on round-trips (ints become
floats). We declare schemas up front — inference is banned in this
engine (SURVEY.md §1.2). The five HR input schemas are fixed by the
reference's generator (reference data/raw/import_csv.py:6-102);
the testdata schemas mirror /root/testdata parquet files.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- HR star-schema inputs (reference data/raw/import_csv.py) ---------------

HR_SCHEMAS: dict[str, T.StructType] = {
    "departments": T.StructType(
        [
            T.StructField("department_id", T.LongType(), False),
            T.StructField("department_name", T.StringType(), False),
            T.StructField("location", T.StringType(), False),
            T.StructField("budget", T.DoubleType(), False),
            T.StructField("manager_id", T.LongType(), True),
        ]
    ),
    "employees": T.StructType(
        [
            T.StructField("employee_id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("department_id", T.LongType(), True),
            T.StructField("salary", T.DoubleType(), True),
            T.StructField("hire_date", T.DateType(), True),
            T.StructField("manager_id", T.LongType(), True),
            T.StructField("bonus_eligible", T.StringType(), True),
            T.StructField("status", T.StringType(), True),
        ]
    ),
    "performance_reviews": T.StructType(
        [
            T.StructField("review_id", T.LongType(), False),
            T.StructField("employee_id", T.LongType(), False),
            T.StructField("review_date", T.DateType(), True),
            T.StructField("rating", T.DoubleType(), True),
            T.StructField("reviewer_id", T.LongType(), True),
        ]
    ),
    "projects": T.StructType(
        [
            T.StructField("project_id", T.LongType(), False),
            T.StructField("project_name", T.StringType(), True),
            T.StructField("department_id", T.LongType(), True),
            T.StructField("start_date", T.DateType(), True),
            T.StructField("end_date", T.DateType(), True),
            T.StructField("budget", T.DoubleType(), True),
            T.StructField("status", T.StringType(), True),
        ]
    ),
    "project_assignments": T.StructType(
        [
            T.StructField("assignment_id", T.LongType(), False),
            T.StructField("employee_id", T.LongType(), False),
            T.StructField("project_id", T.LongType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("allocation_percentage", T.DoubleType(), True),
            T.StructField("start_date", T.DateType(), True),
            T.StructField("end_date", T.DateType(), True),
        ]
    ),
}

# Order in which the pipeline expects/loads HR tables.
HR_TABLE_ORDER = [
    "departments",
    "employees",
    "performance_reviews",
    "projects",
    "project_assignments",
]

# --- Driver testdata (TPC-H-ish; /root/testdata/sf*/ parquet) ---------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
