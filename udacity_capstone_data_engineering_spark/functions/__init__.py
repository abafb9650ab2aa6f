"""Scalar/column function library: dates, portable hashing, text, vectors."""

from udacity_capstone_data_engineering_spark.functions.dates import sas_date_to_date, date_parts
from udacity_capstone_data_engineering_spark.functions.hashing import portable_hash64
from udacity_capstone_data_engineering_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "sas_date_to_date",
    "date_parts",
    "portable_hash64",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
