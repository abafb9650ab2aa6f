"""Declarative pipeline plans: stage DAGs compiled to DataFrame lineage."""

from udacity_capstone_data_engineering_spark.plans.pipeline import Pipeline, Stage

__all__ = ["Pipeline", "Stage"]
