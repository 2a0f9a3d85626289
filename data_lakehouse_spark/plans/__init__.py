from data_lakehouse_spark.plans.incremental import IncrementalMaterializer

__all__ = ["IncrementalMaterializer"]
