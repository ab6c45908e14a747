from .regression import run_regression_pipeline

__all__ = ["run_regression_pipeline"]
