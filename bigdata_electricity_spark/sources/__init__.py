from .loaders import TESTDATA_TABLES, load_household_raw, load_household_typed, load_table, register_views
from .sinks import save_single_csv

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "register_views",
    "load_household_raw",
    "load_household_typed",
    "save_single_csv",
]
