"""Dump the formatted physical plan of every registry query.

Diagnostic for performance rounds: spot un-pushed filters, unexpected
exchanges, or join-strategy regressions across the whole surface at once.

    python tools/explain_all.py [sf_dir] [query ...] > plans.txt
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from bigdata_electricity_spark.plans import REGISTRY  # noqa: E402
from bigdata_electricity_spark.session import get_spark  # noqa: E402

SKIP_PREFIXES = ("streaming_",)  # streaming queries execute on construction


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or list(REGISTRY)
    spark = get_spark("explain_all")
    for name in names:
        if name.startswith(SKIP_PREFIXES):
            print(f"==== {name}: skipped (streaming executes eagerly)")
            continue
        print(f"==== {name}")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                REGISTRY[name].fn(spark, sf_dir).explain("formatted")
            print(buf.getvalue())
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
