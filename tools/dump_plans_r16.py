#!/usr/bin/env python
"""Dump .explain("formatted") for every declared query to
plans/r16/<query>_<suffix>.txt (suffix = argv[1], default "before").
Optional argv[2:] = substring filters (only matching queries dumped).
Runs at sf0.1 on the tuned session — the same shapes bench.py times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    from timeseries_data_provider_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("plans-r16")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(outdir, exist_ok=True)
    qs = entry.queries()
    non_bench = set(getattr(entry, "NON_BENCH", ()))
    for name in sorted(qs):
        if name in non_bench:
            continue
        if only and not any(o in name for o in only):
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            qs[name](spark, sf).explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
