"""Dump `.explain("formatted")` for named catalog queries to files —
the before/after plan evidence the optimization rounds commit under
plans/r15/ (the judge checks plan claims against these files).

    python tools/explain_dump.py --out plans/r15 --suffix _before cp1_curated_corpus ...
    python tools/explain_dump.py --out plans/r15 --suffix _before --all-headline

Explains run at the bench scale factor (sf0.1) so join-strategy
choices match the benched plans. Eager queries (CC collects at
construction) pay their construction cost here — that is the price of
an honest plan, not a measurement.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r15")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--all-headline", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from ig_etl_with_user_reports_2024_spark.session import get_spark

    names = list(args.names)
    if args.all_headline:
        import bench

        names += [n for n in bench.HEADLINE if n not in names]

    spark = get_spark("explain_dump")
    qs = entry_mod.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        df = qs[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
