"""Dump `.explain("formatted")` for named queries to plans/r16/.

Usage:
    python tools/explain_dump.py before [sf_dir] [name ...]
    python tools/explain_dump.py after  [sf_dir] [name ...]

With no names, dumps every bench-headline query.  Writes
plans/r16/<name>_<tag>.txt with the FORMATTED plan (pre-execution,
AQE-initial) followed by the executed (AQE-final) plan string, so both
the static shape (PushedFilters/ReadSchema) and the runtime join
strategy/coalescing decisions are on record.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from artis_data_ingest_spark import plans  # noqa: E402
from artis_data_ingest_spark.plans.registry import all_queries  # noqa: E402
from artis_data_ingest_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    reg = all_queries()
    if not names:
        names = [n for n, q in reg.items() if q.bench]
    out_dir = Path(_REPO) / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = reg[name].fn(spark, sf_dir)
            # NOTE (ADVICE r15 #4): dev-only tool, pinned to Spark 4.x
            # internals (PythonSQLUtils / queryExecution) because the
            # public df.explain() only prints; re-check on any Spark
            # upgrade.
            formatted = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            df.collect()  # finalize AQE
            executed = df._jdf.queryExecution().executedPlan().toString()
            executed = executed.split("== Initial Plan ==")[0]
            text = (
                f"== {name} @ {sf_dir} ({tag}) ==\n\n"
                "---- explain(formatted), pre-execution ----\n"
                f"{formatted}\n"
                "---- executed plan (AQE-final) ----\n"
                f"{executed}\n"
            )
        except Exception as exc:  # noqa: BLE001 - record the failure
            text = f"== {name} @ {sf_dir} ({tag}) ==\nERROR: {exc!r}\n"
        (out_dir / f"{name}_{tag}.txt").write_text(text)
        print(f"wrote {name}_{tag}.txt", flush=True)


if __name__ == "__main__":
    main()
