"""CLI: ``python -m as_etl_storage_spark job.json`` — run a declarative job
spec end-to-end (the reference's config-driven entry point, SURVEY.md §3).

Exit code 0 on success; validation errors print the SpecError and exit 2.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="as_etl_storage_spark",
        description="Run a JSON job spec: reader -> transforms -> writer.",
    )
    parser.add_argument("job", help="path to job spec JSON (or '-' for stdin)")
    parser.add_argument(
        "--show", type=int, default=0, metavar="N",
        help="no writer: show N rows of the read plan instead",
    )
    parser.add_argument(
        "--explain", action="store_true", help="print the physical plan"
    )
    args = parser.parse_args(argv)

    try:
        raw = sys.stdin.read() if args.job == "-" else open(args.job).read()
    except OSError as exc:
        print(f"cannot read job spec: {exc}", file=sys.stderr)
        return 2
    from as_etl_storage_spark.spec import JobSpec, SpecError

    try:
        spec = JobSpec.from_json(json.loads(raw))
    except (SpecError, json.JSONDecodeError) as exc:
        print(f"invalid job spec: {exc}", file=sys.stderr)
        return 2

    from as_etl_storage_spark.runner import run_job
    from as_etl_storage_spark.session import get_spark

    spark = get_spark("as_etl_storage_spark.cli")
    result = run_job(spark, spec)
    if hasattr(result, "explain"):  # no writer -> DataFrame
        if args.explain:
            result.explain("formatted")
        result.show(args.show or 20, truncate=False)
    elif spec.pipeline is not None:  # pipeline -> per-step reports
        from dataclasses import asdict

        reports = []
        for st, res in zip(spec.pipeline.steps, result.steps):
            if st.materialize is not None:
                r = asdict(res)
                r["step"] = "materialize"
            elif st.maintenance is not None:
                r = asdict(res)
                r["table"] = r.pop("table_path")
                r["step"] = "maintenance"
            else:
                r = {
                    "step": "write",
                    "target": res.target_path,
                    "written": res.written,
                    "rejected": res.rejected,
                    "reject_path": res.reject_path,
                }
            reports.append(r)
        print(json.dumps(reports))
    elif spec.materialize is not None:  # materialize -> refresh report
        from dataclasses import asdict

        print(json.dumps(asdict(result)))
    elif spec.maintenance is not None:  # maintenance -> step report
        from dataclasses import asdict

        report = asdict(result)
        # "table" is the documented report key for the target path
        report["table"] = report.pop("table_path")
        print(json.dumps(report))
    else:
        print(
            json.dumps(
                {
                    "target": result.target_path,
                    "written": result.written,
                    "rejected": result.rejected,
                    "reject_path": result.reject_path,
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
