"""Job entrypoint for ``ray job submit`` deployments.

North-rule shape: the whole engine runs as a Ray job —

    ray job submit --working-dir . -- \
        python -m kettleray.run --spec pipeline.json \
        --input /data/events --output /lake/state --var MIN_SEQ=0

Locally (and in tests) the same module runs standalone; it owns the Ray
session ONLY when one is not already initialised (the job driver / test
fixture may own it instead).

The spec is a JSON list of registered operator steps (see
kettleray.pipeline) with ``${VAR}`` substitution from --var. Output
modes: ``--output-mode parquet`` plain partitioned write, or
``--output-mode state`` an exactly-once versioned commit through the
staged sink (manifest + watermark from max commit_seq).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m kettleray.run",
        description="Run a declared kettleray pipeline as a Ray job.")
    p.add_argument("--spec", required=True,
                   help="pipeline spec JSON (list of {op, ...} steps)")
    p.add_argument("--input", required=True,
                   help="input Parquet file/dir (ray.data.read_parquet)")
    p.add_argument("--columns", default=None,
                   help="comma-separated column projection for the read")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--output-mode", choices=("parquet", "state"),
                   default="parquet")
    p.add_argument("--var", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="pipeline ${VAR} substitution (repeatable; "
                        "values parsed as JSON when possible)")
    p.add_argument("--num-partitions", type=int, default=None,
                   help="informational; partitioning lives in the spec")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local-mode CPU count (ignored on a cluster "
                        "where ray.init is already done)")
    p.add_argument("--metrics", action="store_true",
                   help="print per-step StepStatus counters (lines "
                        "read/written, active seconds, rows/s) after "
                        "the run — ≙ Kettle BaseStep/StepStatus")
    return p


def parse_vars(items) -> dict:
    out = {}
    for item in items:
        if "=" not in item:
            raise SystemExit(f"--var expects KEY=VALUE, got {item!r}")
        k, v = item.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import ray
    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    import ray.data
    from kettleray import configure_ray_data
    from kettleray.pipeline import Pipeline
    configure_ray_data()

    cols = args.columns.split(",") if args.columns else None
    ds = ray.data.read_parquet(args.input, columns=cols)
    pipe = Pipeline.from_json(args.spec, variables=parse_vars(args.var))
    metrics = None
    if args.metrics:
        from kettleray.metrics import PipelineMetrics
        metrics = PipelineMetrics("run")
    out = pipe.run(ds, metrics=metrics)

    if args.output_mode == "state":
        from kettleray.io import sink
        try:
            wm = int(out.max("last_commit_seq"))
        except Exception:
            wm = -1
        man = sink.commit_state(out, args.output, watermark=wm)
        print(json.dumps({"version": man.version,
                          "watermark": man.watermark,
                          "rows": man.metrics.get("total_rows")}))
    else:
        out.write_parquet(args.output)
        print(json.dumps({"written": args.output}))
    if metrics is not None:
        for row in metrics.step_status().to_pylist():
            print(json.dumps({"step_status": row}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
