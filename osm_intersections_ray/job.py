"""Job entry point for ``ray job submit`` (north rule: runs resumable from
per-partition checkpoints with lineage + metrics on a fixed-size cluster):

    ray job submit -- python -m osm_intersections_ray.job \
        --sf-dir /root/testdata/sf0.01 --out /tmp/osmray_out

Runs the flagship intersections pipeline and the pages->ways tile join,
writing county-partitioned Parquet with per-partition manifests (rerun skips
completed partitions) plus a metrics/lineage report.  Owns its Ray session
only when none exists (the driver contract: ``__ray_entry__`` never inits)."""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/osmray_out")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        from .pipelines.intersections import intersections_pipeline
        from .queries import _pages, _ways
        from .sources.synthetic import ensure_fixtures
        from .stages.pages import pages_way_join
        from .state.checkpoint import write_partitioned
        from .state.metrics import MetricsRun

        m = MetricsRun("osmray-job")
        fx = ensure_fixtures(args.sf_dir)

        with m.stage("intersections", input=fx):
            ds = intersections_pipeline(fx)
            rep1 = write_partitioned(
                ds, os.path.join(args.out, "intersections"), "county")
        m.edge(fx, "intersections_pipeline", f"{args.out}/intersections")

        with m.stage("pages_way_join", input=fx):
            join = pages_way_join(_pages(args.sf_dir), _ways(args.sf_dir))
            join.write_parquet(os.path.join(args.out, "pages_way_join"))
        m.edge(fx, "pages_way_join", f"{args.out}/pages_way_join")

        report = m.write(os.path.join(args.out, "metrics.json"))
        report["intersections"] = rep1
        print(json.dumps({"out": args.out,
                          "partitions": rep1.get("partitions"),
                          "skipped": rep1.get("skipped")}))
        return report
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    main()
