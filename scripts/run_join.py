#!/usr/bin/env python
"""`ray job submit` entrypoint for the spatial-join + tiling pipeline.

Examples:
  # synthesize pages, run resumable join, write partitioned output
  python scripts/run_join.py --n-pages 500000 --out /tmp/join_out

  # rerun after a failure: completed partitions are skipped
  python scripts/run_join.py --n-pages 500000 --out /tmp/join_out

  # join pages from an existing parquet table
  python scripts/run_join.py --pages /path/to/pages_parquet \
      --out /tmp/join_out --mode stream

On a real cluster: `ray job submit -- python scripts/run_join.py ...`
(this script owns the Ray session; in the sandbox it starts local mode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="parquet path of the pages table "
                                    "(default: synthesize --n-pages rows)")
    ap.add_argument("--n-pages", type=int, default=100_000)
    ap.add_argument("--n-polygons", type=int, default=100)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["resumable", "stream"],
                    default="resumable")
    ap.add_argument("--shard-rows", type=int, default=100_000)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from s2geometry_d_ray.sources.polygons import make_polygons
    polys = make_polygons(args.n_polygons, seed=args.seed)

    t0 = time.time()
    if args.mode == "resumable":
        from s2geometry_d_ray.pipelines.resumable import run_resumable_join
        written, skipped, manifest = run_resumable_join(
            args.out, args.n_pages, polys, shard_rows=args.shard_rows,
            seed=args.seed)
        print(json.dumps({
            "mode": "resumable", "out": args.out,
            "partitions_written": [r["partition_id"] for r in written],
            "partitions_skipped": skipped,
            "total_rows": manifest["total_rows"],
            "wall_sec": round(time.time() - t0, 2),
        }))
    else:
        import ray.data as rd
        from s2geometry_d_ray.pipelines.spatial_join import spatial_join
        if args.pages:
            pages = rd.read_parquet(args.pages,
                                    columns=["url", "text", "lang"])
        else:
            from s2geometry_d_ray.sources.pages import pages_dataset
            pages = pages_dataset(args.n_pages, seed=args.seed)
        ds = spatial_join(pages, polys)
        ds.write_parquet(args.out)
        print(json.dumps({
            "mode": "stream", "out": args.out,
            "wall_sec": round(time.time() - t0, 2),
        }))
    ray.shutdown()


if __name__ == "__main__":
    main()
