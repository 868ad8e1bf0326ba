"""Cluster job entrypoint — what `ray job submit` runs on a real
multi-node cluster (north-rule launch shape):

    ray job submit --working-dir . -- python tools/ray_job.py \
        --pages s3://bucket/pages --out s3://bucket/kg --shards 256

On a cluster this script connects to the existing Ray session
(RAY_ADDRESS is injected by the job server); in the sandbox it falls
back to a local session.  Everything else — sharded resumable
execution, broadcast dictionaries, lineage — is identical: run_flagship
has no single-node assumptions (paths go through pyarrow filesystems,
broadcast uses the object store, shards commit independently).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root on path regardless of invocation style (`ray job submit
# --working-dir .` sets cwd to the snapshot; direct runs may not)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--shards", type=int, default=64)
    p.add_argument("--shard-parallelism", type=int, default=4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--scale", type=int, default=1)
    args = p.parse_args()

    import ray

    if os.environ.get("RAY_ADDRESS", "local") not in ("", "local"):
        ray.init()  # join the cluster the job server placed us in
    else:
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cpg_ray.pagegen import cfg_for_variant, cfg_from_manifest
    from cpg_ray.pipelines.flagship import run_flagship

    cfg = cfg_from_manifest(args.pages) or cfg_for_variant(
        "mixed", scale=args.scale
    )
    t0 = time.monotonic()
    summary = run_flagship(
        args.pages, args.out, cfg, n_shards=args.shards,
        resume=args.resume, shard_parallelism=args.shard_parallelism,
        extract_concurrency=(1, int(ray.cluster_resources().get("CPU", 8)) - 2),
    )
    summary["wall_sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
