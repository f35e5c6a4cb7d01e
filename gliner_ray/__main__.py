"""CLI entry point — the ``ray job submit`` launch path of the north
rule::

    ray job submit --working-dir . -- \
        python -m gliner_ray build-kg --input s3://corpus --out s3://kg

On a cluster the driver inherits the job's Ray session; standalone it
falls back to a local init (guarded — library code never calls
ray.init itself).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="auto", ignore_reinit_error=True)
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gliner_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("build-kg", help="run the flagship KG pipeline")
    kg.add_argument("--input", required=True, help="parquet corpus dir")
    kg.add_argument("--out", required=True, help="output dir (mentions/entities/triples)")
    kg.add_argument("--n-buckets", type=int, default=None)
    kg.add_argument("--no-resume", action="store_true")
    kg.add_argument(
        "--force-distributed-linking", action="store_true",
        help="skip the broadcast fast path even under the size guard",
    )

    ev = sub.add_parser("evaluate", help="distributed span-F1 of predictions vs gold")
    ev.add_argument("--pred", required=True, help="predictions parquet")
    ev.add_argument("--gold", required=True, help="gold mentions parquet")

    args = p.parse_args(argv)
    ray = _ensure_ray()
    try:
        if args.cmd == "build-kg":
            from .config import DEFAULT_CONFIG
            from .pipelines.kg import build_kg

            cfg = DEFAULT_CONFIG
            if args.n_buckets is not None:
                from dataclasses import replace

                cfg = replace(cfg, n_buckets=args.n_buckets)
            summary = build_kg(
                args.input,
                args.out,
                cfg=cfg,
                resume=not args.no_resume,
                force_distributed_linking=args.force_distributed_linking,
            )
            print(json.dumps(summary))
        elif args.cmd == "evaluate":
            import ray.data as rd

            from .pipelines.evaluate import evaluate_mentions

            res = evaluate_mentions(
                rd.read_parquet(args.pred), rd.read_parquet(args.gold)
            )
            print(json.dumps(res))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
