"""CLI: run the engine standalone.

    python -m gocrd_ray extract --input 'shards/*.parquet' --output out/
        [--mode text|full] [--resumable] [--shards-per-unit 8]
    python -m gocrd_ray gen --n-docs 100000 --output pages/ [--seed 42]
    python -m gocrd_ray steps

The CLI owns the Ray session (guarded init — the library itself never
calls ray.init).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_extract(args) -> int:
    _init_ray(args.num_cpus)
    import ray.data

    shards = sorted(glob.glob(args.input))
    if not shards:
        import os

        if os.path.exists(args.input):
            shards = [args.input]
        else:
            print(f"error: no input matches {args.input!r}", file=sys.stderr)
            return 2
    if args.resumable:
        from .pipelines.resumable import run_resumable

        summary = run_resumable(
            shards,
            args.output,
            mode=args.mode,
            shards_per_unit=args.shards_per_unit,
        )
        print(json.dumps(summary))
        return 0
    from .pipelines.extract_pipeline import extract_pages

    ds = ray.data.read_parquet(shards, override_num_blocks=len(shards))
    extract_pages(ds, mode=args.mode).write_parquet(args.output)
    print(json.dumps({"shards": len(shards), "output": args.output}))
    return 0


def cmd_gen(args) -> int:
    _init_ray(args.num_cpus)
    from .sources.pages import synthetic_pages

    blocks = max(8, args.n_docs // 2000)
    synthetic_pages(
        args.n_docs, seed=args.seed, override_num_blocks=blocks
    ).write_parquet(args.output)
    print(json.dumps({"n_docs": args.n_docs, "output": args.output}))
    return 0


def cmd_query(args) -> int:
    _init_ray(args.num_cpus)
    import ray.data

    from .pipelines.queries import QUERIES

    if args.name not in QUERIES:
        print(
            f"error: unknown query {args.name!r}; known: {sorted(QUERIES)}",
            file=sys.stderr,
        )
        return 2
    fn, _sql = QUERIES[args.name]
    res = fn(args.sf_dir)
    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    else:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            res = res.to_pandas()
    if args.output:
        res.to_parquet(args.output, index=False)
        print(json.dumps({"rows": len(res), "output": args.output}))
    else:
        print(res.head(args.limit).to_string())
        print(json.dumps({"rows": len(res)}))
    return 0


def cmd_steps(_args) -> int:
    from .pipelines.steps import registered_steps

    print(json.dumps(registered_steps()))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gocrd_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="run the extraction pipeline")
    ex.add_argument("--input", required=True, help="parquet path or glob")
    ex.add_argument("--output", required=True)
    ex.add_argument("--mode", choices=["text", "full"], default="text")
    ex.add_argument("--resumable", action="store_true")
    ex.add_argument("--shards-per-unit", type=int, default=8)
    ex.add_argument("--num-cpus", type=int, default=None)
    ex.set_defaults(fn=cmd_extract)

    g = sub.add_parser("gen", help="generate a synthetic pages corpus")
    g.add_argument("--n-docs", type=int, required=True)
    g.add_argument("--output", required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--num-cpus", type=int, default=None)
    g.set_defaults(fn=cmd_gen)

    st = sub.add_parser("steps", help="list registered pipeline steps")
    st.set_defaults(fn=cmd_steps)

    qp = sub.add_parser("query", help="run a registered query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--output", default=None, help="write result parquet here")
    qp.add_argument("--limit", type=int, default=10)
    qp.add_argument("--num-cpus", type=int, default=None)
    qp.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
