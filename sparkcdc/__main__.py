"""CLI entry point — the spark-submit surface (north rule:
``spark-submit --py-files sparkcdc.zip -m sparkcdc`` style launch).

    python -m sparkcdc --events 100000 --docs 5000 --table /tmp/tbl
    python -m sparkcdc --log /path/to/wal --table /tmp/tbl --resume

Generates (or tails) a change log, runs the engine, prints one JSON line
of metrics per micro-batch plus a totals line.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile

from .changelog import generate_changelog, write_log_parquet
from .config import JobConfig
from .engine import CDCEngine
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sparkcdc")
    p.add_argument("--log", help="existing change-log dir (else synthesize)")
    p.add_argument("--log-format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--merge-mode", default="cow", choices=["cow", "mor", "auto"])
    p.add_argument("--compact-every", type=int, default=None)
    p.add_argument("--table", required=True)
    p.add_argument("--events", type=int, default=100_000)
    p.add_argument("--docs", type=int, default=5_000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--hot-key-pct", type=int, default=0)
    p.add_argument("--dup-pct", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=50_000)
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--master", default=None)
    p.add_argument("--preview", action="store_true", help="show next 10 events, commit nothing")
    args = p.parse_args(argv)

    spark = get_spark(app="sparkcdc-cli", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    log_path = args.log
    if log_path is None:
        log_path = tempfile.mkdtemp(prefix="sparkcdc-log-")
        log = generate_changelog(
            spark, args.events, args.docs, seed=args.seed,
            hot_key_pct=args.hot_key_pct, dup_pct=args.dup_pct,
        )
        write_log_parquet(log, log_path)

    cfg = JobConfig(
        log_path=log_path, table_path=args.table,
        batch_size=args.batch_size, n_buckets=args.n_buckets,
        log_format=args.log_format, merge_mode=args.merge_mode,
        compact_every=args.compact_every,
    )
    from .config import ConfigError, extract_error_messages

    try:
        engine = CDCEngine(spark, cfg)
        if args.preview:
            for row in engine.preview().collect():
                print(json.dumps({k: str(v) for k, v in row.asDict().items()}))
            return 0
        for lo, hi in engine.plan_batches():
            print(json.dumps(engine.apply_batch(lo, hi)))
        totals = engine.metrics.totals()
        print(json.dumps({"kind": "totals", **totals,
                          "table_rows": engine.read_table().count()}))
    except ConfigError as e:
        # C10: human-readable error surface (client/JiraClient.java:181-194)
        print(json.dumps({"kind": "error",
                          "message": extract_error_messages(str(e))}),
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
