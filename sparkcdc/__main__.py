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


def _parse_aggview_aggs(specs: list[str] | None) -> dict | None:
    """``OUT=KIND[:COL]`` CLI specs → the JobConfig.aggview_aggs mapping;
    malformed specs become readable ConfigErrors via config validation."""
    if not specs:
        return None
    out: dict = {}
    for s in specs:
        name, _, rhs = s.partition("=")
        kind, _, col = rhs.partition(":")
        out[name] = [kind, col or None]
    return out


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
    p.add_argument("--target-bucket-bytes", type=int, default=None,
                   help="auto partition evolution: double n_buckets when the "
                        "average bucket exceeds this many bytes")
    p.add_argument("--rebucket", type=int, default=None, metavar="N",
                   help="maintenance: rebucket the table to N buckets and exit")
    p.add_argument("--expire-every", type=int, default=None, metavar="N",
                   help="engine-driven retention: expire snapshots every N "
                        "applied batches (consumer pins and tags clamp)")
    p.add_argument("--retention-keep-last", type=int, default=10)
    p.add_argument("--fsck", action="store_true",
                   help="integrity audit: metadata fold + manifest-vs-footer "
                        "checks on every retained snapshot (driver-side, no "
                        "Spark job); exit 1 on errors")
    p.add_argument("--rollback", type=int, default=None, metavar="SNAPSHOT",
                   help="restore the table to this retained snapshot as a "
                        "new commit (metadata-only); the next run replays "
                        "the undone WAL range")
    p.add_argument("--compact", action="store_true",
                   help="maintenance: run one compaction cycle and exit")
    p.add_argument("--compact-max-buckets", type=int, default=None,
                   help="bound one compaction cycle to the worst N buckets")
    p.add_argument("--compact-cluster-by", default=None, metavar="COL",
                   help="sort-order compaction: cluster files by COL "
                        "(range-scan file skipping) instead of the key")
    p.add_argument("--compact-max-file-rows", type=int, default=None,
                   help="split compacted buckets into files of at most N "
                        "rows (each covers a contiguous sort range)")
    p.add_argument("--sigindex", default=None, metavar="PATH",
                   help="keep a MinHash signature index at PATH in sync "
                        "with the table (refreshed from the change feed "
                        "after every batch; payload needs a text column)")
    p.add_argument("--sigindex-text-col", default="text")
    p.add_argument("--packed", default=None, metavar="PATH",
                   help="keep a packed training-sequence table at PATH in "
                        "sync with the table (only the shards each batch "
                        "touches are re-packed)")
    p.add_argument("--packed-seq-len", type=int, default=2048)
    p.add_argument("--packed-tokens-col", default="text")
    p.add_argument("--packed-shard-col", default="source")
    p.add_argument("--key", default="doc_id",
                   help="merge key column (vec_id for vector tables)")
    p.add_argument("--vecindex", default=None, metavar="PATH",
                   help="keep an ANN vector index at PATH in sync with the "
                        "table (requires key=vec_id and an array vector "
                        "column; --vecindex-dim needed on first creation)")
    p.add_argument("--vecindex-vec-col", default="embedding")
    p.add_argument("--vecindex-dim", type=int, default=None)
    p.add_argument("--export-training", default=None, metavar="PATH",
                   help="after the replay, export the packed table as an "
                        "epoch-ordered training set at PATH (requires "
                        "--packed)")
    p.add_argument("--export-seed", type=int, default=0)
    p.add_argument("--export-val-frac", type=float, default=None)
    p.add_argument("--audit-check", action="append", default=None,
                   metavar="SPEC", dest="audit_checks",
                   help="write-audit-publish gate (repeatable): stage each "
                        "batch, audit the would-be state, publish only on "
                        "pass. SPEC is a check name with optional args, "
                        "e.g. token_invariant, key_unique, "
                        "row_count:min_rows=1,max_shrink_frac=0.5, "
                        "null_fraction:col=source,max_frac=0.1, "
                        "token_repetition:max_dup_frac=0.9,max_bad_frac=0")
    p.add_argument("--bootstrap", default=None, metavar="PATH",
                   help="parquet dump of the full source state: loaded as the "
                        "first commit (snapshot-then-tail), WAL applied only "
                        "strictly above the watermark LSN")
    p.add_argument("--bootstrap-lsn", type=int, default=None, metavar="LSN",
                   help="the dump's watermark LSN (default: derived from the "
                        "dump's seq-column parquet footers)")
    p.add_argument("--aggview", default=None, metavar="PATH",
                   help="maintain an incremental GROUP BY rollup (AggView) "
                        "at this path, refreshed from the change feed after "
                        "every applied batch")
    p.add_argument("--aggview-group-col", action="append", default=None,
                   metavar="COL", help="rollup group column (repeatable)")
    p.add_argument("--aggview-agg", action="append", default=None,
                   metavar="OUT=KIND[:COL]",
                   help="rollup aggregate spec, e.g. n_docs=count or "
                        "sum_tok=sum:n_tok (repeatable; kinds: count sum "
                        "min max avg)")
    p.add_argument("--dlq", default=None, metavar="PATH",
                   help="dead-letter queue: quarantine malformed WAL events "
                        "(null key/op/seq) to parquet here instead of "
                        "polluting the table or losing them silently")
    p.add_argument("--audit-on-fail", default="abort",
                   choices=["abort", "quarantine"],
                   help="failed-audit policy: abort the run (default) or "
                        "quarantine the batch (report + continue)")
    args = p.parse_args(argv)

    spark = get_spark(app="sparkcdc-cli", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    if (args.rebucket is not None or args.compact or args.rollback is not None
            or args.fsck):
        # maintenance commands operate on an existing table, no log needed
        from .icebox import IceboxTable

        if not IceboxTable.exists(args.table):
            print(json.dumps({"kind": "error",
                              "message": f"no icebox table at {args.table!r}"}),
                  file=sys.stderr)
            return 1
        t = IceboxTable.load(spark, args.table)
        if args.fsck:
            rep = t.fsck(deep=True)
            print(json.dumps({"kind": "fsck", **rep}))
            if not rep["ok"]:
                return 1
        if args.rollback is not None:
            print(json.dumps({"kind": "rollback", **t.rollback(args.rollback)}))
        if args.rebucket is not None:
            print(json.dumps({"kind": "rebucket", **t.rebucket(args.rebucket)}))
        if args.compact:
            print(json.dumps({
                "kind": "compact",
                **t.compact(max_buckets=args.compact_max_buckets,
                            cluster_by=args.compact_cluster_by,
                            max_file_rows=args.compact_max_file_rows),
            }))
        return 0

    log_path = args.log
    if log_path is None:
        log_path = tempfile.mkdtemp(prefix="sparkcdc-log-")
        log = generate_changelog(
            spark, args.events, args.docs, seed=args.seed,
            hot_key_pct=args.hot_key_pct, dup_pct=args.dup_pct,
        )
        write_log_parquet(log, log_path)

    from .config import ConfigError, extract_error_messages

    try:
        cfg = JobConfig(
            log_path=log_path, table_path=args.table,
            batch_size=args.batch_size, n_buckets=args.n_buckets,
            log_format=args.log_format, merge_mode=args.merge_mode,
            compact_every=args.compact_every,
            target_bucket_bytes=args.target_bucket_bytes,
            sigindex_path=args.sigindex,
            sigindex_text_col=args.sigindex_text_col,
            packed_path=args.packed,
            packed_seq_len=args.packed_seq_len,
            packed_tokens_col=args.packed_tokens_col,
            packed_shard_col=args.packed_shard_col,
            key=args.key,
            vecindex_path=args.vecindex,
            vecindex_vec_col=args.vecindex_vec_col,
            vecindex_dim=args.vecindex_dim,
            audit_checks=args.audit_checks,
            audit_on_fail=args.audit_on_fail,
            bootstrap_path=args.bootstrap,
            bootstrap_lsn=args.bootstrap_lsn,
            dlq_path=args.dlq,
            expire_every=args.expire_every,
            retention_keep_last=args.retention_keep_last,
            aggview_path=args.aggview,
            aggview_group_cols=args.aggview_group_col,
            aggview_aggs=_parse_aggview_aggs(args.aggview_agg),
        )
        engine = CDCEngine(spark, cfg)
        if args.preview:
            for row in engine.preview().collect():
                print(json.dumps({k: str(v) for k, v in row.asDict().items()}))
            return 0
        # run() drives batches AND stats-driven maintenance (auto-rebucket,
        # periodic/threshold compaction); records print THROUGH as they are
        # emitted so operators tailing a long replay see live progress
        engine.metrics.on_emit = lambda rec: print(json.dumps(rec), flush=True)
        engine.run()
        totals = engine.metrics.totals()
        print(json.dumps({"kind": "totals", **totals,
                          "table_rows": engine.read_table().count()}))
        if args.export_training:
            if engine.packed is None:
                raise ConfigError("--export-training requires --packed")
            from .packing import export_training_set

            exp = export_training_set(
                engine.packed.chunks(), args.export_training,
                seed=args.export_seed, val_frac=args.export_val_frac,
            )
            print(json.dumps({"kind": "export", **exp}))
    except ConfigError as e:
        # C10: human-readable error surface (client/JiraClient.java:181-194)
        print(json.dumps({"kind": "error",
                          "message": extract_error_messages(str(e))}),
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
