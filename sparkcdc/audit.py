"""audit — quality gates for write-audit-publish (WAP) ingest.

The production CDC pattern the reference's load loop cannot express
(/root/reference/src/main/java/org/embulk/input/jira/JiraInputPlugin.java:106-128
commits every fetched page unconditionally): stage a batch's merge as an
invisible parked commit (``IceboxTable.merge(..., stage=...)``), run audit
checks against the WOULD-BE table state, and only then publish atomically —
a batch that fails its checks never becomes visible to any reader.

Scale design: every data-level check contributes aggregate expressions to
ONE ``agg`` over the staged view — the audit costs a single pass over
O(staged buckets) regardless of how many checks run (at 100 TB the staged
view only reads the buckets the batch touched plus their base files, never
the full table). Metadata-level checks (LSN regression) read the parked
delta only — zero Spark jobs.

A check is a dict::

    {"name": str,
     "aggs": [Column, ...],          # contributed to the single agg pass
     "verdict": fn(row: dict, ctx: dict) -> (ok: bool, detail: str)}

``ctx`` carries ``base_rows`` (live rows of the CURRENT snapshot, from the
manifest — no job) and the staged delta. Compose your own checks freely.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .icebox import IceboxTable

__all__ = [
    "AuditFailedError",
    "check_row_count",
    "check_null_fraction",
    "check_token_invariant",
    "check_token_repetition",
    "check_key_uniqueness",
    "check_lsn_advance",
    "parse_check_specs",
    "build_checks",
    "audit_staged",
    "wap_ingest",
]


class AuditFailedError(ValueError):
    """A staged batch failed its audit checks under ``audit_on_fail:
    abort`` — the batch was aborted (table untouched) and the run stopped.
    Deterministic (non-retryable): the same batch fails the same checks."""

    def __init__(self, batch_id: str, report: dict):
        self.batch_id = batch_id
        self.report = report
        failed = {
            k: v["detail"] for k, v in report["results"].items() if not v["ok"]
        }
        super().__init__(
            f"batch {batch_id!r} failed audit checks {sorted(failed)}: {failed}"
        )


def check_row_count(
    *, min_rows: int = 0, max_growth_frac: float | None = None,
    max_shrink_frac: float | None = None,
) -> dict:
    """Bound the published table's row count: an ingest bug that drops or
    multiplies the corpus is caught before it becomes visible. Fractions
    are relative to the current snapshot's live rows (0.5 = ±50%)."""
    name = "row_count"

    def verdict(row: dict, ctx: dict):
        n, base = row[f"_{name}_total"], ctx["base_rows"]
        if n < min_rows:
            return False, f"{n} rows < min_rows={min_rows}"
        if base > 0 and max_growth_frac is not None and n > base * (1 + max_growth_frac):
            return False, f"{n} rows vs base {base}: growth exceeds {max_growth_frac:.0%}"
        if base > 0 and max_shrink_frac is not None and n < base * (1 - max_shrink_frac):
            return False, f"{n} rows vs base {base}: shrink exceeds {max_shrink_frac:.0%}"
        return True, f"{n} rows (base {base})"

    return {
        "name": name,
        "aggs": [F.count("*").alias(f"_{name}_total")],
        "verdict": verdict,
    }


def check_null_fraction(col: str, max_frac: float) -> dict:
    """Cap the fraction of NULLs in a column of the would-be state."""
    name = f"null_frac_{col}"

    def verdict(row: dict, ctx: dict):
        n, bad = row[f"_{name}_total"], row[f"_{name}_null"]
        frac = (bad / n) if n else 0.0
        ok = frac <= max_frac
        return ok, f"{bad}/{n} null ({frac:.2%}) vs cap {max_frac:.2%}"

    return {
        "name": name,
        "aggs": [
            F.count("*").alias(f"_{name}_total"),
            F.count_if(F.col(col).isNull()).alias(f"_{name}_null"),
        ],
        "verdict": verdict,
    }


def check_token_invariant(tokens_col: str = "tokens", n_tok_col: str = "n_tok") -> dict:
    """The pre-tokenized-sequence invariant (input_hint: per-row
    token-array integrity): every live row has a non-null token array
    whose length equals its ``n_tok``."""
    name = "token_invariant"
    bad = F.col(tokens_col).isNull() | (F.size(F.col(tokens_col)) != F.col(n_tok_col))

    def verdict(row: dict, ctx: dict):
        v = row[f"_{name}_bad"]
        return v == 0, f"{v} rows violate size({tokens_col}) == {n_tok_col}"

    return {"name": name, "aggs": [F.count_if(bad).alias(f"_{name}_bad")], "verdict": verdict}


def check_token_repetition(
    tokens_col: str = "tokens",
    *,
    max_dup_frac: float = 0.9,
    max_bad_frac: float = 0.0,
) -> dict:
    """Degenerate-sequence gate: a row is BAD when its duplicate-token
    fraction ``1 - distinct/len`` exceeds ``max_dup_frac`` (an all-padding
    or stuck-generator sequence); the batch fails when more than
    ``max_bad_frac`` of the would-be state is bad. The per-row metric is
    the token-array form of textops.with_repetition's dup_word_frac —
    pure array expressions folded into the shared single-pass audit agg
    (null/empty arrays are not counted here; pair with token_invariant
    to reject those)."""
    name = "token_repetition"
    t = F.col(tokens_col)
    dup = 1.0 - F.size(F.array_distinct(t)) / F.size(t)
    bad = t.isNotNull() & (F.size(t) > 0) & (dup > max_dup_frac)

    def verdict(row: dict, ctx: dict):
        n, v = row[f"_{name}_total"], row[f"_{name}_bad"]
        frac = (v / n) if n else 0.0
        ok = frac <= max_bad_frac
        return ok, (
            f"{v}/{n} rows ({frac:.2%}) exceed dup-token frac "
            f"{max_dup_frac} vs cap {max_bad_frac:.2%}"
        )

    return {
        "name": name,
        "aggs": [
            F.count("*").alias(f"_{name}_total"),
            F.count_if(bad).alias(f"_{name}_bad"),
        ],
        "verdict": verdict,
    }


def check_key_uniqueness(key: str | None = None) -> dict:
    """Post-LWW the table must hold one live row per key; a duplicate in
    the audit view means the batch carried conflicting rows the merge
    failed to resolve (e.g. a seq-collision bug upstream)."""
    name = "key_unique"

    def verdict(row: dict, ctx: dict):
        n, d = row[f"_{name}_total"], row[f"_{name}_distinct"]
        return n == d, f"{n} rows, {d} distinct keys"

    def build(k: str):
        return {
            "name": name,
            "aggs": [
                F.count("*").alias(f"_{name}_total"),
                F.count_distinct(F.col(k)).alias(f"_{name}_distinct"),
            ],
            "verdict": verdict,
        }

    # key defaults to the table's key at audit time
    return {"name": name, "needs_key": True, "build": build} if key is None else build(key)


def check_lsn_advance() -> dict:
    """Metadata-only (zero Spark jobs): the staged delta's high-water LSN
    must not regress the table's checkpoint — a replayed/misordered feed
    surfaces here before publish."""
    name = "lsn_advance"

    def verdict(row: dict, ctx: dict):
        # the batch's true high-water is the per-bucket maxes (raw event
        # seqs); the delta's global last_applied_lsn is already max-folded
        # with the fence and can never regress by construction
        per = ctx["delta"]["lineage_delta"]["per_bucket"]
        new = max((int(v) for v in per.values()), default=None)
        cur = int(ctx["base_lineage"]["last_applied_lsn"])
        if new is None:
            return True, "empty batch (nothing to advance)"
        return new > cur, f"staged batch high-water lsn {new} vs table checkpoint {cur}"

    return {"name": name, "aggs": [], "verdict": verdict}


def _resolve_checks(checks: list[dict], key: str) -> list[dict]:
    return [c["build"](key) if c.get("needs_key") else c for c in checks]


# config-spec surface: JobConfig.audit_checks names checks as strings
# ("token_invariant", "row_count:min_rows=1,max_shrink_frac=0.5") or dicts
# ({"check": "null_fraction", "col": "source", "max_frac": 0.1}) — parsed
# and arg-validated at config time, built (Column construction needs a
# session) only when the engine stages a batch
_CHECK_FACTORIES = {
    "row_count": check_row_count,
    "null_fraction": check_null_fraction,
    "token_invariant": check_token_invariant,
    "token_repetition": check_token_repetition,
    "key_unique": check_key_uniqueness,
    "lsn_advance": check_lsn_advance,
}


def _coerce_arg(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def parse_check_specs(specs: list) -> list[tuple[str, dict]]:
    """Validate check specs WITHOUT building them (config-time fail-fast:
    unknown check names and bad arguments surface before the run starts).
    Returns (name, kwargs) pairs for :func:`build_checks`."""
    import inspect

    out = []
    for spec in specs:
        if isinstance(spec, dict):
            spec = dict(spec)
            name = spec.pop("check", None)
            kwargs = spec
        else:
            name, _, args = str(spec).partition(":")
            kwargs = {}
            for part in filter(None, args.split(",")):
                k, _, v = part.partition("=")
                kwargs[k.strip()] = _coerce_arg(v.strip())
        if name not in _CHECK_FACTORIES:
            raise ValueError(
                f"unknown audit check {name!r}; available: "
                f"{sorted(_CHECK_FACTORIES)}"
            )
        try:
            inspect.signature(_CHECK_FACTORIES[name]).bind(**kwargs)
        except TypeError as exc:
            raise ValueError(f"audit check {name!r}: {exc}") from exc
        out.append((name, kwargs))
    return out


def build_checks(specs: list) -> list[dict]:
    """Build check dicts from config specs (needs an active session)."""
    return [_CHECK_FACTORIES[name](**kw) for name, kw in parse_check_specs(specs)]


def audit_staged(table: IceboxTable, wap_id: str, checks: list[dict]) -> dict:
    """Run every check against the staged (would-be) table state in ONE
    aggregation pass. Returns ``{"ok", "wap_id", "results": {name:
    {"ok", "detail"}}}`` — pass the report to your publish decision or
    use :func:`wap_ingest` which wires the whole flow."""
    checks = _resolve_checks(checks, table.key)
    info = table.staged().get(wap_id)
    if info is None:
        raise KeyError(f"no staged commit {wap_id!r}")
    aggs = [a for c in checks for a in c["aggs"]]
    row: dict = {}
    if aggs:
        view = table.read_staged(wap_id)
        row = view.agg(*aggs).collect()[0].asDict()
    snap = table.snapshot
    ctx = {
        "base_rows": sum(e["rows"] for e in snap["manifest"]),
        "base_lineage": snap["lineage"],
        "delta": info["delta"],
    }
    results = {}
    ok = True
    for c in checks:
        c_ok, detail = c["verdict"](row, ctx)
        ok &= c_ok
        results[c["name"]] = {"ok": c_ok, "detail": detail}
    return {"ok": ok, "wap_id": wap_id, "results": results}


def wap_ingest(
    table: IceboxTable,
    batch: DataFrame,
    batch_id: str,
    *,
    checks: list[dict],
    wap_id: str | None = None,
    mor: bool | None = None,
    seq_col: str = "seq",
    op_col: str = "op",
    delete_value: str = "delete",
    ts_col: str | None = None,
    fence: bool = True,
    tombstones: bool = False,
    probe_stats: dict | None = None,
) -> dict:
    """Stage → audit → publish-or-abort, exactly-once on ``batch_id``.

    Crash-resumable at every step with the deterministic default wap id
    (derived from the batch id): a retry after a crash
      * post-publish        → ``merge`` stages nothing (batch fenced), done;
      * post-stage, pre-audit → finds the parked delta for THIS batch and
        resumes at the audit (no data rewrite);
      * mid-publish         → ``publish_staged`` is a fenced no-op + cleanup.
    A failed audit aborts the staged commit (data files deleted) and
    returns the report — the table is untouched and the same batch may be
    re-submitted after the upstream fix (the batch_id was never fenced)."""
    if wap_id is None:
        wap_id = "wap-" + re.sub(r"[^A-Za-z0-9._-]", "_", str(batch_id))
    parked = table.staged().get(wap_id)
    if parked is not None and parked["delta"].get("batch_id") == batch_id:
        res: dict = {"batch_id": batch_id, "staged": True, "wap_id": wap_id,
                     "resumed": True}
    else:
        res = table.merge(
            batch, batch_id, stage=wap_id, mor=mor, seq_col=seq_col,
            op_col=op_col, delete_value=delete_value, ts_col=ts_col,
            fence=fence, tombstones=tombstones, probe_stats=probe_stats,
        )
        if res.get("skipped"):
            return res  # batch already published (exactly-once)
    report = audit_staged(table, wap_id, checks)
    if not report["ok"]:
        table.abort_staged(wap_id)
        return {
            "batch_id": batch_id,
            "skipped": True,
            "reason": "audit-failed",
            "audit": report,
        }
    pub = table.publish_staged(wap_id)
    return {**res, **pub, "audit": report}
