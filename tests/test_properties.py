"""Property-based tests (hypothesis): LWW replay is a pure function of the
event *set* — invariant under permutation and duplication (north rule:
random event orders/duplications converge to the same final state)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkcdc import oracle

KEYS = [f"D{i}" for i in range(6)]

events = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=0, max_value=50),
    ),
    min_size=0,
    max_size=40,
)


def _to_pdf(evs):
    rows = [
        {
            "seq": i + 1,
            "op": op,
            "doc_id": k,
            "tokens": None if op == "delete" else [tok, tok + 1],
            "n_tok": None if op == "delete" else 2,
            "source": "s",
        }
        for i, (k, op, tok) in enumerate(evs)
    ]
    return pd.DataFrame(rows, columns=["seq", "op", "doc_id", "tokens", "n_tok", "source"])


def _lww_pandas(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive LWW (max seq per key) — the engine's dedup
    semantics, modeled in pandas for fast property iteration."""
    if df.empty:
        return df.drop(columns=["seq", "op"])
    win = df.sort_values("seq").groupby("doc_id", as_index=False).tail(1)
    win = win[win["op"] != "delete"]
    return (
        win.drop(columns=["seq", "op"]).sort_values("doc_id").reset_index(drop=True)
    )


@given(events, st.randoms())
@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_lww_is_permutation_and_duplication_invariant(evs, rng):
    base = _to_pdf(evs)
    shuffled_rows = list(base.itertuples(index=False))
    rng.shuffle(shuffled_rows)
    dup = shuffled_rows + rng.sample(shuffled_rows, k=len(shuffled_rows) // 2 if shuffled_rows else 0)
    messy = pd.DataFrame(dup, columns=base.columns)
    a = _lww_pandas(base)
    b = _lww_pandas(messy)
    ora = oracle.replay(base)
    assert list(a["doc_id"]) == list(ora["doc_id"]) == list(b["doc_id"])
    for x, y in zip(a["tokens"], ora["tokens"]):
        assert (x is None and y is None) or list(x) == list(y)


@given(events)
# deadline=None: the sandbox is a shared box — a noisy-neighbor pause
# can push any single example past hypothesis's 200 ms wall-clock
# deadline and report a flaky 'failure' with a passing example
@settings(max_examples=50, deadline=None)
def test_oracle_replay_matches_lww_model(evs):
    base = _to_pdf(evs)
    ora = oracle.replay(base)
    model = _lww_pandas(base)
    assert list(ora["doc_id"]) == list(model["doc_id"])
    assert list(ora["n_tok"].fillna(-1)) == list(model["n_tok"].fillna(-1))


def test_spark_lww_agrees_with_model_on_random_sample(spark):
    """One Spark round-trip over a hypothesis-style random-ish sample
    (seeded) so the distributed impl is pinned to the model too."""
    import random

    from pyspark.sql import functions as F

    from sparkcdc.dedup import lww_dedup

    rng = random.Random(1234)
    evs = [
        (rng.choice(KEYS), rng.choice(["insert", "update", "delete"]), rng.randint(0, 50))
        for _ in range(300)
    ]
    pdf = _to_pdf(evs)
    sdf = spark.createDataFrame(
        pdf, "seq: long, op: string, doc_id: string, tokens: array<int>, n_tok: int, source: string"
    )
    got = (
        lww_dedup(sdf)
        .where(F.col("op") != "delete")
        .select("doc_id", "tokens", "n_tok", "source")
        .toPandas()
    )
    oracle.assert_table_equal(got, oracle.replay(pdf))
