"""Single-threaded pandas replay oracle (test-only).

The analog of the reference's golden-expected fixture files
(src/test/resources/issue_flatten_expected.json etc.) — but generated, not
hand-written: apply the full change log strictly in ``seq`` order, one event
at a time, to an in-memory dict. The engine's distributed, batched,
order-insensitive replay must converge to a byte-identical final state
(per-row token-array equality, BASELINE.json input_hint).
"""

from __future__ import annotations

import pandas as pd


def replay(events: pd.DataFrame, key: str = "doc_id", value_cols: list[str] | None = None) -> pd.DataFrame:
    """Apply events in (seq, then stable) order; return final table state
    sorted by key with columns (doc_id, tokens, n_tok, source)."""
    state: dict[str, dict] = {}
    if value_cols is None:
        value_cols = [c for c in ("tokens", "n_tok", "source", "lang") if c in events.columns]
    cols = [key] + value_cols
    ev = events.sort_values("seq", kind="stable")
    for row in ev.itertuples(index=False):
        d = row._asdict()
        k = d[key]
        if d["op"] == "delete":
            state.pop(k, None)
        else:
            state[k] = {c: d[c] for c in cols}
    out = pd.DataFrame(sorted(state.values(), key=lambda r: r[key]), columns=cols)
    return out.reset_index(drop=True)


def assert_table_equal(actual: pd.DataFrame, expected: pd.DataFrame, key: str = "doc_id") -> None:
    """Byte-identical comparison incl. per-row token-array equality."""
    a = actual.sort_values(key).reset_index(drop=True)
    e = expected.sort_values(key).reset_index(drop=True)
    assert list(a[key]) == list(e[key]), (
        f"key sets differ: {len(a)} vs {len(e)}; "
        f"extra={set(a[key]) - set(e[key])} missing={set(e[key]) - set(a[key])}"
    )
    for col in e.columns:
        if col == "tokens":
            for i, (x, y) in enumerate(zip(a[col], e[col])):
                lx = list(x) if x is not None else None
                ly = list(y) if y is not None else None
                assert lx == ly, f"tokens mismatch at row {i} key={a[key][i]}: {lx} != {ly}"
        else:
            ax, ex = list(a[col]), list(e[col])
            assert ax == ex, f"column {col} mismatch: first diff at " + str(
                next((i, ax[i], ex[i]) for i in range(len(ax)) if ax[i] != ex[i])
            )
