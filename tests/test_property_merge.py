"""Property-based check of the per-bucket merge kernel (hypothesis).

The reference ships no property tests (SURVEY.md §5); the LWW + tombstone
+ late-event semantics are exactly the kind of fold where randomized
inputs catch edge cases example tests miss. This drives the *pure pandas*
kernel (`_merge_bucket_fn`) — no Spark session, so hundreds of examples
run in seconds — against an independent brute-force fold.

Invariant: for every url, the kernel's output row equals the fold
    state = None
    for the batch's LWW winner w (max (warc_ts, seq)):
        if state is None or (w.ts, w.seq) > (state.ts, state.seq):
            state = tombstone(w) if w.op == 'delete' else live(w)
over the current row as the initial state — i.e. sequential CDC apply
equals global LWW with soft deletes.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from clinvar_ingest_spark.operators.merge_cogroup import _merge_bucket_fn

URLS = [f"u{i}" for i in range(4)]
T0 = dt.datetime(2024, 1, 1)

TABLE_COLS = ["url", "warc_ts", "html", "text", "lang", "_seq", "_deleted", "props"]
BATCH_COLS = [
    "seq", "op", "url", "warc_ts", "html", "lang", "schema_ver", "extra", "_bucket",
]

event = st.tuples(
    st.sampled_from(URLS),
    st.integers(min_value=0, max_value=6),  # ts offset (collisions likely)
    st.sampled_from(["insert", "update", "delete"]),
)
cur_row = st.tuples(
    st.sampled_from(URLS),
    st.integers(min_value=0, max_value=6),
    st.booleans(),  # _deleted tombstone?
)


def _ts(off: int) -> dt.datetime:
    return T0 + dt.timedelta(hours=off)


def _mk_batch(events):
    rows = []
    for seq, (url, off, op) in enumerate(events):
        is_del = op == "delete"
        rows.append(
            {
                "seq": seq,
                "op": op,
                "url": url,
                "warc_ts": _ts(off),
                "html": None if is_del else f"<p>{url} v{seq}</p>".encode(),
                "lang": None if is_del else "en",
                "schema_ver": 1,
                "extra": None if is_del else '{"status": 200, "fetch_ms": %d}' % seq,
                "_bucket": 0,
            }
        )
    return pd.DataFrame(rows, columns=BATCH_COLS)


def _mk_current(rows):
    seen = set()
    out = []
    for i, (url, off, deleted) in enumerate(rows):
        if url in seen:
            continue  # one current row per key (table invariant)
        seen.add(url)
        out.append(
            {
                "url": url,
                "warc_ts": _ts(off),
                "html": None if deleted else f"<p>{url} old</p>".encode(),
                "text": None if deleted else f"{url} old",
                "lang": None if deleted else "de",
                "_seq": -100 + i,  # below all batch seqs: ties go to batch
                "_deleted": deleted,
                "props": None if deleted else '{"old":true}',
                "_bucket": 0,
            }
        )
    return pd.DataFrame(out, columns=TABLE_COLS + ["_bucket"])


def _state_key(df: pd.DataFrame) -> dict:
    """url -> (ts, seq, deleted); dict-based (itertuples mangles _cols)."""
    return {
        r["url"]: (r["warc_ts"], int(r["_seq"]), bool(r["_deleted"]))
        for r in df.to_dict("records")
    }


def _oracle(batch: pd.DataFrame, current: pd.DataFrame):
    """Independent fold: expected final (url -> (ts, seq, deleted))."""
    state = _state_key(current)
    if len(batch):
        w = batch.sort_values(["warc_ts", "seq"]).groupby("url").tail(1)
        for r in w.to_dict("records"):
            cur = state.get(r["url"])
            if cur is None or (r["warc_ts"], r["seq"]) > (cur[0], cur[1]):
                state[r["url"]] = (r["warc_ts"], int(r["seq"]), r["op"] == "delete")
    return state


@settings(max_examples=200, deadline=None)
@given(
    st.lists(event, max_size=12),
    st.lists(cur_row, max_size=4),
)
def test_merge_kernel_equals_global_lww_fold(events, current_rows):
    batch = _mk_batch(events)
    current = _mk_current(current_rows)
    fn = _merge_bucket_fn(TABLE_COLS, list(BATCH_COLS))
    out = fn(batch, current)

    want = _oracle(batch, current)
    got = _state_key(out)
    assert got == want

    # live rows must carry payload; tombstones must not
    for r in out.to_dict("records"):
        if r["_deleted"]:
            assert r["html"] is None and r["text"] is None and r["props"] is None
        else:
            assert r["html"] is not None and r["text"] is not None


@settings(max_examples=100, deadline=None)
@given(
    st.lists(event, max_size=12),
    st.lists(cur_row, max_size=4),
)
def test_arrow_and_pandas_kernels_agree(events, current_rows):
    """A/B at property granularity: the applyInArrow and applyInPandas
    merge formulations produce identical states on random inputs."""
    import pyarrow as pa

    from clinvar_ingest_spark.operators.merge_cogroup import _merge_bucket_arrow_fn

    batch = _mk_batch(events)
    current = _mk_current(current_rows)
    pfn = _merge_bucket_fn(TABLE_COLS, list(BATCH_COLS))
    afn = _merge_bucket_arrow_fn(TABLE_COLS, list(BATCH_COLS))

    b_schema = pa.schema(
        [
            ("seq", pa.int64()), ("op", pa.string()), ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")), ("html", pa.binary()),
            ("lang", pa.string()), ("schema_ver", pa.int32()),
            ("extra", pa.string()), ("_bucket", pa.int64()),
        ]
    )
    c_schema = pa.schema(
        [
            ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()), ("text", pa.string()),
            ("lang", pa.string()), ("_seq", pa.int64()),
            ("_deleted", pa.bool_()), ("props", pa.string()),
            ("_bucket", pa.int64()),
        ]
    )
    a_out = afn(
        pa.Table.from_pandas(batch, schema=b_schema, preserve_index=False),
        pa.Table.from_pandas(current, schema=c_schema, preserve_index=False),
    ).to_pandas()
    p_out = pfn(batch, current)
    assert _state_key(a_out) == _state_key(p_out)
    # payload parity too (text/props byte-identical)
    ak = {r["url"]: (r["text"], r["props"]) for r in a_out.to_dict("records")}
    pk = {r["url"]: (r["text"], r["props"]) for r in p_out.to_dict("records")}
    assert ak == pk


@settings(max_examples=100, deadline=None)
@given(st.lists(event, min_size=1, max_size=12), st.integers(1, 4))
def test_batch_split_invariance(events, n_splits):
    """Applying the stream as ONE batch equals applying it as K
    sequential batches (the engine's replay-convergence property, at
    kernel granularity)."""
    batch = _mk_batch(events)
    empty = _mk_current([])
    fn = _merge_bucket_fn(TABLE_COLS, list(BATCH_COLS))

    one = fn(batch, empty)

    state = empty
    bounds = np.array_split(np.arange(len(batch)), n_splits)
    for ix in bounds:
        if len(ix) == 0:
            continue
        state = fn(batch.iloc[ix].reset_index(drop=True), state.drop(columns=["_action"]) if "_action" in state else state)
        state = state.drop(columns=["_action"])
        state["_bucket"] = 0

    assert _state_key(one) == _state_key(state)
