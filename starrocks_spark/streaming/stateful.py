"""Custom stateful streaming operator (SURVEY.md §2.12): the analog of
the reference's experimental IVM STREAM_AGG state machines
(gensrc/thrift/PlanNodes.thrift:83-85, be/src/exprs/agg/stream/) —
user-defined per-key state evolved across micro-batches with
``applyInPandasWithState``.

The example operator keeps, per user, a running (event count, value
sum, last event type) — the kind of incrementally-maintained profile
an IVM materialized view would hold. State is keyed per user, so it
shards across executors; the timeout config bounds state lifetime in
production (here: no timeout, the backlog is finite).

Arrow moves batches between JVM and Python (vectorized, not per-row);
the state store is Spark's HDFS-backed store — at scale this is
RocksDB state store config away, no code change.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id long, n_events long, value_f long, last_type string"
)
_STATE_SCHEMA = "n long, vf long, last_ts long, last_id long, lt string"


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Merge this micro-batch's rows for one user into running state.
    `value` arrives pre-fixed-pointed (long); last_type follows the
    maximum (ts, event_id) ordering so replay order can't change it."""
    if state.exists:
        n, vf, last_ts, last_id, lt = state.get
    else:
        n, vf, last_ts, last_id, lt = 0, 0, -1, -1, None
    for pdf in pdfs:
        n += len(pdf)
        vf += int(pdf["value_f"].sum())
        top = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
        if (int(top["ts_us"]), int(top["event_id"])) > (last_ts, last_id):
            last_ts, last_id = int(top["ts_us"]), int(top["event_id"])
            lt = str(top["event_type"])
    state.update((n, vf, last_ts, last_id, lt))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_f": [vf],
            "last_type": [lt],
        }
    )


def stateful_user_profiles(stream_df: DataFrame) -> DataFrame:
    """events stream → per-user incrementally-maintained profile.
    Expects columns: user_id, ts_us, event_id, event_type, value_f."""
    return (
        stream_df.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
