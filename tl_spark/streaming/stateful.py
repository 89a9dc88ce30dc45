"""Custom stateful streaming operator: per-conversation incremental
progress via ``applyInPandasWithState`` (SURVEY.md §2.F / task brief's
"custom stateful operators" requirement).

State per conv_id survives across micro-batches AND across restarts
(checkpointed), so a resumed stream continues counting where it left
off — the streaming analog of the batch pipeline's bucket ledger.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turns_seen long, max_turn_idx long, distinct_roles long"
)
STATE_SCHEMA = "turns_seen long, max_turn_idx long, roles_csv string"


def _update_conv_progress(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        turns_seen, max_turn_idx, roles_csv = state.get
        roles = set(roles_csv.split(",")) if roles_csv else set()
    else:
        turns_seen, max_turn_idx, roles = 0, -1, set()

    for pdf in pdfs:
        turns_seen += len(pdf)
        if len(pdf):
            max_turn_idx = max(max_turn_idx, int(pdf["turn_idx"].max()))
            roles.update(r for r in pdf["role"].tolist() if r)

    state.update((turns_seen, max_turn_idx, ",".join(sorted(roles))))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "turns_seen": [turns_seen],
            "max_turn_idx": [max_turn_idx],
            "distinct_roles": [len(roles)],
        }
    )


def conversation_progress(
    stream_df: DataFrame, output_mode: str = "append"
) -> DataFrame:
    """Streaming DataFrame -> per-conversation running counters.

    Emits one updated row per touched conversation per micro-batch;
    state is checkpoint-durable. Default ``append`` output mode so the
    result can feed a resumable file sink (memory/console sinks can
    use ``update`` but cannot recover from a checkpoint).
    """
    return (
        stream_df.select("conv_id", "turn_idx", "role")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conv_progress,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            output_mode,
            GroupStateTimeout.NoTimeout,
        )
    )
