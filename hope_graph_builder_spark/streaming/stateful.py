"""Custom stateful streaming operator via applyInPandasWithState:
first-seen streaming dedup per key (the streaming twin of exact dedup —
emits a row only the first time a fingerprint appears, keeping seen
fingerprints in state).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "fp string, first_id long, n_new long"
STATE_SCHEMA = "seen long"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = state.get[0] if state.exists else 0
    first_id = None
    n_new = 0
    for pdf in pdfs:
        if seen == 0 and len(pdf):
            first_id = int(pdf["doc_id"].min()) if first_id is None else min(
                first_id, int(pdf["doc_id"].min())
            )
        n_new += len(pdf)
    if seen == 0 and first_id is not None:
        state.update((1,))
        yield pd.DataFrame({"fp": [key[0]], "first_id": [first_id], "n_new": [n_new]})
    else:
        state.update((1,))
        return


def streaming_first_seen(dedup_keys: DataFrame) -> DataFrame:
    """input: streaming DF with (fp string, doc_id long); output: one
    row per fingerprint the first time it is seen."""
    return dedup_keys.groupBy("fp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
