"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.2 "Stateful ops" row: checkpointed state stores).

``running_totals`` keeps a per-key (count, total) accumulator across
micro-batches — the generalization of the reference's only state (the
PEL, a per-consumer in-flight counter held server-side; here the state
store is checkpointed by Spark and survives restarts).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "key string, batch_rows bigint, total_rows bigint, total_value double"
STATE_SCHEMA = "total_rows bigint, total_value double"


def running_totals(
    df: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Per-key running row-count and value-sum across micro-batches.

    Input: a streaming DataFrame with ``key_col`` and numeric
    ``value_col``.  Output (update semantics): one row per key per batch
    with the batch delta and the running totals.
    """

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        total_rows, total_value = (
            state.get if state.exists else (0, 0.0)
        )
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            total_rows += len(pdf)
            total_value += float(pdf[value_col].astype(float).sum())
        state.update((total_rows, total_value))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "batch_rows": [batch_rows],
                "total_rows": [total_rows],
                "total_value": [round(total_value, 6)],
            }
        )

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


# Known pure-Python protobuf runtimes shipped by other tooling on a
# host: when no protobuf wheel can be installed, any of these makes
# transformWithStateInPandas work (the gcloud SDK bundles a current
# runtime for App Engine tooling).
_PROTOBUF_FALLBACK_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable — in this process AND in
    Spark's Python workers — discovering a pure-Python runtime from
    ``RSS_PROTOBUF_PATH`` or known host locations when no wheel is
    installed.

    Worker processes inherit the JVM's environment, so this must run
    BEFORE the SparkSession starts for the PYTHONPATH export to reach
    them (tests do it in conftest).  The discovered runtime may be one
    minor version older than pyspark's generated StateMessage code;
    protobuf's own documented escape hatch
    (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true``) bridges that
    — the wire format itself is stable across those versions."""
    import os
    import sys

    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    roots = [os.environ.get("RSS_PROTOBUF_PATH"), *_PROTOBUF_FALLBACK_ROOTS]
    for root in filter(None, roots):
        if not os.path.isfile(
            os.path.join(root, "google", "protobuf", "__init__.py")
        ):
            continue
        # APPEND, never prepend: the fallback root may carry other
        # top-level names (the gcloud SDK ships `lib`, `demos`, ...) and
        # must not shadow anything already installed; `google` still
        # resolves because nothing else provides it
        sys.path.append(root)
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            sys.path.remove(root)
            continue
        os.environ["PYTHONPATH"] = (
            os.environ.get("PYTHONPATH", "") + os.pathsep + root
        ).lstrip(os.pathsep)
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        return True
    return False


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf (the state-server
    protocol); absent/broken in some environments — gate, don't crash.

    Pure probe: NO side effects.  It reports whether protobuf is
    importable *right now*; it does not mutate sys.path/PYTHONPATH or
    environment flags.  Callers that want the fallback-root discovery
    must invoke :func:`ensure_protobuf` explicitly (as tests/conftest.py
    does pre-JVM), because that call changes the environment of the
    whole process and future Spark workers (advice, round 7).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_tws(
    df: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Same running-totals semantics on the Spark 4 successor API,
    ``transformWithStateInPandas``: typed per-key ValueState managed by a
    StatefulProcessor (the API that adds state TTL, timers, and multiple
    state variables per key — here just one ValueState so the two
    implementations are directly comparable).

    Requires google.protobuf at runtime (check :func:`tws_available`);
    the applyInPandasWithState implementation above is the portable path.
    """
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf; call "
            "ensure_protobuf() BEFORE SparkSession creation to discover a "
            "pure-Python runtime, or use running_totals() "
            "(applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    value_col_ = value_col

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "total_rows bigint, total_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            total_rows, total_value = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            batch_rows = 0
            for pdf in rows:
                batch_rows += len(pdf)
                total_rows += len(pdf)
                total_value += float(pdf[value_col_].astype(float).sum())
            self._totals.update((total_rows, total_value))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "batch_rows": [batch_rows],
                    "total_rows": [total_rows],
                    "total_value": [round(total_value, 6)],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
