"""Gap-based sessionization — batch (window exprs) and streaming
(``applyInPandasWithState``) implementations with identical semantics.

A session = a maximal run of one user's events where consecutive gaps are
< ``gap`` (classic 30-min-inactivity sessions).  The reference engine has no
temporal operators (SURVEY.md §2.9); this module exists because the
training-data pipeline does: event-log sessionization is the canonical
custom stateful operator, and its W5-shaped logic (order-dependent cluster
membership) is the temporal twin of the layout kernel's spatial clustering.

Batch tier (``sessionize_batch``): pure column expressions —
``lag`` → gap, ``gap >= threshold`` → session-start flag, running ``sum`` of
flags → session index.  Two logical windows over the same
``(user_id, ts)`` partitioning ⇒ ONE shuffle (guarded in tests/test_plans).
SQL-expressible, so the driver value-checks it against DuckDB.

Streaming tier (``sessionize_stream``): ``applyInPandasWithState`` keyed by
user, state = (current session start, last ts, event count); a session is
EMITTED when the gap closes it (or the state times out).  Timeouts are
**event-time**: each update arms ``last_ts + gap``, so the same watermark
that drops late events also evicts state and closes idle sessions
deterministically — on backfill/replay the final session of every user is
flushed as soon as the watermark passes its gap, independent of wall-clock
processing time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

def _resolve_tz(name: str):
    """Spark accepts any java.time.ZoneId (region ids, 'GMT+8', '+08:00');
    pandas/zoneinfo reject some of them — normalize DRIVER-side to a tzinfo
    object the executor closure can always localize with, instead of
    crashing every micro-batch with UnknownTimeZoneError."""
    import datetime as dt
    import re

    try:
        import zoneinfo

        return zoneinfo.ZoneInfo(name)
    except Exception:  # noqa: BLE001 - fall through to offset parsing
        pass
    m = re.fullmatch(r"(?:GMT|UTC|UT)?\s*([+-])(\d{1,2})(?::?(\d{2}))?",
                     name.strip())
    if m:
        sign = 1 if m.group(1) == "+" else -1
        offset = dt.timedelta(hours=int(m.group(2)),
                              minutes=int(m.group(3) or 0))
        return dt.timezone(sign * offset)
    return dt.timezone.utc  # unparseable id: documented UTC fallback


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), False),
    StructField("session_end", TimestampType(), False),
    StructField("n_events", IntegerType(), False),
])


def sessionize_batch(events: DataFrame, gap_minutes: int = 30,
                     ts_col: str = "ts", user_col: str = "user_id",
                     tiebreak_col: str | None = "event_id") -> DataFrame:
    """(user_id, session_start, session_end, n_events) — one row per session.

    ``tiebreak_col`` makes the window order total when timestamps tie; it is
    used only if present in the input (inputs without it — e.g. the stream
    twin's shape — still sessionize, with ts-only ordering).
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col
                        and tiebreak_col in events.columns else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = gap_minutes * 60 * 1_000_000
    gap_col = F.expr(f"timestampdiff(MICROSECOND, prev_ts, {ts_col})")
    with_sid = (
        events.withColumn("prev_ts", F.lag(ts_col).over(w))
        .withColumn("is_start",
                    F.when(gap_col.isNull() | (gap_col >= gap_us), 1)
                     .otherwise(0))
        .withColumn("session_idx",
                    F.sum("is_start").over(
                        w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (with_sid.groupBy(user_col, "session_idx")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").cast("int").alias("n_events"))
            .drop("session_idx"))


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "1 hour",
                      ts_col: str = "ts", user_col: str = "user_id",
                      ) -> DataFrame:
    """Streaming sessions via per-user state.  Emits each session when a
    later event closes it or the group times out; same output schema and
    semantics as :func:`sessionize_batch` for in-order data."""
    import datetime as dt

    from pyspark.sql import SparkSession
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap = dt.timedelta(minutes=gap_minutes)

    # applyInPandasWithState hands the UDF timestamps rendered NAIVE in the
    # session timezone, while the watermark (and setTimeoutTimestamp) are
    # UTC epoch ms — localize with the tz captured driver-side or a non-UTC
    # cluster arms every timeout offset by the zone difference (sessions
    # flushed early west of UTC, held for hours east of it).
    _sess = SparkSession.getActiveSession()
    session_tz = _resolve_tz((_sess.conf.get("spark.sql.session.timeZone")
                              if _sess else None) or "UTC")

    state_schema = "start timestamp, last timestamp, n int"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user_id], "session_start": [start],
                                "session_end": [last], "n_events": [n]})
            return

        ts_list = []
        for pdf in pdfs:
            ts_list.extend(pdf[ts_col].tolist())
        ts_list.sort()
        cur = state.get if state.exists else None  # (start, last, n)
        out_rows = []
        for t in ts_list:
            if cur is None:
                cur = (t, t, 1)
            elif (t - cur[1]) < gap:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                out_rows.append(cur)
                cur = (t, t, 1)
        state.update(cur)
        # Event-time timeout at last_ts + gap: the watermark both bounds
        # state and closes idle sessions (processing-time timeouts would
        # withhold each user's final session until wall-clock idleness).
        # Naive stamps localize to the session timezone before converting
        # to the watermark's UTC epoch basis (DST fold/gap edges resolve
        # forward — best-effort within the ambiguous hour).  Spark requires
        # the armed timestamp to be beyond the current watermark; clamp for
        # sessions already older than it.
        last = pd.Timestamp(cur[1])
        if last.tzinfo is None:
            last = last.tz_localize(session_tz, ambiguous=True,
                                    nonexistent="shift_forward")
        timeout_ms = int(last.timestamp() * 1000
                         + gap.total_seconds() * 1000)
        state.setTimeoutTimestamp(max(timeout_ms,
                                      state.getCurrentWatermarkMs() + 1))
        if out_rows:
            yield pd.DataFrame({
                "user_id": [user_id] * len(out_rows),
                "session_start": [r[0] for r in out_rows],
                "session_end": [r[1] for r in out_rows],
                "n_events": [r[2] for r in out_rows],
            })

    return (events.withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(fn, SESSION_SCHEMA, state_schema,
                                    "append", GroupStateTimeout.EventTimeTimeout))
