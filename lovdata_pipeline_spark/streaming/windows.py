"""Event-time streaming analytics: watermarked windows, sessionization,
custom stateful operators.

The batch forms live in queries.py (events_hourly / events_sessionize);
these are the true streaming plans — same logical shape, plus watermarks
for state eviction and late-data handling the reference never had
(SURVEY.md §2 declared-absent list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window per event_type with late-data bound.

    The watermark bounds state: windows older than max(event time) −
    watermark are finalized and evicted — at 100 TB/day of events this
    is what keeps the aggregation state finite.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows (gap-based), the streaming form of the
    batch gaps-and-islands sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    watermark_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop repeated keys with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps each key's state only until
    the watermark passes it — the streaming form of exact dedup whose
    batch twin is dedup.exact_dedup. Without the watermark the state
    would grow with every key ever seen.
    """
    return events.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_time: str = "ts",
    right_time: str = "ts",
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    names_out: dict | None = None,
) -> DataFrame:
    """Watermarked stream-stream interval join: each left event joined to
    right events for the same key within ``[left_time - lookback,
    left_time]`` (e.g. purchases to the clicks that preceded them).

    Both sides carry watermarks and the join condition bounds the time
    range in both directions — that pair is what lets Spark evict join
    state (unbounded stream-stream joins would buffer both streams
    forever). The batch twin is operators/asof.asof_join (most-recent
    match only); this keeps ALL matches in the window, the standard
    streaming enrichment shape.

    Column names: this helper renames right's key/time columns to
    ``r_<name>`` itself, and likewise any OTHER right column whose name
    collides with a left column (both sides carrying the engine's
    standard event shape — event_type/value — is the common case; an
    un-renamed collision would make the join output ambiguous and fail
    the first downstream select — r10 review). When the preferred
    ``r_<name>`` is itself taken on EITHER side (e.g. the left frame is
    the output of a previous interval_join and already carries
    ``r_user_id``), the rename falls through to ``r2_<name>``,
    ``r3_<name>``, … — so joins CHAIN instead of raising, and the join
    condition binds with frame-qualified references so a left-side
    ``r_<on>`` can never capture the key comparison (r11 review: the
    string-bound F.col used to bind to the LEFT column, producing a
    silently wrong near-cross join). Because the chosen names are
    schema-dependent, callers that select the renamed columns by name
    should pass ``names_out={}`` — it is filled with the
    ``{right_source_name: output_name}`` mapping actually used —
    rather than assume the ``r_`` spelling (r11 review: a left frame
    coincidentally carrying ``r_<c>`` would otherwise be silently
    selected where the right column was expected).
    """
    l = left.withWatermark(left_time, watermark)

    # Deterministic fresh-name pick: withColumnRenamed does NOT guard
    # against an existing target name (r10 ADVICE), and a fixed r_
    # prefix cannot serve chained joins (r11 review) — walk r_, r2_,
    # r3_, … until the name is free on both sides.
    def _fresh(df: DataFrame, base: str) -> str:
        dst, i = f"r_{base}", 2
        while dst in df.columns or dst in left.columns:
            dst, i = f"r{i}_{base}", i + 1
        return dst

    kcol = _fresh(right, on)
    r = right.withColumnRenamed(on, kcol)
    tcol = _fresh(r, right_time)
    r = r.withColumnRenamed(right_time, tcol)
    if names_out is not None:
        names_out[on] = kcol
        names_out[right_time] = tcol
    # key/time are already renamed away, so every remaining name shared
    # with the left side is a genuine payload collision
    for c in r.columns:
        if c in left.columns and c not in (kcol, tcol):
            dst = _fresh(r, c)
            r = r.withColumnRenamed(c, dst)
            if names_out is not None:
                names_out[c] = dst
    r = r.withWatermark(tcol, watermark)
    # frame-qualified references: immune to same-name columns on the
    # other side by construction
    cond = (
        (l[on] == r[kcol])
        & (r[tcol] <= l[left_time])
        & (r[tcol] >= l[left_time] - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond, "inner")


def _totals_update(timeout_minutes: int):
    """The per-group state-machine for running_user_totals, exposed for
    direct unit testing (the timeout branch can't be driven quickly
    through a live streaming query)."""

    def update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            # inactivity expiry: DROP the state instead of re-arming it —
            # re-updating here would re-register the timeout and keep every
            # key's state (and a phantom re-emit) alive forever.
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return update


def running_user_totals(events: DataFrame, timeout_minutes: int = 60) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running value total + event count, state expiring after inactivity
    (the timeout branch removes the group state — bounded state at any
    key cardinality).

    The shape to copy for bespoke streaming state machines (the
    reference's closest analog is its per-document processing state).

    Operational note: with ProcessingTimeTimeout the query stays alive to
    fire pending timeouts even under Trigger.AvailableNow — drain-and-
    stop callers should stop() explicitly after the data batch commits.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _totals_update(timeout_minutes),
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _token_counts_update(timeout_minutes: int | None):
    """Per-token state machine for streaming_token_counts, exposed for
    direct unit testing (same discipline as _totals_update).
    ``timeout_minutes=None`` disables eviction (NoTimeout mode) — used
    by finite AvailableNow drains, where a ProcessingTimeTimeout would
    keep the query alive to fire timeouts after the data is exhausted."""

    def update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame({"token": [key[0]], "n_occurrences": [n]})

    return update


def streaming_token_counts(
    docs: DataFrame, text_col: str = "text", timeout_minutes: int | None = 60
) -> DataFrame:
    """Streaming vocabulary counter — the heavy-hitters face of the
    batch token aggregates: per token, a running occurrence count over
    a DOCUMENT stream. Tokenization is the scan-local ``_clean_split``
    the batch operators share, so phantom '' tokens never enter the
    state store. Downstream consumers filter ``n_occurrences >= k`` for the
    heavy-hitter set, or join the counts as a streaming stopword/
    boilerplate-vocabulary signal.

    State is one (count) tuple per ACTIVE token; inactivity timeout
    removes cold tokens, so state is bounded by the live vocabulary,
    not the stream's history — the applyInPandasWithState analog of
    the space-saving sketch's eviction. Same ProcessingTimeTimeout
    drain-and-stop note as running_user_totals. Pass
    ``timeout_minutes=None`` for finite AvailableNow drains: NoTimeout
    mode lets the query terminate on its own once the source is
    exhausted (a ProcessingTimeTimeout keeps it alive to fire
    evictions), at the cost of no cold-token eviction — fine for a
    bounded drain, wrong for an unbounded stream.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from lovdata_pipeline_spark.operators.textstats import _clean_split

    tok = docs.select(
        F.explode(_clean_split(F.lower(F.col(text_col)))).alias("token")
    )
    conf = (
        GroupStateTimeout.NoTimeout
        if timeout_minutes is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return tok.groupBy("token").applyInPandasWithState(
        _token_counts_update(timeout_minutes),
        outputStructType="token string, n_occurrences long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=conf,
    )
