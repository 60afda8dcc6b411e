"""Keyed time-window operators: tumbling, hopping (sliding), session.

The reference has no streaming/window operators (SURVEY.md §1.2 —
strictly batch); these are engine additions for the training-data /
event-analytics surface, built on the same physical shape as every
other high-cardinality aggregate here: per-block pre-aggregation
(combiner) → one hash-bucket exchange keyed on a small-int column →
one vectorized pandas pass per bucket (`bucketed_group_map`).

Window identity is integer arithmetic on the epoch-µs timestamp, so
assignment is a vectorized column op — no per-row Python. A hopping
window of size S and hop H (S divisible by H) assigns each event to
S/H windows; the explode is a pandas concat of S/H shifted copies of
the *pre-aggregated* block, not of the raw events.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from ..store.dataset import bucketed_group_map


def tumbling_window_agg(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    size_us: int,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per (key, window) count/min/max with non-overlapping windows of
    ``size_us`` µs. ``win`` = window start in units of ``size_us``."""
    return hopping_window_agg(
        ds, key_col, ts_col, value_col, size_us=size_us, hop_us=size_us,
        num_buckets=num_buckets,
    )


def hopping_window_agg(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    size_us: int,
    hop_us: int,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Hopping (sliding) window aggregate: windows of ``size_us`` µs
    starting every ``hop_us`` µs (``size_us`` divisible by ``hop_us``).
    Emits one row per (key, win) with ``n_events`` / ``min_value`` /
    ``max_value``, where ``win`` is the window START in hop units —
    the window covers ``[win*hop_us, win*hop_us + size_us)``.

    Scale shape: the per-block combiner first collapses events to one
    row per (key, hop-cell), THEN replicates that small table S/H
    times with shifted window ids — so the exchange carries
    O(keys × cells × S/H) pre-aggregated rows, never raw events."""
    if size_us % hop_us != 0:
        raise ValueError("size_us must be a multiple of hop_us")
    n_shifts = size_us // hop_us

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key_col, ts_col, value_col]].copy()
        ts = df[ts_col]
        # normalize to epoch µs regardless of the column's native
        # resolution (parquet timestamps load as datetime64[us],
        # in-memory frames often carry datetime64[ns])
        if pd.api.types.is_datetime64_any_dtype(ts):
            ts = ts.astype("datetime64[us]").astype("int64")
        else:
            ts = ts.astype("int64")
        df["__cell"] = (ts // hop_us).astype("int64")
        g = df.groupby([key_col, "__cell"], sort=False)[value_col]
        cells = g.agg(n="count", mn="min", mx="max").reset_index()
        # a window starting at cell w contains cells w .. w+n_shifts-1,
        # so cell c contributes to windows c, c-1, ..., c-(n_shifts-1)
        parts = []
        for i in range(n_shifts):
            p = cells.copy()
            p["win"] = p["__cell"] - i
            parts.append(p.drop(columns=["__cell"]))
        return pd.concat(parts, ignore_index=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key_col, "win"], sort=False)
        out = g.agg(
            n_events=("n", "sum"), min_value=("mn", "min"), max_value=("mx", "max")
        ).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        out["win"] = out["win"].astype("int64")
        return out

    return bucketed_group_map(
        ds, [key_col], final, num_buckets=num_buckets, partial_fn=partial
    )


def lag_over(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    periods: int = 1,
    out_col: str = "prev_value",
) -> ray.data.Dataset:
    """SQL ``LAG(value, periods) OVER (PARTITION BY keys ORDER BY
    order_cols)`` (``periods < 0`` = LEAD): one key-bucketed exchange
    co-locates each partition, then one vectorized sort + groupby-shift
    per bucket — the ordered-window primitive behind
    previous-value/delta features. ``order_cols`` must totally order
    each partition (include a unique tiebreaker) or the shift is
    nondeterministic. The first ``periods`` rows of each partition get
    a null ``out_col``."""
    cols = list(dict.fromkeys(key_cols + order_cols + [value_col]))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(key_cols + order_cols, kind="stable")
        df[out_col] = df.groupby(key_cols, sort=False)[value_col].shift(
            periods
        )
        return df

    return bucketed_group_map(ds.select_columns(cols), key_cols, per_bucket)


def cumsum_over(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_total",
) -> ray.data.Dataset:
    """SQL ``SUM(value) OVER (PARTITION BY keys ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING)`` — the running total. Same physical
    shape as :func:`lag_over`: one key-bucketed exchange co-locates
    each partition, then one vectorized sort + groupby-cumsum per
    bucket. ``order_cols`` must totally order each partition (include
    a unique tiebreaker) or the prefix sums are nondeterministic.
    Partitioning assumption (same as every ordered-window primitive
    here): one PARTITION's rows fit a worker — the per-key exchange
    bounds a bucket at its keys' row counts, not the corpus."""
    cols = list(dict.fromkeys(key_cols + order_cols + [value_col]))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(key_cols + order_cols, kind="stable")
        df[out_col] = df.groupby(key_cols, sort=False)[value_col].cumsum()
        return df

    return bucketed_group_map(ds.select_columns(cols), key_cols, per_bucket)


def mode_over(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group MODE: the most frequent value per key with a
    deterministic tie-break (count DESC, value ASC — mirrored in the
    SQL oracle). Classic combiner shape: per-block (key, value) counts
    shrink every block to its distinct pairs before ONE key-bucketed
    exchange; the per-bucket reduce merges counts and takes the
    per-key argmax vectorized (sort + group-head, no per-group
    Python). Returns (keys..., mode, mode_count)."""
    cols = list(dict.fromkeys(key_cols + [value_col]))
    gcols = key_cols + [value_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(columns=gcols + ["c"])
        return df.groupby(gcols, sort=False).size().rename("c").reset_index()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(columns=key_cols + ["mode", "mode_count"])
        merged = df.groupby(gcols, sort=False)["c"].sum().reset_index()
        merged = merged.sort_values(
            key_cols + ["c", value_col],
            ascending=[True] * len(key_cols) + [False, True],
            kind="stable",
        )
        head = merged.groupby(key_cols, sort=False).head(1)
        out = head.rename(columns={value_col: "mode", "c": "mode_count"})
        out["mode_count"] = out["mode_count"].astype("int64")
        return out[key_cols + ["mode", "mode_count"]]

    return bucketed_group_map(
        ds.select_columns(cols),
        key_cols,
        per_bucket,
        num_buckets=num_buckets,
        partial_fn=partial,
    )


def ohlc_downsample(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    value_col: str,
    size_us: int,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Time-series OHLC downsampling: per (key, tumbling window) the
    opening value (first by ``order_cols``), high, low, closing value
    (last), and row count — the telemetry/metrics resampler. Values
    are SELECTED stored doubles (first/last/min/max, never sums), so
    the op is exact against SQL with no float-summation drift —
    ``order_cols`` must totally order rows within a (key, window)
    (include a unique tiebreaker). ONE key-bucketed exchange; the
    per-bucket kernel is a single sort + groupby first/max/min/last."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # normalize to epoch-µs whatever the pandas datetime unit
        # (Arrow timestamp[us] arrives as datetime64[us]; hand-built
        # frames are often datetime64[ns])
        ts_us = (
            df[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        )
        df["win"] = ts_us // size_us
        df = df.sort_values([key_col, "win"] + order_cols, kind="stable")
        g = df.groupby([key_col, "win"], sort=False)[value_col]
        out = g.agg(
            open="first", high="max", low="min", close="last", n="size"
        ).reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    cols = list(dict.fromkeys([key_col, ts_col] + order_cols + [value_col]))
    return bucketed_group_map(
        ds.select_columns(cols), [key_col], per_bucket, num_buckets=num_buckets
    )


def funnel_counts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Ordered-sequence funnel (the MATCH_RECOGNIZE-lite every event
    warehouse needs and Ray Data lacks): per key, how many keys reach
    step i of ``steps`` under EARLIEST-COMPLETION semantics — step 1's
    time is the key's min ts of steps[0]; step i's time is the min ts
    of steps[i] STRICTLY AFTER step i−1's time. Deterministic,
    order-insensitive, and exactly expressible as chained min-
    aggregate SQL (the oracle).

    Physical plan: ONE key-bucketed exchange co-locates each key's
    events (only rows whose type is in ``steps`` survive the pre-
    filter), the per-bucket kernel runs the chained groupby-min /
    merge / filter sequence vectorized over ALL keys at once, and the
    tiny per-bucket (step, users) partials reduce in a second
    len(steps)-row exchange."""
    if not steps:
        raise ValueError("steps must be non-empty")

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[type_col].isin(steps)][[key_col, ts_col, type_col]]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cur = None  # Series indexed by key: completion time so far
        users = []
        for step in steps:
            ev = df[df[type_col] == step]
            if cur is not None:
                prev = cur.rename("__t_prev").reset_index()
                ev = ev.merge(prev, on=key_col)
                ev = ev[ev[ts_col] > ev["__t_prev"]]
            cur = ev.groupby(key_col, sort=False)[ts_col].min()
            users.append(len(cur))
        return pd.DataFrame(
            {
                "step": pd.Series(range(1, len(steps) + 1), dtype="int64"),
                "event_type": steps,
                "users": pd.Series(users, dtype="int64"),
            }
        )

    partials = bucketed_group_map(
        ds.map_batches(prefilter, batch_format="pandas"),
        [key_col],
        per_bucket,
        num_buckets=num_buckets,
    )

    def sum_final(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["step", "event_type"], sort=False)["users"]
            .sum()
            .reset_index()
        )
        out["users"] = out["users"].astype("int64")
        return out

    return bucketed_group_map(partials, ["step"], sum_final, num_buckets=4)


def frame_sum_over(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    preceding: int,
    out_col: str = "frame_sum",
) -> ray.data.Dataset:
    """SQL ``SUM(value) OVER (PARTITION BY keys ORDER BY order_cols
    ROWS BETWEEN preceding PRECEDING AND CURRENT ROW)`` — the bounded
    moving-frame sum. Same physical shape as :func:`cumsum_over` (one
    key-bucketed exchange + one vectorized pass per bucket); the frame
    sum is computed as the difference of two integer prefix sums
    (``cs[i] - cs[i - w]``) so int64 inputs stay exact — pandas'
    ``rolling`` would round-trip through float64. ``order_cols`` must
    totally order each partition (include a unique tiebreaker)."""
    if preceding < 0:
        raise ValueError("preceding must be >= 0")
    cols = list(dict.fromkeys(key_cols + order_cols + [value_col]))
    w = preceding + 1

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(key_cols + order_cols, kind="stable")
        g = df.groupby(key_cols, sort=False)
        cs = g[value_col].cumsum()
        lagged = (
            cs.groupby(g.ngroup(), sort=False).shift(w).fillna(0).astype("int64")
        )
        df[out_col] = cs - lagged
        return df

    return bucketed_group_map(ds.select_columns(cols), key_cols, per_bucket)


def ntile_over(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    n: int,
    ascending: "list[bool] | None" = None,
    out_col: str = "tile",
) -> ray.data.Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY keys ORDER BY order_cols)`` —
    each partition's rows split into ``n`` buckets 1..n whose sizes
    differ by at most one, the first ``N mod n`` buckets taking the
    extra row (the standard SQL assignment, bit-matching DuckDB).
    One key-bucketed exchange, then per bucket a vectorized sort +
    closed-form tile index from the row number and partition size —
    no per-row Python. ``order_cols`` must totally order each
    partition or the tile of tied rows is nondeterministic;
    ``ascending`` gives the per-order-col direction (default all
    ascending)."""
    import numpy as np

    if n < 1:
        raise ValueError("n must be >= 1")
    asc = [True] * len(order_cols) if ascending is None else list(ascending)
    if len(asc) != len(order_cols):
        raise ValueError("ascending must match order_cols")
    cols = list(dict.fromkeys(key_cols + order_cols))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            key_cols + order_cols,
            ascending=[True] * len(key_cols) + asc,
            kind="stable",
        )
        g = df.groupby(key_cols, sort=False)
        r = g.cumcount().to_numpy()
        size = g[order_cols[0]].transform("size").to_numpy()
        q, rem = size // n, size % n
        big = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
        in_big = r < big
        tile = np.where(
            in_big,
            r // np.maximum(q + 1, 1),
            rem + (r - big) // np.maximum(q, 1),
        )
        df[out_col] = (tile + 1).astype("int64")
        return df

    return bucketed_group_map(ds.select_columns(cols), key_cols, per_bucket)


def dist_rank_over(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    ascending: bool = True,
    extra_cols: "list[str] | None" = None,
) -> ray.data.Dataset:
    """SQL ``PERCENT_RANK()`` and ``CUME_DIST() OVER (PARTITION BY keys
    ORDER BY value [DESC])`` in one pass — the two relative-position
    windows. percent_rank = (rank_min − 1) / (N − 1) (0.0 for a
    single-row partition, the SQL rule); cume_dist = rank_max / N
    (rows ordered ≤ current, ties share the value). Tie semantics are
    value-determined, so no tiebreaker column is needed. Each output
    is ONE int64→float64 division, which IEEE rounds identically here
    and in the SQL engine — the floats bit-match the DuckDB twin (the
    same discipline as the exact AVG aggregate). Physical shape: one
    key-bucketed exchange + one vectorized groupby-rank per bucket."""
    import numpy as np

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        g = df.groupby(key_cols, sort=False)[value_col]
        rmin = g.rank(method="min", ascending=ascending).to_numpy()
        rmax = g.rank(method="max", ascending=ascending).to_numpy()
        size = g.transform("size").to_numpy().astype("float64")
        df["percent_rank"] = np.where(size > 1, (rmin - 1.0) / (size - 1.0), 0.0)
        df["cume_dist"] = rmax / size
        return df

    return bucketed_group_map(
        ds.select_columns(
            list(dict.fromkeys(key_cols + [value_col] + (extra_cols or [])))
        ),
        key_cols,
        per_bucket,
    )


def rank_over(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    ascending: bool = True,
    dense: bool = False,
    out_col: str = "rnk",
    extra_cols: "list[str] | None" = None,
) -> ray.data.Dataset:
    """SQL ``RANK()`` / ``DENSE_RANK() OVER (PARTITION BY keys ORDER BY
    value [DESC])`` — equal values share a rank, plain RANK leaves gaps
    after ties, DENSE_RANK does not. Same physical shape as
    :func:`lag_over`: one key-bucketed exchange, one vectorized
    groupby-rank per bucket. Tie semantics are value-determined, so —
    unlike LAG — no tiebreaker column is needed for determinism.
    ``extra_cols`` ride along unmodified (row identity etc.)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out_col] = (
            df.groupby(key_cols, sort=False)[value_col]
            .rank(method="dense" if dense else "min", ascending=ascending)
            .astype("int64")
        )
        return df

    return bucketed_group_map(
        ds.select_columns(
            list(dict.fromkeys(key_cols + [value_col] + (extra_cols or [])))
        ),
        key_cols,
        per_bucket,
    )


def retention_cohorts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    period_us: int = 7 * 86_400_000_000,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Cohort retention: users grouped by their FIRST-activity period
    (the cohort), counted per (cohort, offset) where offset = activity
    period − cohort period → ``(cohort, offset, n_users)``. offset 0 is
    the cohort size; n_users at offset k = distinct users of that
    cohort active k periods later — the classic retention triangle.

    Scale shape: a per-batch distinct-(user, period) combiner (epoch-µs
    integer division, one vectorized pass), ONE user-keyed exchange
    that computes each user's cohort AND its distinct offsets in the
    same reduce (first-touch min + dedup, no join back), emitting
    (cohort, offset) rows pre-counted per bucket, then one tiny
    (cohort, offset)-keyed count-sum exchange. A power user's thousand
    events collapse to ≤ one row per (user, period) at the combiner."""
    import numpy as np

    from ..store.dataset import bucketed_group_map

    def to_periods(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col]
        # normalize to epoch µs regardless of the column's native
        # resolution (same convention as hopping_window_agg)
        if pd.api.types.is_datetime64_any_dtype(ts):
            us = ts.astype("datetime64[us]").astype("int64")
        else:
            us = ts.astype("int64")
        out = pd.DataFrame(
            {key_col: df[key_col], "period": (us // period_us).astype("int64")}
        )
        return out.drop_duplicates()

    periods = ds.select_columns([key_col, ts_col]).map_batches(
        to_periods, batch_format="pandas"
    )

    def per_user_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()  # global per-user distinct (co-located)
        cohort = d.groupby(key_col, sort=False)["period"].transform("min")
        out = pd.DataFrame(
            {
                "cohort": cohort.astype("int64"),
                "offset": (d["period"] - cohort).astype("int64"),
                "n_users": 1,
            }
        )
        # pre-count per (cohort, offset) inside the bucket
        return out.groupby(["cohort", "offset"], sort=False, as_index=False)[
            "n_users"
        ].sum()

    partials = bucketed_group_map(
        periods, [key_col], per_user_bucket, num_buckets=num_buckets
    )

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort", "offset"], sort=False, as_index=False)[
            "n_users"
        ].sum()
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return bucketed_group_map(
        partials, ["cohort", "offset"], final_sum, num_buckets=num_buckets
    )


def mad_outliers(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    k: int = 3,
    extra_cols: "list[str] | None" = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Robust per-group outliers by median absolute deviation: keep
    rows with |value − median| > k·MAD, where median and MAD are both
    DISCRETE quantiles (sorted position ceil(n/2)−1 — SQL
    ``quantile_disc`` semantics, always a stored value). Unlike the
    mean±σ rule, one huge outlier cannot mask the others. Every
    arithmetic step (double subtract/abs, integer-k multiply, compare)
    is performed identically by the SQL twin, so the float op stays
    under the exact gate.

    Physical plan: ONE key-bucketed exchange (quantiles don't
    pre-aggregate), then a fully vectorized per-bucket pass — two
    sorts + positional takes, no per-group Python. Partitioning
    assumption: one group's rows fit a worker (same as every
    quantile/window primitive here)."""
    import numpy as np

    cols = list(dict.fromkeys(key_cols + [value_col] + (extra_cols or [])))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values([*key_cols, value_col], kind="stable")
        sizes = df.groupby(key_cols, sort=False).size().to_numpy()
        starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        vals = df[value_col].to_numpy()
        med_idx = starts + np.maximum(0, np.ceil(0.5 * sizes).astype("int64") - 1)
        med = np.repeat(vals[med_idx], sizes)
        dev = np.abs(vals - med)
        df = df.assign(__dev=dev)
        df = df.sort_values([*key_cols, "__dev"], kind="stable")
        # group layout is unchanged by the re-sort (same keys)
        dev_sorted = df["__dev"].to_numpy()
        mad = np.repeat(dev_sorted[med_idx], sizes)
        keep = df["__dev"].to_numpy() > k * mad
        return df.loc[keep, cols]

    return bucketed_group_map(
        ds.select_columns(cols), key_cols, per_bucket, num_buckets=num_buckets
    )


def merge_intervals(
    ds: ray.data.Dataset,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Merge overlapping/touching intervals per key into disjoint
    coverage islands → ``(keys..., island_start, island_end,
    n_merged)`` — the gaps-and-islands staple (session coverage,
    on-call spans, downtime windows). Intervals [s, e] with the next
    start ≤ the running max end join the same island; half-open
    callers should pre-decrement ends. One key-bucketed exchange,
    per-bucket vectorized sort + running-max island assignment
    (cummax + cumsum, no per-row Python) — bit-matches the SQL
    window-function twin."""
    import numpy as np

    cols = list(dict.fromkeys(key_cols + [start_col, end_col]))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                columns=key_cols + ["island_start", "island_end", "n_merged"]
            )
        df = df.sort_values(
            [*key_cols, start_col, end_col], kind="stable"
        ).reset_index(drop=True)
        g = df.groupby(key_cols, sort=False)
        run_end = g[end_col].cummax()
        prev_end = run_end.groupby(
            [df[c] for c in key_cols], sort=False
        ).shift(1)
        new_island = (
            prev_end.isna() | (df[start_col] > prev_end)
        ).to_numpy()
        island = np.cumsum(new_island) - 1
        out = df.assign(__island=island)
        agg = out.groupby(key_cols + ["__island"], sort=False).agg(
            island_start=(start_col, "min"),
            island_end=(end_col, "max"),
            n_merged=(start_col, "size"),
        ).reset_index().drop(columns="__island")
        agg["n_merged"] = agg["n_merged"].astype("int64")
        return agg

    return bucketed_group_map(
        ds.select_columns(cols), key_cols, per_bucket, num_buckets=num_buckets
    )
