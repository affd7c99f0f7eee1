"""Deterministic sampling and dataset splitting.

Training pipelines need samples and train/val/test splits that are (a)
reproducible run-over-run, (b) independent of partitioning and row
order, and (c) consistent when the dataset grows (a row's assignment
never changes because other rows arrived). Spark's ``df.sample`` is
seed-stable only for a fixed partitioning, so it fails (b) and (c).

Everything here keys off ``md5(id)`` instead: a pure per-row projection
— no shuffle, no state, embarrassingly parallel at 100 TB — and the
same function every engine implements bit-identically, so results are
DuckDB-oracle-able. Fractions are mapped to 16-bit hex-prefix
thresholds: lowercase fixed-width hex compares lexicographically in
value order, so ``substr(md5(x), 1, 4) < '0ccd'`` IS ``hash(x) <
0.05 * 2^16`` in any engine with no hex→int conversion needed.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_SPACE = 1 << 16  # 4 hex chars of the md5 digest


def _hex_threshold(fraction: float) -> str:
    """Smallest 4-hex-char string h such that the share of 16-bit hash
    values strictly below h is >= fraction."""
    n = min(_SPACE, max(0, round(fraction * _SPACE)))
    if n >= _SPACE:
        # 'g' sorts after every hex char: keeps ALL rows. '10000' would
        # NOT (lexicographic compare: 'f3ab' > '10000').
        return "g"
    return format(n, "04x")


def _hash_prefix(id_col: str) -> Column:
    return F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 4)


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose md5(id) 16-bit
    prefix falls below the fraction threshold. Pure filter — Catalyst
    pushes it into the scan; zero shuffle at any scale."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_hash_prefix(id_col) < F.lit(_hex_threshold(fraction)))


def split_column(id_col: str, weights: Sequence[float], names: Sequence[str]) -> Column:
    """Column assigning each row a split name by md5-prefix range.
    Weights are normalized; boundaries are cumulative thresholds."""
    if len(weights) != len(names) or not names:
        raise ValueError("weights and names must be same nonzero length")
    total = float(sum(weights))
    h = _hash_prefix(id_col)
    acc = 0.0
    branches = []
    for w, name in zip(weights[:-1], names[:-1]):
        acc += w / total
        branches.append((_hex_threshold(acc), name))
    # ordered CASE chain: first matching (smallest) bound wins
    out = None
    for bound, name in branches:
        cond = h < F.lit(bound)
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
    return (out.otherwise(F.lit(names[-1])) if out is not None else F.lit(names[-1]))


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
) -> DataFrame:
    """Tag every row with a deterministic split assignment. A row's
    split depends only on its own id — stable under growth, reshuffle,
    and recompute — which is the property naive ``randomSplit`` lacks."""
    return df.withColumn("split", split_column(id_col, weights, names))


def stratified_hash_sample(
    df: DataFrame, id_col: str, strata_cols: List[str], fractions: dict
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps a stratum
    value (of the single stratum column) to its keep-fraction; missing
    strata default to 0. Still a pure filter (the fraction lookup is a
    literal CASE), so it runs scan-side at any scale."""
    if len(strata_cols) != 1:
        raise ValueError("stratified_hash_sample supports one stratum column")
    s = F.col(strata_cols[0])
    thr = None
    for val, frac in sorted(fractions.items()):
        lit = F.lit(_hex_threshold(frac))
        thr = F.when(s == val, lit) if thr is None else thr.when(s == val, lit)
    thr = thr.otherwise(F.lit("0000")) if thr is not None else F.lit("0000")
    return df.filter(_hash_prefix(id_col) < thr)


def weighted_mix_sample(
    df: DataFrame, id_col: str, group_col: str, rates: dict, default_rate: float = 0.0
) -> DataFrame:
    """Corpus mixing: tag each row with a deterministic keep/drop flag
    at its group's sampling rate (``rates`` maps group value → fraction;
    unlisted groups get ``default_rate``).

    This is the "mix web at 10%, books at 70%, wiki at 100%" step of
    training-corpus assembly. Pure scan-side projection: the rate lookup
    is a literal CASE and membership is an md5-prefix threshold, so the
    mix is reproducible across engines, runs, and repartitions, and a
    row's fate never changes as the corpus grows."""
    g = F.col(group_col)
    thr = None
    for val, frac in sorted(rates.items()):
        lit = F.lit(_hex_threshold(frac))
        thr = F.when(g == val, lit) if thr is None else thr.when(g == val, lit)
    default_lit = F.lit(_hex_threshold(default_rate))
    thr = thr.otherwise(default_lit) if thr is not None else default_lit
    return df.withColumn("keep", _hash_prefix(id_col) < thr)


def token_budget_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    budgets: dict,
    default_budget: int = 0,
) -> DataFrame:
    """Budgeted corpus assembly: from each group, keep documents (in a
    deterministic md5 shuffle order) until the group's cumulative token
    count reaches its budget — the "2B web tokens, 500M books tokens"
    step of building a training mix to a target size.

    One window per group: rows sorted by md5(id) (a reproducible
    shuffle — no RNG, no run-to-run drift), running token sum, keep
    while the PRE-document cumulative is under budget, so the document
    that crosses the line is still included (budgets are floors, like
    sampling-with-carryover in practice). Single shuffle on the group
    key; at heavy skew split the hot group with `with_salt` and
    per-salt sub-budgets."""
    g = F.col(group_col)
    budget = None
    for val, b in sorted(budgets.items()):
        budget = (
            F.when(g == val, F.lit(int(b)))
            if budget is None
            else budget.when(g == val, F.lit(int(b)))
        )
    budget = (
        budget.otherwise(F.lit(int(default_budget)))
        if budget is not None
        else F.lit(int(default_budget))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return df.withColumn(
        "keep", (cum - F.col(token_col)) < budget
    ).withColumn("cum_tokens", cum.cast("long"))


def topn_per_group(
    df: DataFrame, id_col: str, group_col: str, n: int
) -> DataFrame:
    """Deterministic fixed-n class balancing: keep exactly
    ``min(n, |group|)`` rows per group, chosen by the md5 shuffle order
    (reproducible; no RNG, no run-to-run drift). The count-capped twin
    of rate-based (`weighted_mix_sample`) and budget-based
    (`token_budget_mix`) selection. Compiles to a rank window per
    group — WindowGroupLimit pushes the top-n below the shuffle, so
    the exchange carries ~n rows per group, not the group."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def temperature_mix_rates(
    df: DataFrame, group_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-group TEMPERATURE sampling rates — the standard multilingual
    flattening (sample group g with probability ∝ n_g^alpha, alpha<1
    up-weights small languages; alpha=1 is natural, alpha=0 uniform).
    rate_g = (n_min / n_g)^(1-alpha), so the smallest group keeps
    everything and larger groups downsample toward the flattened mix.

    One hash aggregate + a broadcast of the single-row min — rates are
    derived IN-PLAN (no driver collect), exact double math any engine
    reproduces."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("__n_min"))
    return (
        counts.crossJoin(F.broadcast(n_min))
        .withColumn(
            "rate",
            F.pow(F.col("__n_min") / F.col("n_docs"), F.lit(1.0 - alpha)),
        )
        .drop("__n_min")
    )


def temperature_mix_sample(
    df: DataFrame, id_col: str, group_col: str, alpha: float = 0.5
) -> DataFrame:
    """Tag each row with a deterministic temperature-mix keep flag:
    group rates from :func:`temperature_mix_rates`, membership by the
    same md5-prefix threshold every sampler here uses (reproducible
    across engines/runs/repartitions; a row's fate never changes as
    unrelated groups grow). Broadcast join of the tiny rate table —
    scan-side projection, no shuffle of the data."""
    clash = {"n_docs", "rate", "keep"} & set(df.columns)
    if clash:
        raise ValueError(
            f"temperature_mix_sample: input already has column(s) {sorted(clash)} "
            "which the op outputs — rename them first"
        )
    rates = temperature_mix_rates(df, group_col, alpha)
    # clamp the rounded threshold to _SPACE-1 BEFORE the 4-char lpad: a
    # rate that rounds to _SPACE while still < 1.0 would render '10000'
    # and lpad TRUNCATES it to '1000' — silently keeping ~6% of a group
    # that should keep ~100%. (rate >= 1.0 itself bypasses via the
    # keep-all guard below, mirroring _hex_threshold's 'g' sentinel.)
    thr = F.lower(
        F.lpad(
            F.conv(
                F.least(
                    F.round(F.col("rate") * _SPACE).cast("long"),
                    F.lit(_SPACE - 1),
                ).cast("string"),
                10,
                16,
            ),
            4,
            "0",
        )
    )
    tagged = rates.withColumn("__thr", thr)
    return df.join(F.broadcast(tagged), group_col).withColumn(
        "keep",
        (F.col("rate") >= 1.0) | (_hash_prefix(id_col) < F.col("__thr")),
    ).drop("__thr")
