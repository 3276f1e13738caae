"""Deterministic sampling / splitting / packing for training-data pipelines.

A 100 TB corpus feeding a training run needs reproducible, cluster-stable
row selection — `rand()` is neither (it changes per task retry and per
partitioning).  Everything here keys off an md5-derived hash of the row id,
so results are identical across runs, partitionings, AND engines (DuckDB
can replicate the hash exactly — see the registry oracles for the dedup
operators using the same construction):

- ``hash_split``          — train/val/test assignment by hash range.
- ``hash_sample``         — deterministic n-row sample (top-n by hash).
- ``stratified_hash_sample`` — per-stratum fraction by hash threshold.
- ``pack_documents``      — greedy token-budget bin packing (sequence
                            packing for context windows), partition-local
                            first-fit-decreasing via ``applyInPandas``.

Scale notes: split/sample/stratify are pure projections or single
aggregation-free filters — no shuffle at all for split/stratify (the hash
is computed in the scan projection and the filter pushes down around it);
``hash_sample`` is a global top-n (TakeOrderedAndProject, never a full
sort materialization).  ``pack_documents`` shuffles once on the pack-group
key; bins never span groups, so packing an exabyte is as parallel as its
group count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash resolution: buckets in [0, 1e6) — fraction boundaries are exact
#: at 6 decimal places on both engines
_BUCKETS = 1_000_000


def _hash_bucket(id_col: str, salt: str) -> Column:
    """md5-derived bucket in [0, 1e6) — deterministic, engine-portable:
    DuckDB equivalent is
    ``CAST(('0x' || substr(md5(id || '_<salt>'), 1, 15)) AS BIGINT) % 1000000``."""
    h60 = F.conv(
        F.substring(F.md5(F.concat_ws("_", F.col(id_col).cast("string"),
                                      F.lit(salt))), 1, 15),
        16, 10,
    ).cast("long")
    return F.pmod(h60, F.lit(_BUCKETS))


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float],
               salt: str = "split") -> DataFrame:
    """Assign every row to a named split by deterministic hash range.

    ``weights`` maps split name → fraction; fractions must sum to 1 (±1e-9).
    A row's split never changes when the table grows, is repartitioned, or
    is re-read — the property a train/val/test split must have to avoid
    leakage across pipeline runs.  Adds a ``split`` column.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _hash_bucket(id_col, salt)
    expr = None
    cum = 0.0
    items = sorted(weights.items())  # deterministic boundary order
    for name, w in items[:-1]:
        cum += w
        bound = int(round(cum * _BUCKETS))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def hash_sample(df: DataFrame, id_col: str, n: int,
                salt: str = "sample") -> DataFrame:
    """Deterministic n-row sample: the n rows with the smallest salted
    hash (ties broken by id).  Equivalent in distribution to a uniform
    reservoir sample, but stable across runs/partitionings and exactly
    reproducible in SQL.  Global top-n → TakeOrderedAndProject, no full
    sort."""
    bucket = _hash_bucket(id_col, salt)
    return (
        df.withColumn("__hb", bucket)
        .orderBy(F.col("__hb").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("__hb")
    )


def stratified_hash_sample(df: DataFrame, id_col: str, strata_col: str,
                           fractions: dict, default_fraction: float = 0.0,
                           salt: str = "strata") -> DataFrame:
    """Keep a per-stratum fraction of rows by hash threshold: stratum s
    keeps rows with ``bucket < fractions[s] * 1e6``.  Exact-fraction in
    expectation, deterministic row set, no shuffle (filter in the scan
    projection).  Strata missing from ``fractions`` use
    ``default_fraction``."""
    bucket = _hash_bucket(id_col, salt)
    thresh = None
    for s, frac in sorted(fractions.items()):
        bound = int(round(frac * _BUCKETS))
        cond = F.col(strata_col) == F.lit(s)
        thresh = (F.when(cond, bound) if thresh is None
                  else thresh.when(cond, bound))
    default_bound = int(round(default_fraction * _BUCKETS))
    thresh = (F.lit(default_bound) if thresh is None
              else thresh.otherwise(default_bound))
    return df.filter(bucket < thresh)


def mixture_resample(df: DataFrame, id_col: str, domain_col: str,
                     target_weights: dict, target_rows: int,
                     salt: str = "mixture") -> DataFrame:
    """Resample a corpus toward a target domain mixture — the standard
    pretraining-data step (e.g. "40% web, 30% code, 30% books" regardless
    of the raw crawl's proportions).

    Per domain d the keep fraction is
    ``target_weights[d] · target_rows / count(d)`` (capped at 1 — this is
    sampling without replacement, so a domain can't be upsampled past its
    size; the output then under-fills that domain rather than duplicating
    rows).  Selection is the deterministic hash threshold, so the chosen
    row set is stable across runs and engines.

    Fully lazy: domain counts are an aggregate subplan broadcast-joined
    back — one shuffle of |domains| partial counts, then a scan-side
    filter.  Domains absent from ``target_weights`` are dropped.
    """
    total = sum(target_weights.values())
    if total <= 0:
        raise ValueError("target weights must sum to a positive value")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, w / total) for k, w in target_weights.items()],
        f"{domain_col} string, __w double",
    ) if isinstance(next(iter(target_weights)), str) else spark.createDataFrame(
        [(k, w / total) for k, w in target_weights.items()],
        f"{domain_col} long, __w double",
    )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    frac = (
        counts.join(F.broadcast(wdf), domain_col)
        .select(
            domain_col,
            F.least(
                F.lit(1.0), F.col("__w") * target_rows / F.col("__n")
            ).alias("__frac"),
        )
    )
    bucket = _hash_bucket(id_col, salt)
    return (
        df.join(F.broadcast(frac), domain_col)
        .filter(bucket < F.round(F.col("__frac") * _BUCKETS))
        .drop("__frac")
    )


def first_fit_decreasing(sizes: list[int], max_tokens: int) -> list[int]:
    """Bin index per item for an already-sorted (descending) size list:
    first bin with room wins; items >= max_tokens get a dedicated full bin.
    Pure kernel of ``pack_documents`` — property-tested without Spark."""
    bins: list[int] = []  # remaining capacity per bin
    assign: list[int] = []
    for t in sizes:
        if t >= max_tokens:
            bins.append(0)  # singleton, full
            assign.append(len(bins) - 1)
            continue
        for i, cap in enumerate(bins):
            if cap >= t:
                bins[i] = cap - t
                assign.append(i)
                break
        else:
            bins.append(max_tokens - t)
            assign.append(len(bins) - 1)
    return assign


def pack_documents(df: DataFrame, id_col: str, tokens_col: str,
                   max_tokens: int, n_groups: int = 64,
                   salt: str = "pack") -> DataFrame:
    """Greedy sequence packing: assign each doc to a bin so no bin exceeds
    ``max_tokens`` tokens — the standard preprocessing step that fills
    training context windows instead of padding them.

    Docs longer than ``max_tokens`` get a singleton bin (the caller
    truncates downstream).  Packing is first-fit-decreasing WITHIN a hash
    group (``n_groups`` groups): bins never span groups, so the algorithm
    is embarrassingly parallel and deterministic — FFD's ≤ 11/9·OPT + 1
    bound applies per group, and at corpus scale the utilization loss from
    grouping is negligible while the sequential-packing bottleneck
    disappears.  Returns ``(id, bin_id, bin_tokens)`` where ``bin_id`` is
    globally unique (group * 2^40 + local bin index).
    """
    grouped = df.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).cast("long").alias("toks"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", F.col(id_col).cast("string"),
                                      F.lit(salt))), 1, 15),
                16, 10,
            ).cast("long"),
            F.lit(n_groups),
        ).cast("int").alias("grp"),
    )

    def ffd(key, pdf):
        grp = int(key[0])
        # first-fit-decreasing; ties by id for determinism
        pdf = pdf.sort_values(["toks", "id"], ascending=[False, True])
        assign = first_fit_decreasing(
            [int(t) for t in pdf["toks"]], max_tokens
        )
        out = pdf.assign(bin_local=assign)
        out["bin_id"] = (grp << 40) + out["bin_local"]
        out["bin_tokens"] = out.groupby("bin_id")["toks"].transform("sum")
        return out[["id", "bin_id", "bin_tokens"]]

    return grouped.groupBy("grp").applyInPandas(
        ffd, schema="id long, bin_id long, bin_tokens long"
    )
