"""Domain balancing for training-corpus assembly: per-domain
contribution caps + per-domain mixture rates (the RefinedWeb "no
domain dominates" rule and the Pile/DoReMi-style static mixture,
composed into one auditable pass).

Spark-first shape: ONE shuffle — the rank window partitioned by
domain; the per-domain rate table is domains-sized and broadcasts;
everything after is narrow. Ranking uses the engine's md5-derived
draw (layout-independent, engine-portable) with the id as tiebreak,
so "which documents a capped domain keeps" is a deterministic uniform
sample of that domain, not an artifact of scan order.

Skew note: one giant domain makes one hot window partition. The
operator keeps every row (audit trail, repo convention), so the
rank-limit pushdown (WindowGroupLimit) cannot truncate map-side.
For the 100 TB path, :func:`domain_cap_survivors` runs the classic
two-phase group-limit instead: a partial rank per (domain,
md5-bucket) — B-way parallel even for a monster domain, and the
rank<=cap filter there DOES get the map-side WindowGroupLimit — then
the exact window over at most B*cap rows per domain. The survivor
set is provably identical (a domain-top-cap row is top-cap within
its own bucket a fortiori).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity_dedup import md5_long


def domain_cap_and_mix(
    docs: DataFrame,
    rates: DataFrame,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    default_rate: int = 500,
    salt: str = "dommix",
) -> DataFrame:
    """Rank documents within each domain by a deterministic md5 draw,
    cap each domain's contribution at ``cap``, then keep each
    cap-surviving document with its domain's per-mille rate from
    ``rates`` (columns: ``domain_col, rate_permille``; domains absent
    from the table fall back to ``default_rate``).

    Returns every input row (nothing silently disappears):
    (id_col, domain_col, domain_rank, kept_cap, rate_permille,
    selected) where ``selected = kept_cap AND mix-draw < rate``.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    draw = md5_long(
        F.concat(
            F.lit(salt), F.lit(":"), F.col(domain_col),
            F.lit(":"), F.col(id_col).cast("string"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy(domain_col).orderBy(draw, F.col(id_col))
    )
    mix_draw = F.pmod(
        md5_long(
            F.concat(
                F.lit(salt), F.lit("/mix:"), F.col(id_col).cast("string")
            )
        ),
        F.lit(1000),
    )
    return (
        docs.select(id_col, domain_col)
        .withColumn("domain_rank", rank.cast("long"))
        .join(F.broadcast(rates), domain_col, "left")
        .select(
            id_col,
            domain_col,
            "domain_rank",
            (F.col("domain_rank") <= cap).alias("kept_cap"),
            F.coalesce("rate_permille", F.lit(default_rate))
            .cast("long")
            .alias("rate_permille"),
        )
        .withColumn(
            "selected",
            F.col("kept_cap") & (mix_draw < F.col("rate_permille")),
        )
    )


def temperature_rates(
    docs: DataFrame,
    domain_col: str = "source",
    target_permille_of_max: int = 1000,
) -> DataFrame:
    """Temperature-scaled (alpha = 0.5) domain sampling rates — the
    mT5/XLM-R language-balancing rule: sampling probability per domain
    proportional to count^alpha, i.e. a per-document keep rate
    proportional to count^(alpha-1) = 1/sqrt(count), so small domains
    up-weight and no domain is starved. Rates normalize so the
    SMALLEST domain keeps ``target_permille_of_max``; every rate is
    ``floor``-quantized per mille.

    alpha is fixed at 0.5 BECAUSE of the determinism contract: sqrt is
    IEEE-correctly-rounded in both Spark and DuckDB, while pow(x, a)
    for general a is libm-dependent (the ln rule, see lm_scoring.py).
    Other temperatures need a quantized-rate table shipped as data.

    Returns (domain_col, n_docs, rate_permille) — one aggregation over
    the corpus; the result is domains-sized and broadcasts.
    """
    counts = docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    min_n = counts.agg(F.min("n_docs").alias("__min_n"))
    # rate(d) = floor(target * sqrt(min_n) / sqrt(n_d)) — equals
    # `target` for the smallest domain, shrinks as 1/sqrt for larger
    # ones. Fixed op order, mirrored in the SQL twin.
    return (
        counts.crossJoin(F.broadcast(min_n))
        .select(
            domain_col,
            "n_docs",
            F.floor(
                F.lit(float(target_permille_of_max))
                * F.sqrt(F.col("__min_n").cast("double"))
                / F.sqrt(F.col("n_docs").cast("double"))
            ).alias("rate_permille"),
        )
    )


def domain_cap_survivors(
    docs: DataFrame,
    cap: int,
    buckets: int = 32,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "dommix",
) -> DataFrame:
    """Skew-safe survivors-only domain cap for the 100 TB path: the
    SAME survivor set as ``domain_cap_and_mix(...).filter(kept_cap)``
    (identical draw, identical tiebreak), computed as a two-phase
    group-limit so no single window partition ever holds a whole
    monster domain:

    phase 1 — rank within (domain, md5-bucket of ``buckets``); the
    ``rank <= cap`` filter is a rank-limit window, so Spark's
    WindowGroupLimit truncates each partition map-side and the
    shuffle is ``buckets``-way parallel per domain;
    phase 2 — exact rank over the <= ``buckets * cap`` survivors per
    domain (a tiny window), keep ``rank <= cap``.

    Correctness: a row in its domain's true top-``cap`` by draw has
    fewer than ``cap`` smaller draws in the WHOLE domain, hence fewer
    in its own bucket — it always survives phase 1. Returns
    (id_col, domain_col, domain_rank) for survivors only.
    """
    if cap < 1 or buckets < 1:
        raise ValueError("cap and buckets must be >= 1")
    draw = md5_long(
        F.concat(
            F.lit(salt), F.lit(":"), F.col(domain_col),
            F.lit(":"), F.col(id_col).cast("string"),
        )
    ).alias("__draw")
    bucket = F.pmod(
        md5_long(
            F.concat(F.lit(salt + "/b:"), F.col(id_col).cast("string"))
        ),
        F.lit(buckets),
    ).alias("__bkt")
    tagged = docs.select(id_col, domain_col, draw, bucket)
    partial = F.row_number().over(
        Window.partitionBy(domain_col, "__bkt").orderBy(
            "__draw", F.col(id_col)
        )
    )
    phase1 = tagged.withColumn("__r1", partial).filter(
        F.col("__r1") <= cap
    )
    exact = F.row_number().over(
        Window.partitionBy(domain_col).orderBy("__draw", F.col(id_col))
    )
    return (
        phase1.withColumn("domain_rank", exact.cast("long"))
        .filter(F.col("domain_rank") <= cap)
        .select(id_col, domain_col, "domain_rank")
    )
