"""Skew-mitigation queries: salted twins of a hot-key join and a
hot-key aggregation over events (event_type has ~5 values — every
groupBy on it is maximally skewed: 32 shuffle partitions, 5 live
keys). The salt changes only the distribution, so both entries
oracle-check against the PLAIN SQL — same rows, same values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import sql_dsum
from ..operators.skew import salted_agg, salted_join
from ..registry import query
from ..tables import table

N_SALTS = 8


@query(
    "agg_skew_salted",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via two-stage salting: stage 1 groups by
    (event_type, salt) so each of the ~5 hot keys combines on
    N_SALTS reducers; stage 2 merges the partials. count merges as
    sum; the decimal-sum merges as decimal-sum (exact, associative) —
    which is why the result is bit-identical to the plain groupBy."""
    ev = table(spark, sf_dir, "events")
    dec = F.sum(F.col("value").cast("decimal(18,6)"))
    return salted_agg(
        ev.select("event_type", "value"),
        keys=["event_type"],
        aggs=[F.count("*").alias("pn"), dec.alias("psum")],
        final_aggs=[
            F.sum("pn").alias("n"),
            F.sum("psum").cast("double").alias("sum_value"),
        ],
        n_salts=N_SALTS,
    )


@query(
    "join_skew_salted",
    oracle=f"""
    SELECT e.event_id, e.user_id, u.n_events_user
    FROM events e
    JOIN (SELECT user_id AS uk, CAST(COUNT(*) AS BIGINT) AS n_events_user
          FROM events GROUP BY user_id) u
      ON u.uk = e.user_id
    WHERE e.event_type = 'click'
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join via salting: clicks (a hot event_type slice)
    join a small per-user dim; each user's rows scatter over N_SALTS
    sub-keys while the dim replicates N_SALTS-fold. Identical output
    to the plain join — verified by the oracle."""
    ev = table(spark, sf_dir, "events")
    dim = (
        ev.groupBy(F.col("user_id").alias("uk"))
        .agg(F.count("*").alias("n_events_user"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id"
    )
    return salted_join(
        clicks, dim, "user_id", "uk", n_salts=N_SALTS, salt_from=["event_id"]
    ).select("event_id", "user_id", "n_events_user")
