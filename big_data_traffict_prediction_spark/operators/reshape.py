"""Reshaping + semi-structured operators (SURVEY.md §2.8 F16, §2.1
S15).

The reference round-trips JSON documents with ``json.load``/``dump``
(``app/utils.py:390-441``) and ships a wide toll-gate CSV it would
need to unpivot to query (``scripts/syntetic.py``). Engine forms:
``get_json_object`` for path extraction inside whole-stage codegen,
and ``stack()`` for wide→long unpivot — both pure JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# ------------------------------------------------ F16: JSON extraction


@register(
    "q_props_json_extract",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS k_avg
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
)
def q_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: JSON path extraction from the semi-structured props column,
    aggregated per event type. get_json_object runs JVM-side inside
    codegen — no parse UDF; the exact-integer sum divides to a
    deterministic double."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.filter(k.isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum(k).cast("long").alias("k_sum"),
            F.count(F.lit(1)).alias("n"),
            (F.sum(k).cast("double") / F.count(F.lit(1))).alias("k_avg"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------- S15: wide→long stack

_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "q_unpivot_measures",
    oracle=" UNION ALL ".join(
        f"SELECT l_orderkey, l_linenumber, '{m}' AS measure, {m} AS value FROM lineitem"
        for m in _MEASURES
    )
    + " ORDER BY l_orderkey, l_linenumber, measure",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15: wide→long unpivot of the lineitem measures via stack() —
    the engine form of querying the reference's wide toll-gate CSV
    (scripts/syntetic.py:7-29). One projection, ZERO shuffles end to
    end; rows fan out 4× inside codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    stack_expr = "stack({n}, {args}) AS (measure, value)".format(
        n=len(_MEASURES),
        args=", ".join(f"'{m}', {m}" for m in _MEASURES),
    )
    # row-set semantics: no output sort — a global sort of the 4×
    # fan-out is the single most expensive node at scale and buys
    # nothing (order-insensitive compare)
    return li.selectExpr("l_orderkey", "l_linenumber", stack_expr)


# ------------------------------------- F16 modern path: VariantType


@register(
    "q_props_variant_extract",
    oracle="""
SELECT event_type,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
       CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS k_present
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q_props_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path for semi-structured props: parse the
    JSON ONCE into a binary variant (`parse_json`), then typed path
    reads (`try_variant_get`) — the open-format answer to re-parsing a
    JSON string per extracted field. At 100 TB the variant column is
    what you'd persist (shredded parquet), so every downstream path
    read skips the text parse entirely; here parse + read fuse into the
    same codegen stage. Same numeric results as the string-path twin
    (q_props_json_extract's family), so DuckDB's JSON functions remain
    the oracle."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.count("k").cast("long").alias("k_present"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------ Z-order layout key

_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(c):
    """Interleave-spread a 16-bit value into the even bit positions of
    a 32-bit lane (the standard Morton magic-mask ladder)."""
    for shift, mask in _SPREAD_MASKS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def _spread_sql(expr: str) -> str:
    out = expr
    for shift, mask in _SPREAD_MASKS:
        out = f"(({out} | ({out} << {shift})) & {mask})"
    return out


ZORDER_LIMIT = 1000

_ZK_SQL = (
    "("
    + _spread_sql("(CAST(camera_id AS BIGINT) % 65536)")
    + " | ("
    + _spread_sql("((epoch_us(ts) // 1000000) // 3600 % 65536)")
    + " << 1))"
)


def _zorder_oracle() -> str:
    from ..tables import with_traffic

    return with_traffic(f"""
SELECT id, camera_id,
       CAST((epoch_us(ts) // 1000000) // 3600 AS BIGINT) AS epoch_hour,
       CAST({_ZK_SQL} AS BIGINT) AS zkey
FROM traffic
ORDER BY zkey, id
LIMIT {ZORDER_LIMIT}
""")


@register("q_zorder_key", oracle=_zorder_oracle())
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (camera, hour): the two
    16-bit coordinates bit-interleave into one sort key, so a table
    REWRITTEN in zkey order gets parquet row-group min/max locality on
    BOTH the camera and the time axis at once — the data-layout move
    behind multi-dimensional data skipping (Delta/Iceberg OPTIMIZE
    ZORDER). Pure integer magic-mask ladders (identical cross-engine);
    the preview emits the first {ZORDER_LIMIT} rows of the would-be
    layout via TakeOrderedAndProject, never a global sort.
    """
    from ..compat import epoch_s
    from ..tables import traffic_history

    h = traffic_history(spark, sf_dir)
    cam16 = (F.col("camera_id").cast("long") % 65536).cast("long")
    hour16 = (F.floor(epoch_s("ts") / 3600).cast("long") % 65536).cast("long")
    zkey = _spread_bits(cam16).bitwiseOR(F.shiftleft(_spread_bits(hour16), 1))
    return (
        h.select(
            "id",
            "camera_id",
            F.floor(epoch_s("ts") / 3600).cast("long").alias("epoch_hour"),
            zkey.cast("long").alias("zkey"),
        )
        .orderBy("zkey", "id")
        .limit(ZORDER_LIMIT)
    )
