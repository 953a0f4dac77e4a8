"""Nested-JSON flatten (reference S4, ``/root/reference/airflow.py:107-124``).

The Yelp API returns ``{"businesses": [{..., "location": {"display_address":
[...]}, "coordinates": {...}}]}``; the reference flattens it imperatively
per row.  Here the raw JSON is a string column, ``from_json`` parses it
against a declared schema (bad documents -> null, not crashes), ``explode``
unnests the businesses array, and dot-path projections produce the 8 flat
columns — all Catalyst expressions, so a 100 TB JSON scan stays in the
vectorized reader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

YELP_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField(
            "businesses",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("review_count", T.IntegerType()),
                        T.StructField("rating", T.DoubleType()),
                        T.StructField(
                            "location",
                            T.StructType(
                                [
                                    T.StructField(
                                        "display_address", T.ArrayType(T.StringType())
                                    )
                                ]
                            ),
                        ),
                        T.StructField("display_phone", T.StringType()),
                        T.StructField(
                            "coordinates",
                            T.StructType(
                                [
                                    T.StructField("latitude", T.DoubleType()),
                                    T.StructField("longitude", T.DoubleType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def flatten_yelp(
    raw: DataFrame,
    json_col: str = "raw_json",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Project the nested response to the reference's 8 flat columns
    (airflow.py:109): Yelp_id, Name, Review, Rating, Address, Phone,
    Latitude, Longitude — Address is display_address[0].

    ``keep_cols`` passes request-side key columns (e.g. the search term
    that produced each response) through the explode, so enrichment
    results stay joinable back to their source rows."""
    keep = [F.col(c) for c in keep_cols]
    parsed = raw.select(
        *keep, F.from_json(F.col(json_col), YELP_RESPONSE_SCHEMA).alias("r")
    )
    b = parsed.select(*keep, F.explode("r.businesses").alias("b"))
    return b.select(
        *keep,
        F.col("b.id").alias("Yelp_id"),
        F.col("b.name").alias("Name"),
        F.col("b.review_count").alias("Review"),
        F.col("b.rating").alias("Rating"),
        # F.get (not [0]): ANSI mode throws on out-of-bounds, get() -> NULL
        F.get(F.col("b.location.display_address"), 0).alias("Address"),
        F.col("b.display_phone").alias("Phone"),
        F.col("b.coordinates.latitude").alias("Latitude"),
        F.col("b.coordinates.longitude").alias("Longitude"),
    )
