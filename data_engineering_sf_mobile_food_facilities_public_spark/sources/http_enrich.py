"""Executor-side batch HTTP enrichment (reference S3).

The reference enriches each (applicant, address) pair with one
driver-side Yelp REST call inside a pandas row loop
(``/root/reference/airflow.py:92-105``) and flattens the JSON response
imperatively (``airflow.py:107-124``).  That shape caps throughput at
one driver thread and one request at a time.

The Spark-scale mapping: the request targets are ROWS, so the fetch is a
``mapInPandas`` stage — each executor task receives Arrow batches of URL
rows, performs its own HTTP GETs (bounded per-task concurrency, retries
with backoff executor-side so a flaky endpoint retries the ROW, not the
job), and yields the raw JSON as a column.  Downstream, ``flatten_yelp``
(sources/json_flatten.py) parses it declaratively — the parse stays in
Catalyst, only the I/O lives in Python.

At 1000 executors this is 1000-way parallel ingestion, so the politeness
knobs matter: ``max_connections_per_task`` bounds sockets per task, and
callers size the stage's parallelism (``df.repartition(n)``) to respect
the endpoint's global rate limit — parallelism is the product of the
two, chosen by the caller, not hidden in the operator.

No external HTTP libraries: stdlib ``urllib`` only, so the operator
works on a bare cluster image.  Tests exercise it against an in-process
``http.server`` stub — the transport really runs; only the remote
endpoint is simulated.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from typing import TYPE_CHECKING
from urllib.parse import quote

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def _get(url: str, timeout: float, retries: int, headers: dict[str, str]) -> tuple[str, int]:
    """One GET with bounded retries + exponential backoff.  Returns
    (body, status); transport failures return ("", 0) after the last
    retry instead of raising, so one dead URL poisons one ROW, not the
    whole task — the null-JSON row surfaces downstream where
    ``from_json`` maps it to NULL."""
    import urllib.error
    import urllib.request

    delay = 0.1
    for attempt in range(retries + 1):
        try:
            req = urllib.request.Request(url, headers=headers)
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.read().decode("utf-8", errors="replace"), resp.status
        except urllib.error.HTTPError as e:
            # 4xx is deterministic — retrying cannot help
            if 400 <= e.code < 500:
                return "", e.code
            last_status = e.code
        except Exception:
            last_status = 0
        if attempt < retries:
            time.sleep(delay)
            delay *= 2
    return "", last_status


def fetch_json(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "raw_json",
    status_col: str = "http_status",
    timeout: float = 10.0,
    retries: int = 2,
    headers: dict[str, str] | None = None,
    max_connections_per_task: int = 4,
) -> DataFrame:
    """Batch HTTP GET as a ``mapInPandas`` stage: every input column
    passes through unchanged, plus ``out_col`` (response body, "" on
    failure) and ``status_col`` (HTTP status, 0 on transport failure).

    Narrow transformation — no shuffle; fetch parallelism is (number of
    input partitions) x ``max_connections_per_task``.  Requests within a
    batch run on a small thread pool because HTTP latency, not CPU, is
    the bound — GIL release during socket waits makes threads the right
    concurrency primitive here.
    """
    import pandas as pd  # noqa: F811 — executor-side import

    hdrs = dict(headers or {})
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(out_col, T.StringType()),
            T.StructField(status_col, T.IntegerType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_connections_per_task) as pool:
            for pdf in batches:
                results = list(
                    pool.map(
                        lambda u: _get(u, timeout, retries, hdrs), pdf[url_col]
                    )
                )
                yield pdf.assign(
                    **{
                        out_col: pd.Series(
                            [b for b, _ in results], index=pdf.index, dtype="object"
                        ),
                        status_col: pd.Series(
                            [s for _, s in results], index=pdf.index, dtype="int32"
                        ),
                    }
                )

    return df.mapInPandas(run, out_schema)


def yelp_search_url(base_url: str, term: Column, location: Column) -> Column:
    """Yelp business-search URL per row (airflow.py:96-99's params dict,
    expressed as a Catalyst concat with url-encoding)."""
    return F.concat(
        F.lit(base_url.rstrip("/") + "/v3/businesses/search?term="),
        F.url_encode(term),
        F.lit("&location="),
        F.url_encode(location),
        F.lit("&limit=1"),
    )


def enrich_with_yelp(
    targets: DataFrame,
    base_url: str,
    term_col: str = "applicant",
    location_col: str = "address",
    api_key: str | None = None,
    **fetch_kwargs,
) -> DataFrame:
    """End-to-end S3: (term, location) rows -> batched executor GETs ->
    declarative flatten to the reference's 8 yelp columns, keyed by BOTH
    request columns — an applicant can appear at multiple addresses, so
    keeping only the term would make those rows indistinguishable and a
    join-back on applicant would cross-match; (term, location) is the
    request's natural key.  The location key is emitted as
    ``request_<location_col>`` because the flattened yelp schema already
    contains an ``Address`` business column and parquet writes resolve
    column names case-insensitively.  Rows whose fetch failed or whose
    JSON has no businesses drop out in the explode, exactly like the
    reference's skipped-on-error rows (airflow.py:101-105)."""
    from .json_flatten import flatten_yelp

    headers = dict(fetch_kwargs.pop("headers", {}) or {})
    if api_key:
        headers["Authorization"] = f"Bearer {api_key}"
    with_url = targets.withColumn(
        "url", yelp_search_url(base_url, F.col(term_col), F.col(location_col))
    )
    fetched = fetch_json(with_url, headers=headers, **fetch_kwargs)
    req_loc = f"request_{location_col}"
    flat = flatten_yelp(
        fetched.filter(F.col("http_status") == 200).select(
            term_col, F.col(location_col).alias(req_loc), "raw_json"
        ),
        keep_cols=(term_col, req_loc),
    )
    return flat
