"""Staging fetch (SURVEY S4 + X1): the bulk person-page download.

The reference fetches one XML per researcher with a row-wise pandas
``apply`` doing sequential HTTP GETs — 400 requests, 11.5 minutes, the
pipeline's hot spot (`/root/reference/main_dag.py:16-46`,
`researchers_xml_download_script.py:10-22`; docx §Run time).

Engine restatement: the side-effecting row function becomes
``foreachPartition`` — each partition opens ONE connection/session and
streams its rows through it, so 1000 executors fetch in parallel with
bounded connections (the X1 pattern: side effects never go through a
row-at-a-time Python UDF in a query plan; they live in an explicit
action at the pipeline edge).

No network access exists in this environment, so the transport is
INJECTED (``fetch_fn``); ``dblp_url`` builds the reference's URL shape.
The default transport raises — callers must supply one (tests inject a
fake; production injects requests/urllib with retry policy).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

# Ship this module's functions by value into workers (same concern as
# xml_source: the external driver may launch from any cwd).
try:  # pragma: no cover
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

DBLP_URL_TEMPLATE = "https://dblp.org/pid/{pid}.xml"


def dblp_url(pid: str) -> str:
    """URL shape from `researchers_xml_download_script.py:10-22`."""
    return DBLP_URL_TEMPLATE.format(pid=pid)


def _no_transport(url: str) -> bytes:
    raise NotImplementedError(
        "no HTTP transport in this environment — inject fetch_fn "
        "(e.g. lambda url: requests.get(url, timeout=30).content)"
    )


def fetch_to_staging(
    researchers: DataFrame,
    staging_dir: str,
    fetch_fn: Callable[[str], bytes] = _no_transport,
    pid_col: str = "PID",
    name_col: str = "Name",
) -> None:
    """Fetch every researcher's person page into ``staging_dir/<Name>``
    (the reference's staging layout, `main_dag.py:38-46`), one partition
    per worker, rows streamed (X1: foreachPartition, not per-row UDF).

    Failures write the error body to the staging file — downstream S6
    corrupt-skip (xml_source.parse_person_page) drops them, exactly like
    the reference's 404 handling.
    """
    os.makedirs(staging_dir, exist_ok=True)
    url_of = dblp_url  # close over module functions by value-safe refs

    def handle_partition(rows: Iterator) -> None:
        for row in rows:
            pid, name = row[pid_col], row[name_col]
            target = os.path.join(staging_dir, str(name))
            try:
                body = fetch_fn(url_of(str(pid)))
            except Exception as exc:  # noqa: BLE001 - staged as corrupt body
                body = f"fetch error: {exc}".encode()
            with open(target, "wb") as f:
                f.write(body)

    researchers.select(pid_col, name_col).foreachPartition(handle_partition)


def load_staged(spark, staging_dir: str) -> DataFrame:
    """Read the staging dir back as (researcher_name, content) whole-file
    rows — the xml_flatten input shape. ``wholetext`` keeps one row per
    staged file."""
    from pyspark.sql import functions as F

    df = spark.read.text(staging_dir, wholetext=True)
    meta = df.withColumn("path", F.input_file_name())
    return meta.select(
        F.element_at(F.split("path", "/"), -1).alias("researcher_name"),
        F.col("value").alias("content"),
    )
