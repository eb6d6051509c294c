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

# Separator between the name and pid halves of a staging filename. Both
# halves are percent-encoded (quote(safe="")), so the separator can never
# occur inside an encoded half ("_" survives quoting but "__pid__" would
# need a literal "/" — impossible post-quote? no: "_" is unreserved, so a
# name like "a__pid__b" WOULD collide — hence we quote "_" too, see
# _staging_filename).
_PID_SEP = "__pid__"


def dblp_url(pid: str) -> str:
    """URL shape from `researchers_xml_download_script.py:10-22`."""
    return DBLP_URL_TEMPLATE.format(pid=pid)


def _staging_filename(name: str, pid: str) -> str:
    """Collision-proof staging filename: ``quote(name)__pid__quote(pid)``.

    Percent-encoding (with ``_`` forced into the encoded set) guarantees
    (a) no path separator can escape ``staging_dir`` (a Name containing
    "/" is encoded), (b) two researchers sharing a Name land in distinct
    files (the pid disambiguates), and (c) the ``__pid__`` separator can
    never appear inside either encoded half, so ``load_staged`` can split
    unambiguously.
    """
    from urllib.parse import quote

    enc = lambda s: quote(str(s), safe="").replace("_", "%5F")  # noqa: E731
    return f"{enc(name)}{_PID_SEP}{enc(pid)}"


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

    Filenames are ``quote(Name)__pid__quote(PID)`` (see
    _staging_filename): the raw-Name layout of the reference would let
    same-named researchers overwrite each other and a "/" in a Name
    escape the staging dir.
    """
    os.makedirs(staging_dir, exist_ok=True)
    url_of = dblp_url  # close over module functions by value-safe refs
    fname_of = _staging_filename

    def handle_partition(rows: Iterator) -> None:
        for row in rows:
            pid, name = row[pid_col], row[name_col]
            target = os.path.join(staging_dir, fname_of(str(name), str(pid)))
            try:
                body = fetch_fn(url_of(str(pid)))
            except Exception as exc:  # noqa: BLE001 - staged as corrupt body
                body = f"fetch error: {exc}".encode()
            with open(target, "wb") as f:
                f.write(body)

    researchers.select(pid_col, name_col).foreachPartition(handle_partition)


def load_staged(spark, staging_dir: str) -> DataFrame:
    """Read the staging dir back as (researcher_name, pid, content)
    whole-file rows — the xml_flatten input shape. ``wholetext`` keeps
    one row per staged file.

    Decoding is the inverse of _staging_filename, entirely JVM-side:
    ``input_file_name()`` returns a percent-encoded URI, so one
    ``url_decode`` recovers the on-disk filename and a second recovers
    the original Name / PID (spaces, non-ASCII, "/" all round-trip —
    the raw ``input_file_name`` token would yield 'Alice%20Smith').
    Files staged without the ``__pid__`` separator degrade gracefully:
    the whole decoded filename becomes researcher_name, pid is null.
    """
    from pyspark.sql import functions as F

    df = spark.read.text(staging_dir, wholetext=True)
    ondisk = F.url_decode(F.element_at(F.split(F.input_file_name(), "/"), -1))
    parts = F.split(ondisk, _PID_SEP)
    return df.select(
        F.url_decode(F.element_at(parts, 1)).alias("researcher_name"),
        F.url_decode(F.try_element_at(parts, F.lit(2))).alias("pid"),
        F.col("value").alias("content"),
    )
