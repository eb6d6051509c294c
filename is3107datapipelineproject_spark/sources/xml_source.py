"""XML scan + flatten (SURVEY S5/S6/X2, F8): DBLP person pages → rows.

The reference parses one XML file at a time with ElementTree inside a
recursive pandas accumulator (`/root/reference/main_dag.py:83-239`). The
Spark-first restatement is a table-valued parse: a DataFrame of whole
XML documents (one row per staged file) flows through an Arrow-batched
``mapInPandas`` kernel that emits one row per publication record with an
explicit nested schema — distributed, streaming per partition, no
recursion, no driver-side accumulation.

Semantics mirrored from the reference (with SURVEY §3.3 corrections):
- tag-dispatch set `main_dag.py:115-134`, including BOTH `masterthesis`
  (the reference's spelling) and `mastersthesis` (DBLP's actual tag);
- `coauthors` elements skipped (`main_dag.py:113-114`);
- records without a `key` attribute skipped (`main_dag.py:149-151`);
- authors AND editors counted in 1-based document order
  (`main_dag.py:163-175` — editors deliberately included);
- `ee` normalized to ``array<string>`` ALWAYS (the reference's
  scalar/list/None triality, `main_dag.py:202-210`, is the F8 bug
  surface we fix at parse time);
- corrupt input (404 body, first line without "xml") skipped, S6
  (`main_dag.py:91-106`);
- `position` struct (number, volume, pages) per the docx UDT.

Category/publisher/mdate *derivation* is column work, not parse work —
see domain.publications.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Ship this module's functions BY VALUE into Python workers: the external
# driver may launch from any cwd, so workers cannot assume the package is
# importable (same concern as multimodal.decode_stub's local kernel).
try:  # pragma: no cover - depends on pyspark vendoring
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; tests run from repo cwd
    pass

PUBLICATION_TAGS = (
    "article",
    "inproceedings",
    "proceedings",
    "book",
    "incollection",
    "phdthesis",
    "masterthesis",   # reference spelling (main_dag.py:127)
    "mastersthesis",  # DBLP's actual tag (SURVEY §3.3)
    "www",
    "data",
)

# Raw flattened record: everything the XML carries, before column-level
# derivations (category, publisher coalesce, mdate parse).
RAW_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType()),
        T.StructField("paper_key", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("publication_type", T.StringType()),
        T.StructField(
            "authors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("pos", T.IntegerType()),
                        T.StructField("pid", T.StringType()),
                        T.StructField("orcid", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("booktitle", T.StringType()),
        T.StructField("journal", T.StringType()),
        T.StructField("publisher_raw", T.StringType()),
        T.StructField(
            "position",
            T.StructType(
                [
                    T.StructField("number", T.StringType()),
                    T.StructField("volume", T.StringType()),
                    T.StructField("pages", T.StringType()),
                ]
            ),
        ),
        T.StructField("ee", T.ArrayType(T.StringType())),
        T.StructField("url", T.StringType()),
        T.StructField("crossref", T.StringType()),
        T.StructField("mdate", T.StringType()),
    ]
)


def parse_person_page(content: str, source_name: str | None = None) -> list[dict]:
    """Parse one DBLP person-page XML document into flat publication
    dicts (RAW_SCHEMA shape). Pure Python — reused by the Spark kernel
    and by unit tests. Corrupt/non-XML input yields [] (S6)."""
    import xml.etree.ElementTree as ET

    if content is None:
        return []
    first_line = content.lstrip().split("\n", 1)[0] if content.strip() else ""
    if "xml" not in first_line:
        # 404 body or junk — the reference skips the whole file
        # (main_dag.py:91-106).
        return []
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return []

    out: list[dict] = []
    for record in root:
        if record.tag == "coauthors":
            continue
        pub = None
        if record.tag in PUBLICATION_TAGS:
            pub = record  # tolerate pages without the <r> wrapper
        else:
            for tag in PUBLICATION_TAGS:
                found = record.find(tag)
                if found is not None:
                    pub = found
                    break
        if pub is None:
            continue

        paper_key = pub.attrib.get("key")
        if paper_key is None:
            continue  # main_dag.py:149-151

        def _text(tag: str):
            el = pub.find(tag)
            return el.text if el is not None else None

        year_text = _text("year")
        authors = []
        pos = 1
        for el in pub:
            if el.tag in ("author", "editor"):
                authors.append(
                    {
                        "pos": pos,
                        "pid": el.attrib.get("pid"),
                        "orcid": el.attrib.get("orcid"),
                        "name": el.text,
                    }
                )
                pos += 1

        out.append(
            {
                "source_name": source_name,
                "paper_key": paper_key,
                "title": _text("title"),
                "year": int(year_text) if year_text is not None else None,
                "publication_type": pub.tag,
                "authors": authors,
                "booktitle": _text("booktitle"),
                "journal": _text("journal"),
                "publisher_raw": _text("publisher"),
                "position": {
                    "number": _text("number"),
                    "volume": _text("volume"),
                    "pages": _text("pages"),
                },
                # F8 fix: ee is ALWAYS an array (0..n elements).
                "ee": [el.text for el in pub.findall("ee")],
                "url": _text("url"),
                "crossref": _text("crossref"),
                "mdate": pub.attrib.get("mdate"),
            }
        )
    return out


def xml_flatten(staged: DataFrame, content_col: str = "content", name_col: str | None = None) -> DataFrame:
    """Table-valued XML parse: DataFrame of whole XML documents → one row
    per publication (RAW_SCHEMA).

    Runs as Arrow-batched ``mapInPandas``; the kernel is a local closure
    (shipped by value — workers never import this package). Scale: parse
    is partition-local and streaming; a 100 TB staging area parses with
    zero shuffles, and the downstream merge/layout steps decide
    partitioning.
    """
    cols = [content_col] + ([name_col] if name_col else [])
    src = staged.select(*cols)
    parse = parse_person_page  # by-value via register_pickle_by_value above

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf[content_col].tolist()
            names = pdf[name_col].tolist() if name_col else [None] * len(contents)
            rows: list[dict] = []
            for content, name in zip(contents, names):
                rows.extend(parse(content, name))
            if rows:  # empty pandas frames carry float64 dtypes Arrow
                # cannot cast to the nested schema — yield nothing instead
                yield pd.DataFrame(rows, columns=[f.name for f in RAW_SCHEMA.fields])

    return src.mapInPandas(kernel, RAW_SCHEMA)
