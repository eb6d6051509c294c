"""S4/X1 staging fetch: foreachPartition side-effect loop with injected
transport, staging layout, and the fetch → scan → flatten pipeline."""

from __future__ import annotations

import pytest

from is3107datapipelineproject_spark.sources import fetch as FE
from is3107datapipelineproject_spark.sources.xml_source import xml_flatten
from tests.test_dblp_domain import PAGE_A, PAGE_B


def test_fetch_pipeline_end_to_end(spark, tmp_path):
    staging = str(tmp_path / "researchers_publications")
    researchers = spark.createDataFrame(
        [("1/234", "Alice"), ("11/2345", "Bob"), ("9/999", "Dead")],
        ["PID", "Name"],
    )

    pages = {FE.dblp_url("1/234"): PAGE_A.encode(), FE.dblp_url("11/2345"): PAGE_B.encode()}

    def fake_fetch(url: str) -> bytes:
        if url not in pages:
            raise OSError("404")
        return pages[url]

    FE.fetch_to_staging(researchers, staging, fake_fetch)

    staged = FE.load_staged(spark, staging)
    rows = {r.researcher_name: r.content for r in staged.collect()}
    assert set(rows) == {"Alice", "Bob", "Dead"}
    assert rows["Dead"].startswith("fetch error:")  # staged corrupt, S6 drops it

    flat = xml_flatten(staged, "content", "researcher_name")
    keys = {r.paper_key for r in flat.select("paper_key").collect()}
    assert "journals/tog/A20" in keys and "phd/B16" in keys
    assert flat.filter("source_name = 'Dead'").count() == 0  # corrupt skipped


def test_default_transport_raises():
    with pytest.raises(NotImplementedError):
        FE._no_transport("https://example.com")
