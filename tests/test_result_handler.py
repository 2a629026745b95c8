"""§2.10 user-extension seam: run_crawl(result_handler=...) — the
CrawlTaskHandler analog (reference crawler.h:29-35) applied distributed to
every fetched block before the status/image/candidate derivations."""

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from tests.test_crawl_parity import CORPUS, corpus  # noqa: F401 (fixture)

OUT_H = "/tmp/spider_ray_test_crawl_handler"


def _make_tag_handler():
    # defined as a closure so cloudpickle ships it BY VALUE — a user handler
    # must not need to be importable on the workers (the extension contract)
    def tag_handler(block: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.greater_equal(block["status"], 200),
            pc.less(block["status"], 300),
        )
        return block.append_column("handler_ok", ok)

    return tag_handler


def test_result_handler_column_flows_to_status_sink(corpus, ray_session):  # noqa: F811
    from spider_ray.pipelines.crawl import run_crawl
    from spider_ray.pipelines.oracle import run_oracle
    from tests.test_crawl_parity import _engine_rows

    shutil.rmtree(OUT_H, ignore_errors=True)
    run_crawl(
        corpus, OUT_H, num_shards=2, fetch_concurrency=2,
        result_handler=_make_tag_handler(),
    )
    eng = _engine_rows(OUT_H, "status.parquet")
    assert eng, "handler run produced no status rows"
    # enrichment column present and correct on EVERY row
    for e in eng:
        assert e["handler_ok"] == (200 <= e["status"] < 300)
    # a pass-through handler must not perturb the oracle-parity seam
    gold = run_oracle(corpus, num_shards=2)["crawl_order"]
    assert len(eng) == len(gold)
    for e, g in zip(eng, gold):
        assert (e["url"], e["fetch_ts"], e["status"], e["gen"]) == (
            g["url"], g["fetch_ts"], g["status"], g["gen"]
        )


def test_result_handler_dropping_required_column_fails_loudly(
    corpus, ray_session  # noqa: F811
):
    from spider_ray.pipelines.crawl import run_crawl

    def dropper(block: pa.Table) -> pa.Table:
        return block.drop_columns(["status"])

    out = OUT_H + "_drop"
    shutil.rmtree(out, ignore_errors=True)
    with pytest.raises(Exception, match="dropped required"):
        run_crawl(
            corpus, out, num_shards=2, fetch_concurrency=2, max_gens=1,
            result_handler=dropper,
        )
    shutil.rmtree(out, ignore_errors=True)
