"""Crawl-shaped end-to-end integration: list-page HTML → UrlStage →
article HTML → ArticleParseStage → index build → BM25 — the composed
reference ingest path (crawl → parse → index → search) with every
network hop replaced by deterministic synthetic pages. Rank identity
against an index built directly from the same parquet text proves the
parse chain is lossless for retrieval."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from baram_ray.htmlparse import ArticleParseStage
from baram_ray.index.build import IndexConfig, build_index
from baram_ray.query.engine import QueryEngine
from baram_ray.urls import UrlStage

SF = "/root/testdata/sf0.001"
N_DOCS = 120


def _article_url(doc_id: int) -> str:
    return (f"https://n.news.naver.com/mnews/article/"
            f"{doc_id % 1000:03d}/{doc_id:010d}")


def test_html_ingest_rank_identical(ray_session, tmp_path):
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).slice(0, N_DOCS)
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()

    # 1) list pages (10 articles per page) → UrlStage
    pages = []
    for p in range(0, N_DOCS, 10):
        links = "".join(f'<a href="{_article_url(d)}">x</a>'
                        for d in ids[p:p + 10])
        pages.append({"page_id": p // 10, "html": links})
    urls = (ray.data.from_items(pages)
            .map_batches(UrlStage(), batch_format="pyarrow").to_pandas())
    assert len(urls) == N_DOCS

    # 2) article pages → ArticleParseStage (title/body/date in the
    # GENERAL selector markup)
    by_id = dict(zip(ids, texts))

    def page_of(doc_id: int) -> str:
        return (f'<html><div id="title_area"><span>doc {doc_id}</span>'
                f'</div><span class="media_end_head_info_datestamp_time" '
                f'datetime="2024-12-25T15:45:00+09:00">d</span>'
                f'<article id="dic_area">{by_id[doc_id]}</article></html>')

    art_rows = [{"url": _article_url(d), "html": page_of(d)} for d in ids]
    parsed = (ray.data.from_items(art_rows)
              .map_batches(ArticleParseStage(), batch_format="pyarrow"))
    pdf = parsed.to_pandas()
    assert len(pdf) == N_DOCS
    assert (pdf["body"].sort_values().to_numpy()
            == sorted(texts)).all()

    # 3) write parsed articles as parquet → index build → query
    ing = tmp_path / "ingested.parquet"
    out_tbl = pa.table({
        "doc_id": pa.array([int(u.rsplit("/", 1)[1]) for u in pdf["url"]],
                           pa.int64()),
        "text": pa.array(pdf["body"], pa.string()),
    })
    pq.write_table(out_tbl, str(ing))

    cfg = IndexConfig(fields=("text",), id_cols=(), keep=())
    idx_a = str(tmp_path / "idx_html")
    build_index(str(ing), idx_a, cfg, resume=False)

    direct = tmp_path / "direct.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(direct))
    idx_b = str(tmp_path / "idx_direct")
    build_index(str(direct), idx_b, cfg, resume=False)

    qa, qb = QueryEngine(idx_a), QueryEngine(idx_b)
    for q in ["data processing", "merge sort stream", "hash join"]:
        assert qa.search(q, k=10) == qb.search(q, k=10)
