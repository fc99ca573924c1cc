"""Markdown corpus source: the reference's parse semantics
(src/commands/index.rs:402-520) + sink→source roundtrip."""

import os

import pyarrow as pa
import pytest

import ray.data

from baram_ray.sources import parse_markdown, read_markdown_dir
from baram_ray.sinks import write_markdown

SF = "/root/testdata/sf0.001"


def test_parse_frontmatter_and_body():
    md = ('---\noid: 001\naid: 42\ncategory: tech\n'
          'publisher: "The Paper"\n---\n\n# Big News\n\nline one\n\n'
          '---\n\nline two\n')
    d = parse_markdown(md, "ignored")
    assert d["id"] == "001_42"
    assert d["title"] == "Big News"
    assert d["category"] == "tech"
    assert d["publisher"] == "The Paper"          # quotes trimmed
    # body: non-empty lines excluding front-matter; the later --- is a
    # CONTENT separator and kept (reference: only first two are special)
    assert d["content"] == "# Big News\n\nline one\n\n---\n\nline two" \
        .replace("\n\n", "\n")


def test_parse_id_from_filename_and_fallbacks():
    d = parse_markdown("no frontmatter\n", "123_456")
    assert (d["oid"], d["aid"], d["id"]) == ("123", "456", "123_456")
    assert d["title"] == "Untitled"
    d2 = parse_markdown("x\n", "plainstem")
    assert (d2["oid"], d2["aid"]) == ("000", "plainstem")


def test_roundtrip_sink_to_source(ray_session, tmp_path):
    out = str(tmp_path / "md")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "lang", "text"]) \
        .limit(50)
    write_markdown(docs, out).materialize()      # one .md per doc
    back = read_markdown_dir(out).to_pandas()
    assert len(back) == 50
    # default sink template: front-matter doc_id/lang + '# Document N'
    # heading + single-line text body — the source must recover both
    src = docs.to_pandas().astype({"doc_id": str}) \
              .sort_values("doc_id").reset_index(drop=True)
    back["doc_id"] = back["path"].str.extract(r"(\d+)\.md$")[0]
    back = back.sort_values("doc_id").reset_index(drop=True)
    assert (back["title"] == "Document " + back["doc_id"]).all()
    # body = heading line + text (blank lines dropped by the reference
    # parser; corpus text is single-line so equality is exact)
    want = ("# Document " + src["doc_id"] + "\n" + src["text"])
    assert (back["content"] == want).all()
