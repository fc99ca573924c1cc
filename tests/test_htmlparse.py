"""Article HTML parser — the reference's own date/parse unit cases
ported (src/parser/mod.rs:339-440) + extraction-chain checks."""

from datetime import timezone

import pyarrow as pa

from baram_ray.htmlparse import (ArticleParseStage, content_hash,
                                 parse_article, parse_date_string)


def test_parse_iso8601_datetime():
    dt = parse_date_string("2024-12-25T15:45:00+09:00")
    assert dt is not None and dt.strftime("%Y-%m-%d") == "2024-12-25"
    assert dt.tzinfo == timezone.utc and dt.hour == 6


def test_parse_korean_am_format():
    dt = parse_date_string("2024.12.25. 오전 11:30")
    assert (dt.hour, dt.minute) == (2, 30)


def test_parse_korean_pm_format():
    dt = parse_date_string("2024.12.25. 오후 3:45")
    assert (dt.hour, dt.minute) == (6, 45)


def test_parse_korean_noon_and_midnight():
    assert parse_date_string("2024.12.25. 오후 12:00").hour == 3
    dt = parse_date_string("2024.12.25. 오전 12:00")
    assert dt.strftime("%Y-%m-%d") == "2024-12-24" and dt.hour == 15


def test_parse_standard_and_dotted_formats():
    assert parse_date_string("2024-12-25 15:45:00") \
        .strftime("%Y-%m-%d") == "2024-12-25"
    assert parse_date_string("2024.12.25 15:45") \
        .strftime("%Y-%m-%d") == "2024-12-25"
    assert parse_date_string("invalid date") is None


ARTICLE_HTML = """
<html><body>
<div id="title_area"><span>Big <b>News</b></span></div>
<span class="media_end_head_info_datestamp_time"
      datetime="2024-12-25T15:45:00+09:00">2024.12.25. 오후 3:45</span>
<article id="dic_area">Body text &amp; more.</article>
<span class="byline_s">Reporter Kim</span>
</body></html>
"""


def test_parse_article_extraction_chain():
    doc = parse_article("https://x/1", ARTICLE_HTML)
    # #title_area matched first; inner tags stripped, entities decoded
    assert doc["title"] == "Big News"
    assert doc["body"] == "Body text & more."
    assert doc["author"] == "Reporter Kim"
    # datetime ATTRIBUTE preferred over text
    assert doc["published_at"].hour == 6
    assert doc["content_hash"] == content_hash("Big News",
                                               "Body text & more.")


def test_parse_article_date_text_fallback():
    html = ('<div id="title_area"><span>T</span></div>'
            '<div id="dic_area">B</div>'
            '<span class="media_end_head_info_datestamp_time">'
            '2024.12.25. 오후 3:45</span>')
    doc = parse_article("u", html)
    assert doc["published_at"].hour == 6


def test_parse_article_missing_title_is_dropped():
    assert parse_article("u", "<div id='dic_area'>B</div>") is None
    batch = pa.table({"url": pa.array(["a", "b"], pa.string()),
                      "html": pa.array([ARTICLE_HTML, "<p>no</p>"],
                                       pa.string())})
    out = ArticleParseStage()(batch)
    assert out.num_rows == 1 and out["url"].to_pylist() == ["a"]
