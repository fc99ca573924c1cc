"""Cluster summarization — the reference's ``ClusterSummarizer``
(``src/clustering/summary.rs:12-234``) rebuilt as an actor-pool Ray Data
stage.

The reference calls a vLLM ``/v1/chat/completions`` endpoint
(``summary.rs:137-182``, max_tokens=512, temperature=0.3) per cluster,
then parses the model output: extract a JSON object from markdown code
blocks or raw text (``extract_json``, ``summary.rs:205-234``), read
``title``/``summary`` keys, and fall back to the trimmed raw response as
the summary when parsing fails (``parse_summary_response``,
``summary.rs:184-203``). On a generation ERROR the cluster keeps its
default title (``summarize_all``, ``summary.rs:53-93``).

There is no LLM endpoint (and no network) in this container, so the
client is pluggable: :class:`FakeLlmClient` is a deterministic stand-in
that produces a well-formed ```` ```json ```` response from the prompt
alone; the real HTTP path is honestly gated behind
``NotImplementedError`` (same policy as ``multimodal.py``'s codec
stubs). Everything around the client — prompt construction, response
parsing, fallback semantics, per-cluster error isolation, the actor-pool
batching — is real and tested.
"""

from __future__ import annotations

import json
import re

import pandas as pd

NO_DATE = "날짜 없음"          # reference placeholder for a missing date

# Reference prompt template (summary.rs:95-135): numbered article list,
# then the instruction block asking for a {"title", "summary"} JSON.
_PROMPT_TEMPLATE = """당신은 한국어 뉴스 이벤트 분석 전문가입니다.

다음 뉴스 기사들은 같은 이벤트(사건)를 다루고 있습니다.
이 이벤트에 대해 간결한 제목과 요약을 생성하세요.

## 기사 목록:
{articles_text}
## 규칙:
1. 제목은 20자 이내로 핵심 이벤트를 나타내세요
2. 요약은 2-3문장으로 이벤트의 핵심 내용을 정리하세요
3. 한국어로 작성하세요

## 출력 형식 (JSON):
```json
{{"title": "이벤트 제목", "summary": "이벤트 요약"}}
```

## 결과 (JSON):"""


def build_summary_prompt(articles: list[dict], max_listed: int = 10) -> str:
    """Reference ``build_summary_prompt`` (``summary.rs:95-135``): list
    the first ``max_listed`` articles as ``i. [category] title (date)``
    lines, add the ``... 외 N개 기사`` overflow line when the cluster is
    larger, then the instruction template."""
    lines = []
    for i, a in enumerate(articles[:max_listed]):
        lines.append("{}. [{}] {} ({})\n".format(
            i + 1, a.get("category", ""), a.get("title", ""),
            a.get("published_at") or NO_DATE))
    if len(articles) > max_listed:
        lines.append(f"... 외 {len(articles) - max_listed}개 기사\n")
    return _PROMPT_TEMPLATE.format(articles_text="".join(lines))


def extract_json(text: str) -> str:
    """Reference ``extract_json`` (``summary.rs:205-234``): try a
    ```` ```json ```` fenced block, then any ``` fenced block, then the
    outermost ``{...}`` span, else the trimmed text."""
    start = text.find("```json")
    if start != -1:
        end = text.find("```", start + 7)
        if end != -1:
            return text[start + 7:end].strip()
    start = text.find("```")
    if start != -1:
        after = text[start + 3:]
        nl = after.find("\n")
        content_start = (nl if nl != -1 else -1) + 1
        end = after.find("```", content_start)
        if end != -1:
            return after[content_start:end].strip()
    lb, rb = text.find("{"), text.rfind("}")
    if lb != -1 and rb > lb:
        return text[lb:rb + 1]
    return text.strip()


def parse_summary_response(response: str) -> tuple[str, str]:
    """Reference ``parse_summary_response`` (``summary.rs:184-203``):
    parse the extracted JSON's ``title``/``summary`` (missing keys →
    empty string); if it is not valid JSON, fall back to ``("",
    trimmed_response)`` — the raw text becomes the summary."""
    js = extract_json(response)
    try:
        parsed = json.loads(js)
    except (json.JSONDecodeError, ValueError):
        return "", response.strip()
    if not isinstance(parsed, dict):
        return "", response.strip()
    title = parsed.get("title") or ""
    summary = parsed.get("summary") or ""
    return (title if isinstance(title, str) else "",
            summary if isinstance(summary, str) else "")


class FakeLlmClient:
    """Deterministic stand-in for the reference's vLLM client: a pure
    function of the prompt. It reads the article list back out of the
    prompt (first ``[category]`` tag + number of listed lines) and
    answers in the instructed ```` ```json ```` format — so the full
    build-prompt → generate → extract → parse path is exercised."""

    _LINE = re.compile(r"^\d+\. \[([^\]]*)\]", re.M)

    def is_available(self) -> bool:
        return True

    def generate(self, prompt: str) -> str:
        cats = self._LINE.findall(prompt)
        cat = cats[0] if cats else "미분류"
        title = f"{cat} 이벤트"[:20]       # rule 1: ≤ 20 chars
        summary = (f"{cat} 분류의 기사 {len(cats)}건을 다루는 "
                   f"이벤트입니다. 주요 분류는 {cat}입니다.")
        return ('분석 결과입니다.\n```json\n'
                + json.dumps({"title": title, "summary": summary},
                             ensure_ascii=False)
                + '\n```\n')


class RealLlmClient:
    """The reference's HTTP path (``summary.rs:137-182``): POST
    ``{endpoint}/v1/chat/completions`` with max_tokens=512,
    temperature=0.3 and read ``choices[0].message.content``. Backed by
    ``backends.chat_generate_fn``; constructing without an endpoint
    (argument or ``VLLM_URL`` env) stays an honest error — no blind
    localhost probes."""

    def __init__(self, endpoint: str = "", model: str = ""):
        import os

        from baram_ray import backends
        endpoint = endpoint or os.environ.get("VLLM_URL", "")
        if not endpoint:
            raise NotImplementedError(
                "no vLLM endpoint configured; pass endpoint=... (or set "
                "VLLM_URL), or pass FakeLlmClient (any object with "
                ".generate(prompt)->str) to SummarizeStage instead")
        self.endpoint = endpoint
        self.model = model or os.environ.get("LLM_MODEL", "qwen2.5")
        self._fn = backends.chat_generate_fn(endpoint, self.model)

    def is_available(self) -> bool:
        return True

    def generate(self, prompt: str) -> str:
        return self._fn(prompt)


class SummarizeStage:
    """Actor-pool UDF: one resident LLM client per actor, one generation
    per cluster row (reference ``summarize_all``, ``summary.rs:53-93``).

    Input rows: (event_id, articles_json) where ``articles_json`` is the
    JSON-encoded article list [{category, title, published_at}, ...].
    Output rows: (event_id, title, summary, ok) — on a client error the
    row keeps its default title (== event_id) and empty summary with
    ok=False, matching the reference's keep-default-on-failure loop.
    """

    def __init__(self, client=None, real_llm: bool = False):
        if real_llm:
            # real HTTP arm when an endpoint is configured (VLLM_URL /
            # endpoint arg); raises honestly otherwise
            self.client = RealLlmClient()
        else:
            self.client = client if client is not None else FakeLlmClient()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        event_ids, titles, summaries, oks = [], [], [], []
        for eid, aj in zip(batch["event_id"], batch["articles_json"]):
            title, summary, ok = str(eid), "", False
            try:
                prompt = build_summary_prompt(json.loads(aj))
                t, s = parse_summary_response(self.client.generate(prompt))
                if t:                            # summary.rs:43-47
                    title = t
                summary, ok = s, True
            except Exception:
                pass                             # keep default title
            event_ids.append(str(eid))
            titles.append(title)
            summaries.append(summary)
            oks.append(ok)
        return pd.DataFrame({"event_id": event_ids, "title": titles,
                             "summary": summaries, "ok": oks})


def summarize_clusters(clusters: pd.DataFrame, members,
                       max_listed_members: int = 10,
                       concurrency: int = 2, client=None):
    """EventCluster rows + member Dataset → summarized clusters.

    ``members`` is the (cluster, member_id, category, sim) Dataset from
    :func:`baram_ray.clustering.cluster_events(..., return_members=True)`.
    Per cluster the top ``max_listed_members`` members by (sim desc,
    member_id asc) become the prompt's article list — computed
    distributed via ``groupby(cluster).map_groups`` (bounded output: ≤10
    rows per cluster leaves the exchange, never the member lists), then
    the tiny (clusters × ≤10) listing joins the cluster table and runs
    through the :class:`SummarizeStage` actor pool.
    """
    import ray

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "member_id"],
                          ascending=[False, True]).head(max_listed_members)
        return pd.DataFrame({
            "cluster": g["cluster"].astype("int64"),
            "member_id": g["member_id"].astype("int64"),
            "category": g["category"].astype(str),
        })

    top = (members.groupby("cluster")
                  .map_groups(topk, batch_format="pandas").to_pandas())

    arts: dict[int, list[dict]] = {}
    for _, r in top.iterrows():
        arts.setdefault(int(r["cluster"]), []).append(
            {"category": r["category"],
             "title": f"doc {int(r['member_id'])}",   # corpus has no titles
             "published_at": None})
    rows = [{"event_id": r["event_id"],
             "articles_json": json.dumps(
                 # listed top members + count padding so the overflow
                 # line reflects the TRUE cluster size (article_count)
                 arts.get(int(r["cluster"]), [])
                 + [{}] * max(0, int(r["article_count"])
                              - len(arts.get(int(r["cluster"]), []))))}
            for _, r in clusters.iterrows()]
    out = ray.data.from_items(rows).map_batches(
        SummarizeStage, fn_constructor_kwargs={"client": client},
        batch_format="pandas", concurrency=concurrency)
    return out
