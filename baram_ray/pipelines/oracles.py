"""DuckDB oracle SQL for every SQL-expressible pipeline (driver contract).

Column names and rounding MATCH the Ray pipelines exactly — the driver
sorts columns by name and value-hashes, so `AS` aliases are load-bearing.
Views pre-registered by the driver: region nation customer supplier part
orders lineitem events documents embeddings.
"""

ORACLES: dict[str, str] = {
    "doc_lang_counts": """
        SELECT lang, count(*) AS n FROM documents GROUP BY lang
    """,
    "doc_source_counts": """
        SELECT source, count(*) AS n FROM documents GROUP BY source
    """,
    "doc_stats": """
        SELECT count(*) AS n_docs,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars,
               round(avg(n_chars), 6) AS avg_chars
        FROM documents
    """,
    "doc_dedup_exact": """
        SELECT sha256(text) AS sha256, min(doc_id) AS doc_id
        FROM documents GROUP BY sha256(text)
    """,
    "doc_top_longest": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 20
    """,
    "doc_token_count": r"""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END
               AS n_tokens
        FROM documents
    """,
    # deterministic sampling/splitting: Knuth multiplicative hash,
    # ((doc_id % 2^32) * 2654435761) % 2^32, exact in HUGEINT
    # (thresholds are floor(rate * 2^32))
    "doc_sample_hash": """
        SELECT doc_id FROM documents
        WHERE ((doc_id % 4294967296) * 2654435761::HUGEINT) % 4294967296
              < 429496729
    """,
    # stratified sample: en at 50% (threshold 2147483648), every other
    # lang at 10% (429496729) — same Knuth hash, per-lang kept counts
    "doc_sample_stratified": """
        SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
        FROM documents
        WHERE ((doc_id % 4294967296) * 2654435761::HUGEINT) % 4294967296
              < CASE WHEN lang = 'en' THEN 2147483648 ELSE 429496729 END
        GROUP BY lang
    """,
    "doc_split_counts": """
        SELECT CASE
                 WHEN h < 3435973836 THEN 'train'
                 WHEN h < 3865470565 THEN 'val'
                 ELSE 'test'
               END AS split,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT ((doc_id % 4294967296) * 2654435761::HUGEINT)
                     % 4294967296 AS h
              FROM documents)
        GROUP BY 1
    """,
    "doc_mix_weighted": """
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   ((doc_id % 4294967296) * 2654435761::HUGEINT)
                   % 4294967296 AS h
            FROM documents)
        WHERE (source = 'src0' AND h < 4294967296)
           OR (source = 'src1' AND h < 2147483648)
           OR (source = 'src2' AND h < 1073741824)
    """,
    # deterministic seeded shuffle: first 20 rows of the hash order
    # (the head set verifies global ORDER, not just membership)
    "doc_shuffle_head": """
        SELECT doc_id,
               CAST(((xor(doc_id, 7) % 4294967296) * 2654435761::HUGEINT)
                    % 4294967296 AS BIGINT) AS shuffle_key
        FROM documents
        ORDER BY shuffle_key, doc_id
        LIMIT 20
    """,
    # benchmark decontamination: probe 8-grams = tokens 4..11 (1-based)
    # of every 50th doc; a doc is contaminated iff any of its 8-grams
    # equals a probe gram (exact token-sequence semantics)
    "doc_decontam": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
        bench AS (SELECT DISTINCT array_to_string(t[4:11], ' ') AS g
                  FROM toks WHERE doc_id % 50 = 0 AND len(t) >= 11),
        grams AS (SELECT doc_id, array_to_string(t[x:x+7], ' ') AS g
                  FROM toks, UNNEST(range(1, len(t) - 6)) AS u(x))
        SELECT DISTINCT doc_id FROM grams JOIN bench USING (g)
    """,
    # Gopher repetition signals: top 2-gram fraction + duplicate 3-gram
    # fraction (docs with >= 3 tokens; exact IEEE divisions both sides)
    "doc_repetition": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
        g2 AS (SELECT doc_id, array_to_string(t[x:x+1], ' ') AS g
               FROM toks, UNNEST(range(1, len(t))) AS u(x)),
        top2 AS (SELECT doc_id,
                        CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
                          AS top2_frac
                 FROM (SELECT doc_id, g, count(*) AS cnt
                       FROM g2 GROUP BY doc_id, g)
                 GROUP BY doc_id),
        g3 AS (SELECT doc_id, array_to_string(t[x:x+2], ' ') AS g
               FROM toks, UNNEST(range(1, len(t) - 1)) AS u(x)),
        dup3 AS (SELECT doc_id,
                        1.0 - CAST(count(DISTINCT g) AS DOUBLE)
                              / CAST(count(*) AS DOUBLE) AS dup3_frac
                 FROM g3 GROUP BY doc_id)
        SELECT doc_id, top2_frac, dup3_frac
        FROM top2 JOIN dup3 USING (doc_id)
    """,
    # G12 tokenizer stats: UNK = token occurrences outside the top-200
    # df vocabulary (df desc, term asc tie-break); exact IEEE ratio
    "doc_unk_stats": r"""
        WITH toks AS (SELECT doc_id,
                             unnest(string_split_regex(
                                 lower(trim(text)), '\s+')) AS term
                      FROM documents WHERE trim(text) <> ''),
        df AS (SELECT term, count(DISTINCT doc_id) AS df
               FROM toks GROUP BY term),
        vocab AS (SELECT term FROM df ORDER BY df DESC, term LIMIT 200),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens,
                       CAST(sum(CASE WHEN term NOT IN
                                     (SELECT term FROM vocab)
                                THEN 1 ELSE 0 END) AS BIGINT) AS unk_tokens
                FROM toks)
        SELECT n_tokens, unk_tokens,
               CAST(unk_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 AS unk_ratio
        FROM tot
    """,
    "doc_term_df_top": r"""
        SELECT term, count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+')) AS term
              FROM documents)
        WHERE term <> ''
        GROUP BY term
        ORDER BY df DESC, term LIMIT 20
    """,
    # index retrieval (postings for one term) + numeric range filter —
    # the SQL-checkable core of the reference's range-filtered search
    # (src/embedding/mod.rs:517-532); the corpus is single-space word
    # text, so whitespace tokens == the index analyzer's tokens here
    "search_term_range": r"""
        SELECT doc_id, n_chars FROM documents
        WHERE list_contains(string_split_regex(lower(text), '\s+'), 'data')
          AND n_chars BETWEEN 100 AND 400
    """,
    # positional-postings retrieval: docs where the words are ADJACENT in
    # token order — regex word-adjacency on the raw text is the exact
    # equivalent for this single-space word-list corpus (the engine side
    # walks posting positions; see query/engine.py match_phrase_docs)
    "phrase_match_docs": r"""
        SELECT CAST(0 AS BIGINT) AS phrase_id, doc_id FROM documents
        WHERE regexp_matches(lower(text),
              '(^|[^a-z0-9_])table[^a-z0-9_]+scan([^a-z0-9_]|$)')
        UNION ALL
        SELECT CAST(1 AS BIGINT), doc_id FROM documents
        WHERE regexp_matches(lower(text),
              '(^|[^a-z0-9_])merge[^a-z0-9_]+sort([^a-z0-9_]|$)')
    """,
    # sloppy phrase retrieval: t1 then t2 with at most `slop` intervening
    # word tokens (ordered span-near slack ≤ slop; 2-token phrases only —
    # the regex quantifier bounds the intervening tokens)
    "phrase_slop_match_docs": r"""
        SELECT CAST(0 AS BIGINT) AS phrase_id, doc_id FROM documents
        WHERE regexp_matches(lower(text),
              '(^|[^a-z0-9_])table([^a-z0-9_]+[a-z0-9_]+){0,1}[^a-z0-9_]+scan([^a-z0-9_]|$)')
        UNION ALL
        SELECT CAST(1 AS BIGINT), doc_id FROM documents
        WHERE regexp_matches(lower(text),
              '(^|[^a-z0-9_])merge([^a-z0-9_]+[a-z0-9_]+){0,2}[^a-z0-9_]+sort([^a-z0-9_]|$)')
    """,
    # boolean retrieval: must AND (≥2 of the should clauses — any term of
    # a clause counts) AND NOT must_not, over whitespace word tokens
    # (single-space corpus: whitespace tokens == analyzer tokens)
    "bool_match_docs": r"""
        WITH w AS (SELECT doc_id,
                          string_split_regex(lower(text), '\s+') AS ws
                   FROM documents)
        SELECT doc_id FROM w
        WHERE list_contains(ws, 'data')
          AND ((CASE WHEN list_contains(ws, 'table')
                       OR list_contains(ws, 'scan') THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(ws, 'merge')
                       OR list_contains(ws, 'sort') THEN 1 ELSE 0 END)) >= 2
          AND NOT list_contains(ws, 'vector')
    """,
    # collapse + metadata sort: longest matching doc per source
    # (n_chars DESC, doc_id ASC ties), top-10 sources by that key —
    # matches the engine's conjunctive match set + vectorized collapse
    "search_collapse_latest": r"""
        WITH w AS (SELECT doc_id, source, n_chars,
                          string_split_regex(lower(text), '\s+') AS ws
                   FROM documents),
        m AS (SELECT doc_id, source, n_chars FROM w
              WHERE list_contains(ws, 'data')
                AND list_contains(ws, 'stream')),
        r AS (SELECT doc_id, source, n_chars,
                     row_number() OVER (
                         PARTITION BY source
                         ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM m)
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, source
        FROM r WHERE rn = 1
        ORDER BY n_chars DESC, doc_id ASC LIMIT 10
    """,
    # query-string retrieval ('+data -vector stream lang:en'): the
    # match set is must + must_not + metadata filter; the should
    # clause ('stream') only scores (engine msm default = 0 when a
    # must clause exists — OpenSearch's rule)
    "search_qs_docs": r"""
        WITH w AS (SELECT doc_id, lang,
                          string_split_regex(lower(text), '\s+') AS ws
                   FROM documents)
        SELECT doc_id FROM w
        WHERE list_contains(ws, 'data')
          AND NOT list_contains(ws, 'vector')
          AND lang = 'en'
        ORDER BY doc_id
    """,
    # regexp retrieval: any whitespace word FULLY matching the anchored
    # pattern (Lucene RegexpQuery semantics == regexp_full_match)
    "regexp_match_docs": r"""
        SELECT CAST(0 AS BIGINT) AS pattern_id, doc_id FROM documents
        WHERE len(list_filter(string_split_regex(lower(text), '\s+'),
                  w -> regexp_full_match(w, 'st(ream|orage)'))) > 0
        UNION ALL
        SELECT CAST(1 AS BIGINT), doc_id FROM documents
        WHERE len(list_filter(string_split_regex(lower(text), '\s+'),
                  w -> regexp_full_match(w, 've.tor'))) > 0
    """,
    # compound-bool retrieval over mixed clause kinds: phrase adjacency
    # (must) AND >=1 of {st-prefix word, 'vector'} (should, msm=1) AND
    # no w?nd* word (must_not) — each predicate matches its dedicated
    # single-kind oracle above
    "search_compound_docs": r"""
        WITH w AS (SELECT doc_id, lower(text) AS lt,
                          string_split_regex(lower(text), '\s+') AS ws
                   FROM documents)
        SELECT doc_id FROM w
        WHERE regexp_matches(lt,
              '(^|[^a-z0-9_])table[^a-z0-9_]+scan([^a-z0-9_]|$)')
          AND ((CASE WHEN len(list_filter(ws, x -> x LIKE 'st%')) > 0
                     THEN 1 ELSE 0 END)
             + (CASE WHEN list_contains(ws, 'vector')
                     THEN 1 ELSE 0 END)) >= 1
          AND len(list_filter(ws, x -> x LIKE 'w_nd%')) = 0
    """,
    # JSON-DSL sorted retrieval: conjunctive match + term filter +
    # metadata sort (n_chars DESC, doc_id ASC ties), top-15
    "search_dsl_sorted": r"""
        WITH w AS (SELECT doc_id, n_chars, lang,
                          string_split_regex(lower(text), '\s+') AS ws
                   FROM documents)
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM w
        WHERE list_contains(ws, 'data') AND list_contains(ws, 'stream')
          AND lang = 'en'
        ORDER BY n_chars DESC, doc_id ASC LIMIT 15
    """,
    # fuzzy retrieval: any whitespace word within 1 Damerau-Levenshtein
    # edit of 'tabel' (DuckDB's damerau_levenshtein matches the engine's
    # transposition-as-one-edit metric)
    "fuzzy_match_docs": r"""
        SELECT doc_id FROM documents
        WHERE len(list_filter(string_split_regex(lower(text), '\s+'),
                              w -> damerau_levenshtein(w, 'tabel') <= 1)) > 0
    """,
    # delete_by_query survivors: docs NOT matching either term query
    # (metadata lang='de'; indexed text term 'vector')
    "delete_by_query_docs": r"""
        SELECT doc_id FROM documents
        WHERE lang <> 'de'
          AND NOT list_contains(
                string_split_regex(lower(text), '\s+'), 'vector')
    """,
    # prefix retrieval: any whitespace word starts with 'st'
    "prefix_match_docs": r"""
        SELECT doc_id FROM documents
        WHERE len(list_filter(string_split_regex(lower(text), '\s+'),
                              w -> w LIKE 'st%')) > 0
    """,
    # wildcard retrieval: any whitespace word matches glob 's?a*'
    # (engine pattern; * -> %, ? -> _ in SQL LIKE)
    "wildcard_match_docs": r"""
        SELECT doc_id FROM documents
        WHERE len(list_filter(string_split_regex(lower(text), '\s+'),
                              w -> w LIKE 's_a%')) > 0
    """,
    "events_type_agg": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(trunc(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_value_u6
        FROM events GROUP BY event_type
    """,
    "events_daily_counts": """
        SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "events_sma7": """
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
            FROM events GROUP BY 1, 2)
        SELECT event_type, day, n,
               round(avg(n) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                     6) AS sma
        FROM daily
    """,
    "events_spikes": """
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
            FROM events GROUP BY 1, 2)
        SELECT event_type, day, n,
               round(CASE WHEN stddev_pop(n) OVER (PARTITION BY event_type) = 0
                          THEN 0.0
                          ELSE (n - avg(n) OVER (PARTITION BY event_type))
                               / stddev_pop(n) OVER (PARTITION BY event_type)
                     END, 6) AS zscore
        FROM daily
    """,
    # percent change between series endpoints (reference percent_change,
    # src/analytics/keyword_trends.rs:367-393; zero baseline -> 100.0)
    "events_pct_change": """
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
            FROM events GROUP BY 1, 2),
        ends AS (
            SELECT event_type, min(day) AS start_day, max(day) AS end_day
            FROM daily GROUP BY 1)
        SELECT e.event_type, e.start_day, e.end_day,
               d0.n AS start_n, d1.n AS end_n,
               round(CASE WHEN d0.n = 0 THEN 100.0
                          ELSE (d1.n - d0.n) * 100.0 / d0.n END, 6)
                   AS pct_change
        FROM ends e
        JOIN daily d0 ON d0.event_type = e.event_type AND d0.day = e.start_day
        JOIN daily d1 ON d1.event_type = e.event_type AND d1.day = e.end_day
    """,
    # alert conditions (reference src/notifications/conditions.rs):
    # epoch-aligned tumbling windows; >= for counts, strict >/< for rates
    "events_alerts": """
        WITH w AS (
            SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w,
                   event_type
            FROM events),
        ks AS (
            SELECT 'keyword_spike' AS condition_type,
                   'Keyword ''click'' appears >3 times in 60min window'
                       AS description,
                   w AS window_start_s,
                   CAST(count(*) AS DOUBLE) AS observed,
                   3.0 AS threshold
            FROM w WHERE event_type = 'click'
            GROUP BY w HAVING count(*) >= 3),
        er AS (
            SELECT 'error_rate_threshold' AS condition_type,
                   'Error rate >25.0% in 60min window' AS description,
                   w AS window_start_s,
                   round(100.0 * sum(CASE WHEN event_type = 'error'
                                          THEN 1 ELSE 0 END) / count(*), 6)
                       AS observed,
                   25.0 AS threshold
            FROM w GROUP BY w
            HAVING round(100.0 * sum(CASE WHEN event_type = 'error'
                                          THEN 1 ELSE 0 END) / count(*), 6)
                   > 25.0),
        td AS (
            SELECT 'throughput_drop' AS condition_type,
                   'Throughput <0.2 articles/min in 60min window'
                       AS description,
                   w AS window_start_s,
                   round(count(*) / 60.0, 6) AS observed,
                   0.2 AS threshold
            FROM w GROUP BY w
            HAVING round(count(*) / 60.0, 6) < 0.2),
        daily AS (
            SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS w,
                   count(*) AS n
            FROM events WHERE event_type = 'error' GROUP BY 1),
        va AS (
            SELECT 'volume_anomaly' AS condition_type,
                   'Article volume in ''error'' exceeds 2.0σ from mean'
                       AS description,
                   w AS window_start_s,
                   round((n - avg(n) OVER ()) / stddev_pop(n) OVER (), 6)
                       AS observed,
                   2.0 AS threshold
            FROM daily
            QUALIFY round((n - avg(n) OVER ())
                          / stddev_pop(n) OVER (), 6) > 2.0)
        SELECT * FROM ks UNION ALL SELECT * FROM er
        UNION ALL SELECT * FROM td UNION ALL SELECT * FROM va
    """,
    # consecutive-failure runs (SourceFailure): gaps-and-islands — a
    # run breaks when a non-error event from the same source intervenes
    "events_source_failures": """
        WITH numbered AS (
            SELECT user_id, ts, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts) AS rn
            FROM events),
        err AS (
            SELECT user_id, ts, rn,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts) AS rn_err
            FROM numbered WHERE event_type = 'error')
        SELECT user_id AS source,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS run_start_s,
               CAST(count(*) AS BIGINT) AS run_len
        FROM err GROUP BY user_id, rn - rn_err
        HAVING count(*) >= 3
    """,
    "events_user_topk": """
        SELECT user_id, count(*) AS n FROM events
        GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(trunc(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
               CAST(sum(CAST(trunc(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_u4,
               CAST(sum(CAST(trunc(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_u6,
               CAST(sum(CAST(trunc(l_discount * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
               count(*) AS count_order,
               round(sum(l_quantity) / count(*), 6) AS avg_qty,
               round(sum(CAST(trunc(l_discount * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(*), 6) AS avg_disc
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_orders_by_status": """
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CAST(trunc(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_c
        FROM orders GROUP BY o_orderstatus
    """,
    "tpch_revenue_by_nation": """
        SELECT n_name, count(*) AS n_orders,
               CAST(sum(CAST(trunc(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    # as-of join: most recent prior-or-equal click per purchase
    # (DuckDB native ASOF LEFT JOIN; DISTINCT right side makes the
    # match unique under timestamp ties — the attached VALUE is
    # tie-safe either way)
    "events_asof_click": """
        SELECT l.event_id, l.user_id, l.ts, r.ts AS click_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') l
        ASOF LEFT JOIN (SELECT DISTINCT user_id, ts FROM events
                        WHERE event_type = 'click') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    # exact per-type median (even-count interpolation) + count
    "events_value_median": """
        SELECT event_type, median(value) AS median_value,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    # fixed-width histogram of event values
    "events_value_hist": """
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
    # KMV distinct sketch: same fixed hash + estimator as the engine —
    # the APPROXIMATE estimate is itself hash-exact (keys = user*1e5+day)
    "events_distinct_kmv": """
        WITH keys AS (
            SELECT DISTINCT event_type,
                   ((key % 4294967296) * 2654435761::HUGEINT)
                   % 4294967296 AS h
            FROM (SELECT event_type,
                         user_id * 100000
                         + CAST(floor(epoch(ts) / 86400) AS BIGINT) AS key
                  FROM events)),
        ranked AS (SELECT event_type, h,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY h) AS rn,
                          count(*) OVER (PARTITION BY event_type) AS nd
                   FROM keys)
        SELECT event_type,
               CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
                    ELSE 63.0 * 4294967296.0 / CAST(h AS DOUBLE) END
                 AS est_distinct
        FROM ranked
        WHERE rn = CASE WHEN nd < 64 THEN nd ELSE 64 END
    """,
    # hopping windows: 2h windows, 1h hop — every event in 2 windows
    "events_hopping_counts": """
        SELECT ws, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest([date_trunc('hour', ts),
                             date_trunc('hour', ts)
                             - INTERVAL 1 HOUR]) AS ws
              FROM events)
        GROUP BY ws
    """,
    # gap-based sessionization: new session when gap > 30 min
    # (lag + windowed-sum gaps-and-islands; ordering (ts, event_id))
    "events_sessions": """
        WITH o AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w
                                > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    # per-user session stats composed on the sessionization CTE
    "events_session_stats": """
        WITH o AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w
                                > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o),
        ses AS (SELECT user_id,
                       (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                           AS dur_s,
                       count(*) AS n_events
                FROM s GROUP BY user_id, sid)
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(n_events) AS BIGINT) AS total_events,
               round(CAST(sum(dur_s) AS DOUBLE) / count(*), 6)
                   AS mean_session_s
        FROM ses GROUP BY user_id
    """,
    "tpch_q3": """
        SELECT l_orderkey,
               CAST(sum(CAST(trunc(l_extendedprice * (1.0 - l_discount)
                                   * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_u4,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-07-01'
          AND l_shipdate > TIMESTAMP '1998-07-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_u4 DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "tpch_top_parts": """
        SELECT l_partkey,
               CAST(sum(CAST(trunc(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_u4
        FROM lineitem GROUP BY l_partkey
        ORDER BY revenue_u4 DESC, l_partkey LIMIT 10
    """,
    "tpch_supplier_by_nation": """
        SELECT n_name, count(*) AS n_suppliers,
               CAST(sum(CAST(trunc(s_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_acctbal_c
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "tpch_orders_top": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    "dedup_ngram_jaccard": r"""
        WITH w AS (SELECT doc_id,
                          string_split_regex(lower(trim(text)), '\s+') AS ws
                   FROM documents WHERE trim(text) <> ''),
        g AS (
            SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(ws) >= 2 THEN
                    list_transform(range(1, len(ws)),
                                   i -> ws[i] || ' ' || ws[i+1])
                ELSE [ws[1]] END)) AS gram
            FROM w
        ),
        sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT i.a, i.b,
               round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6)
                   AS jaccard
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.a
        JOIN sz sb ON sb.doc_id = i.b
        WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.5
    """,
    # embeddings are float32 on disk; cast to DOUBLE so DuckDB's cosine is
    # f64 like numpy's (float32 paths disagree in the 4th decimal)
    "sim_knn_bruteforce": """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id IN (0, 1, 2)),
        s AS (SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS c
              FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        SELECT query_id, vec_id, round(c, 6) AS cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY c DESC, vec_id) AS rank
        FROM s QUALIFY rank <= 5
    """,
    # cosine RANGE search: all matches at >= 0.3, no limit
    "sim_range_search": """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id IN (0, 1, 2))
        SELECT q.query_id, e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.qv), 6) AS cosine
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id
          AND list_cosine_similarity(e.embedding::DOUBLE[], q.qv) >= 0.3
    """,
    # TPC-H Q13: count-of-counts histogram incl zero-order customers
    "tpch_q13": """
        WITH pc AS (SELECT c_custkey,
                           count(o_orderkey) AS c_count
                    FROM customer LEFT JOIN orders
                      ON o_custkey = c_custkey
                    GROUP BY c_custkey)
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM pc GROUP BY c_count
    """,
    "sim_neardup_pairs": """
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6)
                   AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]) >= 0.35
    """,
    "sim_centroid_assign": """
        WITH c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv
                   FROM embeddings ORDER BY vec_id LIMIT 8),
        s AS (SELECT e.vec_id,
                     arg_max(c.c_id,
                             list_cosine_similarity(e.embedding::DOUBLE[], c.cv))
                         AS centroid,
                     max(list_cosine_similarity(e.embedding::DOUBLE[], c.cv))
                         AS best
              FROM embeddings e, c GROUP BY e.vec_id)
        SELECT centroid, count(*) AS n, round(avg(best), 6) AS mean_cos
        FROM s GROUP BY centroid
    """,
    "tpch_part_brand_stats": """
        SELECT p_brand, count(*) AS n,
               CAST(sum(CAST(trunc(p_retailprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c,
               round(sum(CAST(trunc(p_retailprice * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(*), 6) AS avg_price,
               CAST(max(p_size) AS BIGINT) AS max_size
        FROM part GROUP BY p_brand
    """,
    # Holt double-exponential smoothing unrolled EXACTLY via a
    # recursive CTE: the anchor is (level=y0, trend=y1-y0), each step
    # applies the engine's update in the SAME operation order
    # (alpha=0.5, beta=0.3 written as literals; (1.0 - 0.5) and
    # (1.0 - 0.3) fold to the same doubles Python computes); the level
    # expression is repeated inside the trend term — identical IEEE
    # ops, so bit-identical to referencing it once. Series are
    # zero-filled per type over [lo, hi] epoch days, types with a
    # single day are skipped (len(series) < 2), forecasts are
    # level + h*trend for h = 1..7, round-6 at the very end only.
    "events_forecast_holt": r"""
        WITH RECURSIVE
        d AS (SELECT event_type,
                     date_diff('day', DATE '1970-01-01',
                               CAST(ts AS DATE)) AS day,
                     CAST(count(*) AS DOUBLE) AS y
              FROM events GROUP BY 1, 2),
        rng AS (SELECT event_type, min(day) AS lo, max(day) AS hi
                FROM d GROUP BY 1 HAVING max(day) > min(day)),
        series AS (SELECT r.event_type, t.day - r.lo AS i,
                          COALESCE(d.y, CAST(0.0 AS DOUBLE)) AS y
                   FROM rng r
                   CROSS JOIN UNNEST(generate_series(r.lo, r.hi))
                        AS t(day)
                   LEFT JOIN d ON d.event_type = r.event_type
                              AND d.day = t.day),
        rec AS (
          SELECT s0.event_type, CAST(1 AS BIGINT) AS i,
                 s0.y AS level, s1.y - s0.y AS trend
          FROM series s0
          JOIN series s1 ON s1.event_type = s0.event_type AND s1.i = 1
          WHERE s0.i = 0
          UNION ALL
          SELECT r.event_type, r.i + 1,
                 0.5 * s.y + (1.0 - 0.5) * (r.level + r.trend) AS level,
                 0.3 * ((0.5 * s.y + (1.0 - 0.5) * (r.level + r.trend))
                        - r.level) + (1.0 - 0.3) * r.trend AS trend
          FROM rec r JOIN series s ON s.event_type = r.event_type
                                  AND s.i = r.i),
        fin AS (SELECT event_type, level, trend,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY i DESC) AS rn
                FROM rec),
        hz AS (SELECT UNNEST(generate_series(1, 7)) AS h)
        SELECT f.event_type, CAST(r.hi + hz.h AS BIGINT) AS day,
               round(f.level + CAST(hz.h AS DOUBLE) * f.trend, 6)
                   AS forecast
        FROM fin f JOIN rng r ON r.event_type = f.event_type
        CROSS JOIN hz
        WHERE f.rn = 1
    """,
    "events_velocity": """
        WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                          count(*) AS n
                   FROM events GROUP BY 1, 2),
        w AS (SELECT event_type, day, n,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY day DESC) AS rn
              FROM d QUALIFY rn <= 14),
        x AS (SELECT event_type, n,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY day) - 1 AS i
              FROM w),
        s AS (SELECT event_type, count(*) AS np, sum(i) AS sx,
                     sum(n) AS sy, sum(i*i) AS sxx, sum(i*n) AS sxy
              FROM x GROUP BY 1)
        SELECT event_type,
               round(CASE WHEN np*sxx - sx*sx = 0 OR sy = 0 THEN 0.0
                     ELSE greatest(-1.0, least(1.0,
                          CAST((np*sxy - sx*sy) * np AS DOUBLE)
                          / (CAST(np*sxx - sx*sx AS BIGINT) * sy)))
                     END, 6) AS velocity
        FROM s
    """,
    "events_minmax": """
        WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                          count(*) AS n
                   FROM events GROUP BY 1, 2),
        mm AS (SELECT event_type, min(n) AS lo, max(n) AS hi
               FROM d GROUP BY 1)
        SELECT d.event_type, d.day, d.n,
               round(CASE WHEN hi = lo THEN 0.0
                     ELSE CAST(d.n - lo AS DOUBLE) / (hi - lo) END, 6)
                   AS norm
        FROM d JOIN mm ON mm.event_type = d.event_type
    """,
    "doc_cooccur_pmi": r"""
        WITH t AS (SELECT doc_id, unnest(list_distinct(
                       string_split_regex(lower(trim(text)), '\s+'))) AS term
                   FROM documents WHERE trim(text) <> ''),
        p AS (SELECT a.term AS a, b.term AS b
              FROM t a JOIN t b
                ON a.doc_id = b.doc_id AND a.term < b.term),
        pc AS (SELECT a, b, count(*) AS c_ab FROM p GROUP BY 1, 2),
        s AS (SELECT term, count(*) AS c FROM t GROUP BY 1),
        n AS (SELECT count(*) AS total FROM documents)
        SELECT pc.a, pc.b, c_ab,
               round(log2(CAST(c_ab * total AS DOUBLE) / (sa.c * sb.c)), 6)
                   AS pmi
        FROM pc, n
        JOIN s sa ON sa.term = pc.a
        JOIN s sb ON sb.term = pc.b
        WHERE c_ab >= 5
    """,
    "cluster_label_stats": """
        WITH e AS (SELECT vec_id, label,
                          unnest(embedding::DOUBLE[]) AS v,
                          unnest(range(1, len(embedding) + 1)) AS dim
                   FROM embeddings),
        c AS (SELECT label, dim, sum(v) AS sv, count(*) AS cnt
              FROM e GROUP BY 1, 2),
        m AS (SELECT e.vec_id, e.label,
                     sum(e.v * (c.sv / c.cnt)) AS dot,
                     sqrt(sum(e.v * e.v)) AS nv
              FROM e JOIN c ON c.label = e.label AND c.dim = e.dim
              GROUP BY 1, 2),
        cn AS (SELECT label, sqrt(sum((sv/cnt)*(sv/cnt))) AS nc
               FROM c GROUP BY 1)
        SELECT CAST(m.label AS BIGINT) AS label, count(*) AS n,
               round(avg(m.dot / (m.nv * cn.nc)), 4) AS mean_cos
        FROM m JOIN cn ON cn.label = m.label GROUP BY 1
    """,
    "doc_chunks": r"""
        WITH d AS (SELECT doc_id,
                          len(string_split_regex(trim(text), '\s+')) AS n
                   FROM documents WHERE trim(text) <> ''),
        c AS (SELECT doc_id, n, unnest(range(0,
                  CAST(ceil(CAST(n AS DOUBLE) / 48) AS BIGINT) + 1)) AS ci
              FROM d)
        SELECT doc_id, ci AS chunk_index, ci * 48 AS start_tok,
               least(64, n - ci * 48) AS n_tokens
        FROM c
        WHERE ci * 48 < n AND (ci = 0 OR ci * 48 + 16 < n)
    """,
    "text_ner": r"""
        WITH tool AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                          '\b(spark|hash|vector|stream)\b', 1)) AS entity
                      FROM documents),
        op AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                   '\b(join|sort|merge|scan|filter|agg)\b', 1)) AS entity
               FROM documents)
        SELECT doc_id, 'tool' AS entity_type, entity,
               count(*) AS n_mentions, 0.8 AS confidence,
               true AS verified
        FROM tool GROUP BY 1, 3
        UNION ALL
        SELECT doc_id, 'op', entity, count(*), 0.6, true
        FROM op GROUP BY 1, 3
    """,
    # M3 format dispatch: the corpus is plain single-space text, so the
    # dispatcher must pick 'plain' and pass content through unmangled
    # (html/markdown/json branches + fallback order are unit-tested)
    "doc_parse_dispatch": """
        SELECT doc_id,
               CASE WHEN text IS NULL OR trim(text) = ''
                    THEN 'unknown' ELSE 'plain' END AS format_used,
               (text IS NOT NULL AND trim(text) <> '') AS parse_ok,
               CASE WHEN text IS NULL OR trim(text) = ''
                    THEN 0 ELSE n_chars END AS n_chars_out
        FROM documents
    """,
    # M16 embedding text prep: '{title} {content}' concat + 512-token
    # truncation (reference src/commands/index.rs:274 +
    # vectorize.rs:287; source stands in for title on this table)
    "doc_embed_prep": r"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(source || ' ' || text),
                                             '\s+') AS toks
                   FROM documents)
        SELECT doc_id,
               array_to_string(toks[1:512], ' ') AS embed_text,
               least(512, len(toks)) AS n_tokens
        FROM t
    """,
    # M10 relations: the same two relation regexes evaluated by DuckDB
    # (corpus has no sentence punctuation, so whole-text scan == the
    # pipeline's sentence-scoped scan; both engines use non-overlapping
    # leftmost matching)
    "text_relations": r"""
        WITH ap AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                 '\b(spark|hash|vector|stream) (join|sort|merge|scan|filter|agg)\b',
                 0)) AS m
              FROM documents),
        fp AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                 '\b(join|sort|merge|scan|filter|agg) (spark|hash|vector|stream)\b',
                 0)) AS m
              FROM documents),
        r AS (
            SELECT doc_id, string_split(m, ' ')[1] AS subject,
                   'applies' AS predicate, string_split(m, ' ')[2] AS object
            FROM ap
            UNION ALL
            SELECT doc_id, string_split(m, ' ')[1], 'feeds',
                   string_split(m, ' ')[2]
            FROM fp)
        SELECT doc_id, subject, predicate, object, count(*) AS n,
               0.8 AS confidence, true AS verified
        FROM r GROUP BY 1, 2, 3, 4
    """,
    "triple_stats": r"""
        WITH ap AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                 '\b(spark|hash|vector|stream) (join|sort|merge|scan|filter|agg)\b',
                 0)) AS m
              FROM documents),
        fp AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                 '\b(join|sort|merge|scan|filter|agg) (spark|hash|vector|stream)\b',
                 0)) AS m
              FROM documents),
        r AS (
            SELECT doc_id, string_split(m, ' ')[1] AS subject,
                   'applies' AS predicate, string_split(m, ' ')[2] AS object
            FROM ap
            UNION ALL
            SELECT doc_id, string_split(m, ' ')[1], 'feeds',
                   string_split(m, ' ')[2]
            FROM fp)
        SELECT predicate, count(*) AS n_triples,
               count(DISTINCT doc_id) AS n_docs,
               count(DISTINCT subject) AS n_subjects,
               count(DISTINCT object) AS n_objects
        FROM r GROUP BY 1
    """,
    "events_props_json": """
        SELECT event_type, count(*) AS n,
               CAST(sum(COALESCE(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT), 0)) AS BIGINT) AS sum_k,
               max(COALESCE(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT), 0)) AS max_k
        FROM events GROUP BY 1
    """,
    "join_orders_cust_segment": """
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(trunc(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_c
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY 1
    """,
    "join_anti_cust_no_orders": """
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1
    """,
    "text_entity_link": r"""
        WITH kb(alias, canonical) AS (VALUES
            ('spark','apache-spark'), ('hash','hash-function'),
            ('vector','vector-type'), ('stream','data-stream'),
            ('join','op:join'), ('sort','op:sort'), ('merge','op:merge'),
            ('scan','op:scan'), ('filter','op:filter'),
            ('agg','op:aggregate')),
        tool AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                     '\b(spark|hash|vector|stream)\b', 1)) AS entity
                 FROM documents),
        op AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                   '\b(join|sort|merge|scan|filter|agg)\b', 1)) AS entity
               FROM documents),
        ner AS (
            SELECT doc_id, 'tool' AS entity_type, entity,
                   count(*) AS n_mentions FROM tool GROUP BY 1, 3
            UNION ALL
            SELECT doc_id, 'op', entity, count(*) FROM op GROUP BY 1, 3)
        SELECT kb.canonical, ner.entity_type,
               count(*) AS n_docs,
               CAST(sum(ner.n_mentions) AS BIGINT) AS n_mentions
        FROM ner JOIN kb ON kb.alias = ner.entity
        GROUP BY 1, 2
    """,
    # per-doc top-3 TF-IDF keywords: tf and df over whitespace-lower
    # tokens, score = tf * ln(N/df) rounded to 6 decimals on both sides
    # (same ulp treatment as doc_cooccur_pmi); ties broken term-asc on
    # the ROUNDED score
    "doc_tfidf_top": r"""
        WITH tok AS (SELECT doc_id,
                            unnest(string_split_regex(lower(trim(text)),
                                                      '\s+')) AS term
                     FROM documents WHERE trim(text) <> ''),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM tok WHERE term <> '' GROUP BY 1, 2),
        df AS (SELECT term, count(DISTINCT doc_id) AS df
               FROM tok WHERE term <> '' GROUP BY 1),
        n AS (SELECT count(*) AS total FROM documents),
        s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                     round(tf.tf * ln(CAST(total AS DOUBLE) / df.df), 6)
                         AS tfidf
              FROM tf JOIN df USING (term), n),
        r AS (SELECT *, row_number() OVER (
                  PARTITION BY doc_id
                  ORDER BY tfidf DESC, term ASC) AS rn
              FROM s)
        SELECT doc_id, term, tf, df, tfidf FROM r WHERE rn <= 3
    """,
    # entity co-occurrence network with PMI (reference EntityNetwork,
    # src/analytics/entity_trends.rs:345-492): common-doc counts per
    # NER entity pair, PMI = log2(p_ab/(p_a*p_b)) over doc
    # probabilities with N = docs holding >=1 entity, pairs with
    # n_docs < 2 dropped (find_related's min_count)
    "entity_related": r"""
        WITH ner AS (
          SELECT DISTINCT doc_id, entity FROM (
            SELECT doc_id, unnest(regexp_extract_all(lower(text),
                '\b(spark|hash|vector|stream)\b', 1)) AS entity
            FROM documents
            UNION ALL
            SELECT doc_id, unnest(regexp_extract_all(lower(text),
                '\b(join|sort|merge|scan|filter|agg)\b', 1)) AS entity
            FROM documents)),
        n AS (SELECT count(DISTINCT doc_id) AS total FROM ner),
        s AS (SELECT entity, count(*) AS c FROM ner GROUP BY 1),
        p AS (SELECT a.entity AS entity_a, b.entity AS entity_b,
                     count(*) AS n_docs
              FROM ner a JOIN ner b
                ON a.doc_id = b.doc_id AND a.entity < b.entity
              GROUP BY 1, 2)
        SELECT entity_a, entity_b, n_docs,
               round(log2(CAST(n_docs * total AS DOUBLE)
                          / (sa.c * sb.c)), 6) AS pmi
        FROM p, n
        JOIN s sa ON sa.entity = p.entity_a
        JOIN s sb ON sb.entity = p.entity_b
        WHERE n_docs >= 2
    """,
    # PageRank over the entity co-occurrence graph: 3 unrolled power
    # iterations, damping 0.85 written as (1.0 - 0.85) exactly like the
    # engine computes it; round-6 absorbs per-dst sum order
    "entity_pagerank": r"""
        WITH ner AS (
          SELECT DISTINCT doc_id, entity FROM (
            SELECT doc_id, unnest(regexp_extract_all(lower(text),
                '\b(spark|hash|vector|stream)\b', 1)) AS entity
            FROM documents
            UNION ALL
            SELECT doc_id, unnest(regexp_extract_all(lower(text),
                '\b(join|sort|merge|scan|filter|agg)\b', 1)) AS entity
            FROM documents)),
        p AS (SELECT a.entity AS ea, b.entity AS eb, count(*) AS n_docs
              FROM ner a JOIN ner b
                ON a.doc_id = b.doc_id AND a.entity < b.entity
              GROUP BY 1, 2 HAVING count(*) >= 2),
        e AS (SELECT ea AS src, eb AS dst FROM p
              UNION ALL SELECT eb, ea FROM p),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM deg),
        r0 AS (SELECT src AS node, 1.0::DOUBLE / nn AS pr FROM deg, n),
        r1 AS (SELECT e.dst AS node,
                      (1.0::DOUBLE - 0.85::DOUBLE) / nn
                      + 0.85::DOUBLE * sum(r0.pr / deg.deg) AS pr
               FROM e JOIN r0 ON r0.node = e.src
                      JOIN deg ON deg.src = e.src, n
               GROUP BY e.dst, nn),
        r2 AS (SELECT e.dst AS node,
                      (1.0::DOUBLE - 0.85::DOUBLE) / nn
                      + 0.85::DOUBLE * sum(r1.pr / deg.deg) AS pr
               FROM e JOIN r1 ON r1.node = e.src
                      JOIN deg ON deg.src = e.src, n
               GROUP BY e.dst, nn),
        r3 AS (SELECT e.dst AS node,
                      (1.0::DOUBLE - 0.85::DOUBLE) / nn
                      + 0.85::DOUBLE * sum(r2.pr / deg.deg) AS pr
               FROM e JOIN r2 ON r2.node = e.src
                      JOIN deg ON deg.src = e.src, n
               GROUP BY e.dst, nn)
        SELECT node AS entity, round(pr, 6) AS pr FROM r3
    """,
    # PII scrub: doc_id-derived deterministic contact strings appended
    # on BOTH sides (the corpus itself has no PII), then the SAME
    # RE2-safe patterns applied in the SAME nesting order
    # (email -> ipv4 -> phone), counts taken at each stage, sha256 of
    # the fully-redacted text compared end-to-end
    "text_pii": r"""
        WITH a AS (SELECT doc_id,
                          text || ' contact user' || doc_id || '@mail'
                               || (doc_id % 7) || '.com srv 10.'
                               || (doc_id % 256) || '.'
                               || ((doc_id * 7) % 256) || '.'
                               || ((doc_id * 13) % 256) || ' tel 010-'
                               || (1000 + doc_id % 9000) || '-'
                               || (2000 + doc_id % 8000) AS t0
                   FROM documents),
        e AS (SELECT doc_id,
                     len(regexp_extract_all(t0,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                         AS n_email,
                     regexp_replace(t0,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g') AS t1
              FROM a),
        i AS (SELECT doc_id, n_email,
                     len(regexp_extract_all(t1,
                         '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ipv4,
                     regexp_replace(t1,
                         '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b',
                         '<IP>', 'g') AS t2
              FROM e),
        p AS (SELECT doc_id, n_email, n_ipv4,
                     len(regexp_extract_all(t2,
                         '\b01[0-9]-[0-9]{3,4}-[0-9]{4}\b')) AS n_phone,
                     regexp_replace(t2,
                         '\b01[0-9]-[0-9]{3,4}-[0-9]{4}\b',
                         '<PHONE>', 'g') AS t3
              FROM i)
        SELECT doc_id, n_email, n_ipv4, n_phone,
               sha256(t3) AS redacted_sha
        FROM p
    """,
    # duplicate-span exposure (Lee et al. 2022): distinct 5-token spans
    # per doc, span doc-frequency over the corpus, per-doc count and
    # fraction of spans shared with another doc
    "doc_dup_spans": r"""
        WITH tok AS (SELECT doc_id,
                            string_split_regex(lower(trim(text)),
                                               '\s+') AS ts
                     FROM documents WHERE trim(text) <> ''),
        g AS (SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS gram
              FROM tok, unnest(range(1, len(ts) - 3)) AS t(i)),
        gg AS (SELECT DISTINCT doc_id, gram FROM g),
        df AS (SELECT gram, count(*) AS d FROM gg GROUP BY 1)
        SELECT gg.doc_id,
               count(*) FILTER (d > 1) AS n_dup_grams,
               count(*) AS n_grams,
               round(CAST(count(*) FILTER (d > 1) AS DOUBLE)
                     / count(*), 6) AS dup_frac
        FROM gg JOIN df USING (gram)
        GROUP BY 1
    """,
    # windowed range join: clicks per user in the hour before each
    # purchase, bounds (ts - 60min, ts]
    "events_range_clicks": """
        SELECT p.event_id, p.ts, p.user_id,
               CAST(count(c.event_id) AS BIGINT) AS n_clicks_1h
        FROM events p
        LEFT JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click'
         AND c.ts > p.ts - INTERVAL 60 MINUTE AND c.ts <= p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY 1, 2, 3
    """,
    # markdown sink -> source roundtrip recovers the original text
    "doc_markdown_roundtrip": """
        SELECT doc_id, text FROM documents
    """,
    # TPC-H Q6 shape: pure predicate scan + global exact scaled-integer
    # sum (empty-window COALESCE on both sides)
    "tpch_q6": """
        SELECT CAST(COALESCE(sum(CAST(trunc(l_extendedprice * l_discount
                                            * 10000 + 0.5) AS BIGINT)), 0)
                    AS BIGINT) AS revenue_u4,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 24
    """,
    # TPC-H Q5 shape: six-table join, region fixed to the first name,
    # local-supplier constraint c_nationkey = s_nationkey
    "tpch_q5": """
        WITH r AS (SELECT r_regionkey FROM region
                   WHERE r_name = (SELECT min(r_name) FROM region)),
        n AS (SELECT n_nationkey, n_name FROM nation
              WHERE n_regionkey IN (SELECT r_regionkey FROM r))
        SELECT n.n_name,
               CAST(sum(CAST(trunc(l_extendedprice * (1 - l_discount)
                                   * 10000 + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_u4
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN n        ON n.n_nationkey = c_nationkey
                     AND s_nationkey = c_nationkey
        GROUP BY 1
    """,
    # TPC-H Q18 shape: HAVING over per-order quantity sums (quantities
    # are integer-valued doubles, so the sum is order-independent and
    # exact) + join back to orders/customer; deterministic top-k
    "tpch_q18": """
        WITH t AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                   FROM lineitem GROUP BY 1
                   HAVING sum(l_quantity) > 150.0)
        SELECT t.l_orderkey, t.sum_qty, c_name, o_orderdate,
               CAST(trunc(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS o_totalprice_c
        FROM t
        JOIN orders   ON o_orderkey = t.l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice_c DESC, o_orderdate, t.l_orderkey
        LIMIT 20
    """,
    # S8 comment JSONP roundtrip: the same deterministic field mapping
    # computed directly from events; hash equality proves the JSONP
    # parse chain (callback regex, visibility filter, tag strip, entity
    # decode) is lossless
    "events_comments_stats": """
        SELECT CAST(event_id % 50 AS BIGINT) AS article_id,
               CAST(count(*) AS BIGINT) AS n_comments,
               CAST(sum(CASE WHEN event_id % 5 = 0 AND event_id > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_replies,
               CAST(sum(CASE WHEN event_id % 10 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_best,
               CAST(sum(user_id % 100) AS BIGINT) AS sum_likes,
               CAST(sum(length(event_type) + 5) AS BIGINT)
                   AS content_chars
        FROM events
        WHERE event_id % 11 != 0 AND event_id % 13 != 0
        GROUP BY 1
    """,
    # top entities per type by total mentions (reference top_entities)
    "entity_top": r"""
        WITH tool AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                          '\b(spark|hash|vector|stream)\b', 1)) AS entity
                      FROM documents),
        op AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                   '\b(join|sort|merge|scan|filter|agg)\b', 1)) AS entity
               FROM documents),
        ner AS (
            SELECT doc_id, 'tool' AS entity_type, entity,
                   count(*) AS n FROM tool GROUP BY 1, 3
            UNION ALL
            SELECT doc_id, 'op', entity, count(*) FROM op GROUP BY 1, 3),
        agg AS (SELECT entity_type, entity,
                       CAST(sum(n) AS BIGINT) AS total_mentions,
                       CAST(count(*) AS BIGINT) AS n_docs
                FROM ner GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (
                  PARTITION BY entity_type
                  ORDER BY total_mentions DESC, entity ASC) AS rn
              FROM agg)
        SELECT entity_type, entity, total_mentions, n_docs
        FROM r WHERE rn <= 5
    """,
    # exact discrete per-type quantiles (quantile_disc convention)
    "events_value_quantiles": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.95) AS p95,
               quantile_disc(value, 0.99) AS p99
        FROM events GROUP BY event_type
    """,
    # type-token ratio per doc: exact IEEE division, no rounding
    "doc_ttr": r"""
        WITH tok AS (SELECT doc_id,
                            string_split_regex(lower(trim(text)),
                                               '\s+') AS toks
                     FROM documents WHERE trim(text) <> '')
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
               CAST(len(list_distinct(toks)) AS DOUBLE)
                   / len(toks) AS ttr
        FROM tok
    """,
    # Gini of per-user activity: identical sorted-rank closed form
    "events_user_gini": """
        WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        r AS (SELECT CAST(n AS DOUBLE) AS x,
                     CAST(row_number() OVER (ORDER BY n, user_id)
                          AS DOUBLE) AS i
              FROM c),
        s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     sum(i * x) AS six, sum(x) AS sx FROM r)
        SELECT CAST(n AS BIGINT) AS n_users,
               round((2.0 * six) / (n * sx) - (n + 1.0) / n, 6) AS gini
        FROM s
    """,
    # MAD robust outliers: discrete-quantile medians on both sides,
    # no rounding anywhere (bit-deterministic)
    "events_value_outliers_mad": """
        WITH m AS (SELECT event_type,
                          quantile_disc(value, 0.5) AS med
                   FROM events GROUP BY 1),
        d AS (SELECT e.event_type, e.value, m.med,
                     abs(e.value - m.med) AS dev
              FROM events e JOIN m USING (event_type)),
        md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
               FROM d GROUP BY 1)
        SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
               any_value(d.med) AS med, any_value(md.mad) AS mad,
               CAST(count(*) FILTER (WHERE d.dev > 3.0 * md.mad)
                    AS BIGINT) AS n_outliers
        FROM d JOIN md USING (event_type)
        GROUP BY d.event_type
    """,
    # Zipf slope: identical closed-form regression over the term table
    "doc_zipf_slope": r"""
        WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)),
                                                      '\s+')) AS term
                     FROM documents WHERE trim(text) <> ''),
        c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC,
                                             term ASC) AS rnk
              FROM c),
        s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     sum(ln(CAST(rnk AS DOUBLE))) AS sx,
                     sum(ln(CAST(cnt AS DOUBLE))) AS sy,
                     sum(ln(CAST(rnk AS DOUBLE))
                         * ln(CAST(cnt AS DOUBLE))) AS sxy,
                     sum(ln(CAST(rnk AS DOUBLE))
                         * ln(CAST(rnk AS DOUBLE))) AS sxx
              FROM r)
        SELECT CAST(n AS BIGINT) AS n_terms,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                   AS zipf_slope
        FROM s
    """,
    # weekly DAU/WAU stickiness (epoch-aligned weeks; avg over a fixed
    # 7-day denominator; round-6 on outputs only)
    "events_dau_wau": """
        WITH w AS (SELECT DISTINCT user_id,
                          CAST(floor(epoch(ts) / 86400.0) AS BIGINT)
                              AS day,
                          CAST(floor(epoch(ts) / 86400.0) AS BIGINT) // 7
                              AS week
                   FROM events),
        d AS (SELECT week, day, count(DISTINCT user_id) AS dau
              FROM w GROUP BY 1, 2),
        a AS (SELECT week, count(DISTINCT user_id) AS wau
              FROM w GROUP BY 1),
        s AS (SELECT week, CAST(sum(dau) AS DOUBLE) / 7.0 AS avg_dau
              FROM d GROUP BY 1)
        SELECT a.week, CAST(a.wau AS BIGINT) AS wau,
               round(s.avg_dau, 6) AS avg_dau,
               round(s.avg_dau / a.wau, 6) AS stickiness
        FROM a JOIN s USING (week)
    """,
    # _count surface: conjunctive match-set size
    "search_count": r"""
        SELECT CAST(count(*) AS BIGINT) AS n_hits
        FROM documents
        WHERE list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'data')
          AND list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'stream')
    """,
    # per-user event-type transition matrix (lag window, ties by
    # event_id — the engine sorts by (ts, event_id) identically)
    "events_transitions": """
        WITH o AS (SELECT user_id, event_type,
                          lead(event_type) OVER (
                              PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_type
                   FROM events)
        SELECT event_type AS prev_type, next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM o WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    """,
    # ROLLUP(region, nation) revenue from exact scaled-int sums
    "tpch_revenue_rollup": """
        WITH base AS (
          SELECT r_name, n_name,
                 CAST(sum(CAST(trunc(o_totalprice * 100.0 + 0.5)
                               AS BIGINT)) AS BIGINT) AS revenue_c
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name)
        SELECT 'nation' AS level, n_name AS name, revenue_c FROM base
        UNION ALL
        SELECT 'region', r_name, CAST(sum(revenue_c) AS BIGINT)
        FROM base GROUP BY r_name
        UNION ALL
        SELECT 'all', 'all', CAST(sum(revenue_c) AS BIGINT) FROM base
    """,
    # ISO dow x hour activity heatmap
    "events_heatmap": """
        SELECT CAST(isodow(ts) AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hour,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    """,
    # TPC-H Q16 shape: distinct suppliers per (brand, size)
    "tpch_q16": """
        SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_size
    """,
    # per-user lifetime summary
    "events_user_lifetime": """
        SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
               CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                    AS BIGINT) AS lifetime_sec,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    """,
    # sketch-path quantiles: identical oracle to events_value_quantiles
    # (exact regime at sf <= 0.01 — per-type counts stay under k)
    "events_value_quantiles_sketch": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.95) AS p95,
               quantile_disc(value, 0.99) AS p99
        FROM events GROUP BY event_type
    """,
    # TPC-H Q10 shape: returned-item revenue per customer, one quarter
    "tpch_q10": """
        SELECT c_custkey, c_name, c_acctbal,
               CAST(sum(CAST(trunc(l_extendedprice * (1 - l_discount)
                                   * 10000 + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_u4
        FROM customer
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= DATE '1997-10-01'
          AND o_orderdate < DATE '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue_u4 DESC, c_custkey
        LIMIT 20
    """,
    # sanitize chain on decorated docs (see pipelines/training.py
    # text_sanitize docstring): both sides wrap the text in the same
    # tags/entities/ctrl/zero-width/whitespace junk, then run the same
    # ordered chain — hash equality proves each step
    "text_sanitize": r"""
        WITH d AS (
          SELECT doc_id,
                 '<div id="d">' || coalesce(text, '') || '</div>'
                 || chr(7)
                 || '&amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;'
                 || chr(8203) || '  ' || chr(9) || ' x'
                 || repeat(chr(10), 4) || '  end  ' AS t
          FROM documents),
        c AS (
          SELECT doc_id,
            trim(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      replace(replace(replace(replace(replace(replace(
                        regexp_replace(
                          regexp_replace(
                            regexp_replace(t, '<[^>]+>', '', 'g'),
                            '[\x{200B}\x{200C}\x{200D}\x{2060}\x{FEFF}]',
                            '', 'g'),
                          '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}]',
                          '', 'g'),
                        '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                        '&quot;', '"'), '&#39;', chr(39)),
                        '&nbsp;', ' '),
                      '[ '||chr(9)||']{2,}', ' ', 'g'),
                    '(?m)^[ '||chr(9)||']+', '', 'g'),
                  '(?m)[ '||chr(9)||']+$', '', 'g'),
                chr(10)||'{3,}', chr(10)||chr(10), 'g'),
              ' '||chr(9)||chr(10)||chr(13)) AS clean
          FROM d)
        SELECT doc_id, clean <> '' AS has_content,
               CAST(length(clean) AS BIGINT) AS clean_len
        FROM c
    """,
    # language-ID heuristic (stages/text.py LangIdStage): script-range
    # char fractions, then first-argmax stopword hits over en/de/es/fr
    # in dict order; conf values are exact small rationals (identity
    # under round-6 on both sides, so neither side needs to round)
    "text_langid": r"""
        WITH q AS (
          SELECT doc_id, coalesce(text, '') AS t,
                 greatest(1, length(coalesce(text, ''))) AS n,
                 list_distinct(list_transform(
                     regexp_extract_all(coalesce(text, ''), '[a-zA-Z]+'),
                     w -> lower(w))) AS dw
          FROM documents),
        h AS (
          SELECT doc_id, t, n, dw,
                 len(list_intersect(dw, ['the','and','of','to','in','is',
                                         'that','for','with','a'])) AS h_en,
                 len(list_intersect(dw, ['der','die','das','und','ist',
                                         'nicht','mit','ein','zu'])) AS h_de,
                 len(list_intersect(dw, ['el','la','de','que','y','en',
                                         'un','una','por','con'])) AS h_es,
                 len(list_intersect(dw, ['le','la','les','de','et','un',
                                         'une','est','pour','que'])) AS h_fr
          FROM q)
        SELECT doc_id,
               CASE
                 WHEN CAST(len(regexp_extract_all(t, '[가-힯]')) AS DOUBLE)
                      / n > 0.1 THEN 'ko'
                 WHEN CAST(len(regexp_extract_all(t, '[぀-ゟ゠-ヿ]')) AS DOUBLE)
                      / n > 0.1 THEN 'ja'
                 WHEN CAST(len(regexp_extract_all(t, '[一-鿿]')) AS DOUBLE)
                      / n > 0.1 THEN 'zh'
                 WHEN len(dw) = 0 THEN 'unknown'
                 WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr
                      THEN 'en'
                 WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
                 WHEN h_es >= h_fr THEN 'es'
                 ELSE 'fr'
               END AS pred_lang,
               CASE
                 WHEN CAST(len(regexp_extract_all(t, '[가-힯]')) AS DOUBLE)
                      / n > 0.1 THEN 0.9::DOUBLE
                 WHEN CAST(len(regexp_extract_all(t, '[぀-ゟ゠-ヿ]')) AS DOUBLE)
                      / n > 0.1 THEN 0.9::DOUBLE
                 WHEN CAST(len(regexp_extract_all(t, '[一-鿿]')) AS DOUBLE)
                      / n > 0.1 THEN 0.8::DOUBLE
                 WHEN len(dw) = 0 THEN 0.0::DOUBLE
                 WHEN greatest(h_en, h_de, h_es, h_fr) > 0
                      THEN least(1.0::DOUBLE,
                                 CAST(greatest(h_en, h_de, h_es, h_fr)
                                      AS DOUBLE) / 5.0)
                 ELSE 0.1::DOUBLE
               END AS confidence
        FROM h
    """,
    # quality heuristics: every output is a single IEEE division of
    # exact ints or a fixed-order sum of dyadic products — bit-exact
    # with the engine WITHOUT rounding (see stages/text.py QualityStage)
    "text_quality": r"""
        WITH q AS (
          SELECT doc_id,
                 coalesce(text, '') AS t,
                 length(coalesce(text, '')) AS n_chars,
                 regexp_extract_all(coalesce(text, ''), '\S+') AS words
          FROM documents),
        m AS (
          SELECT doc_id, n_chars,
                 len(words) AS n_words,
                 length(t) - length(regexp_replace(t,
                     '[.,;:!?"''()\[\]{}]', '', 'g')) AS punct,
                 len(regexp_extract_all(t, '[0-9]')) AS digits,
                 length(regexp_replace(t, '\s', '', 'g')) AS sum_wl,
                 len(list_filter(words, w -> list_contains(
                     ['the','and','of','to','in','is','that','for',
                      'with','a'], lower(w)))) AS sw
          FROM q),
        r AS (
          SELECT doc_id,
                 CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(n_words AS BIGINT) AS n_words,
                 CASE WHEN n_chars > 0
                      THEN CAST(punct AS DOUBLE) / n_chars
                      ELSE 0.0::DOUBLE END AS punct_ratio,
                 CASE WHEN n_chars > 0
                      THEN CAST(digits AS DOUBLE) / n_chars
                      ELSE 0.0::DOUBLE END AS digit_ratio,
                 CASE WHEN n_words > 0
                      THEN CAST(sw AS DOUBLE) / n_words
                      ELSE 0.0::DOUBLE END AS stop_ratio,
                 CASE WHEN n_words > 0
                      THEN CAST(sum_wl AS DOUBLE) / n_words
                      ELSE 0.0::DOUBLE END AS mean_word_len
          FROM m)
        SELECT doc_id, n_chars, n_words, punct_ratio, digit_ratio,
               stop_ratio, mean_word_len,
               (((CASE WHEN n_words >= 5 THEN 0.25::DOUBLE
                       ELSE 0.0::DOUBLE END)
                 + (CASE WHEN mean_word_len >= 2.0 AND mean_word_len <= 12.0
                         THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END))
                + 0.25::DOUBLE * least(1.0::DOUBLE,
                                       4.0::DOUBLE * stop_ratio))
               + 0.25::DOUBLE * (1.0::DOUBLE
                   - least(1.0::DOUBLE,
                           4.0::DOUBLE * greatest(0.0::DOUBLE,
                               digit_ratio - 0.05::DOUBLE)))
                   AS quality
        FROM r
    """,
    # 'did you mean' term suggestion: (distance asc, df desc, term asc)
    # over the token vocabulary, first-char prefix constraint
    "search_suggest": r"""
        WITH tok AS (SELECT doc_id, unnest(list_distinct(
                         string_split_regex(lower(trim(text)),
                                            '\s+'))) AS term
                     FROM documents WHERE trim(text) <> ''),
        v AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM tok GROUP BY 1),
        q AS (SELECT * FROM (VALUES ('dta'), ('streem'), ('winow'),
                                    ('qury'), ('tabel'), ('jion'))
                  AS t(input_term)),
        c AS (SELECT q.input_term, v.term AS suggestion, v.df,
                     CAST(damerau_levenshtein(q.input_term, v.term)
                          AS BIGINT) AS distance
              FROM q JOIN v
                ON substr(v.term, 1, 1) = substr(q.input_term, 1, 1)
               AND v.term <> q.input_term
               AND damerau_levenshtein(q.input_term, v.term) <= 2),
        r AS (SELECT *, row_number() OVER (
                  PARTITION BY input_term
                  ORDER BY distance, df DESC, suggestion) AS rn
              FROM c)
        SELECT input_term, suggestion, df, distance FROM r WHERE rn = 1
    """,
    # resumable partitioned export: the manifest is per-partition row
    # counts, stable across first runs and marker-skip resumes
    "doc_export_partitioned": """
        SELECT lang AS partition, CAST(count(*) AS BIGINT) AS n_rows
        FROM documents GROUP BY lang
    """,
    # per-type moments from raw sums — the SAME raw-moment expression
    # the engine's mergeable partials produce (NOT var_pop(), whose
    # two-pass form differs in fp); round-6 absorbs sum order
    "events_value_stats": """
        WITH f AS (SELECT event_type,
                          CAST(trunc(value * 1000 + 0.5) AS BIGINT) AS x
                   FROM events),
        s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS s,
                     CAST(sum(CAST(x AS HUGEINT) * x) AS BIGINT) AS s2
              FROM f GROUP BY 1)
        SELECT event_type, n,
               (CAST(s AS DOUBLE) / n) / 1000.0 AS mean,
               (CAST(s2 AS DOUBLE) / n
                - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
               / 1000000.0 AS var_pop
        FROM s
    """,
    # weekly cohort retention: epoch-aligned 7-day buckets
    "events_retention": """
        WITH w AS (SELECT user_id,
                          CAST(floor(epoch(ts) / 86400.0) AS BIGINT) // 7
                              AS week
                   FROM events),
        f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1),
        p AS (SELECT DISTINCT w.user_id, f.cohort_week,
                     w.week - f.cohort_week AS week_offset
              FROM w JOIN f USING (user_id))
        SELECT cohort_week, week_offset,
               CAST(count(*) AS BIGINT) AS users
        FROM p GROUP BY 1, 2
    """,
    # ordered first-occurrence funnel view -> click -> purchase
    "events_funnel": """
        WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts) AS t2
              FROM events e JOIN v USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts) AS t3
              FROM events e JOIN c USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        SELECT 'view' AS stage, CAST(0 AS BIGINT) AS stage_idx,
               CAST((SELECT count(*) FROM v) AS BIGINT) AS users
        UNION ALL
        SELECT 'click', CAST(1 AS BIGINT),
               CAST((SELECT count(*) FROM c) AS BIGINT)
        UNION ALL
        SELECT 'purchase', CAST(2 AS BIGINT),
               CAST((SELECT count(*) FROM p) AS BIGINT)
    """,
    # TPC-H Q4 shape: EXISTS semi-join + priority counts (the synthetic
    # lineitem has no commit/receipt dates; 'late' := returnflag 'R')
    "tpch_q4": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1997-07-01'
          AND o_orderdate < DATE '1997-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    # TPC-H Q12 shape: join + CASE-sum split per linestatus
    "tpch_q12": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
        GROUP BY l_linestatus
    """,
    # TPC-H Q14: promo revenue share; sums are exact scaled ints, the
    # pct a single IEEE expression of them (bit-exact, no rounding)
    "tpch_q14": """
        WITH s AS (
          SELECT
            -- coalesce: an empty month makes the scalar sums NULL,
            -- which pandas-ifies to float64/NaN — the engine returns
            -- exact int64 zeros (deep-seed fuzz find)
            CAST(coalesce(sum(CASE WHEN p_type LIKE 'PROMO%'
                          THEN CAST(trunc(l_extendedprice * (1 - l_discount)
                                          * 10000 + 0.5) AS BIGINT)
                          ELSE 0 END), 0) AS BIGINT) AS promo_u4,
            CAST(coalesce(sum(CAST(trunc(l_extendedprice * (1 - l_discount)
                                * 10000 + 0.5) AS BIGINT)), 0) AS BIGINT)
                AS total_u4
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= DATE '1997-09-01'
            AND l_shipdate < DATE '1997-10-01')
        SELECT promo_u4, total_u4,
               CASE WHEN total_u4 > 0
                    THEN (100.0::DOUBLE * promo_u4) / total_u4
                    ELSE 0.0::DOUBLE END AS promo_pct
        FROM s
    """,
    # percolation: stored conjunctive queries vs every doc
    "search_percolate": r"""
        WITH tok AS (SELECT doc_id,
                            string_split_regex(lower(trim(text)),
                                               '\s+') AS t
                     FROM documents),
        q AS (SELECT * FROM (VALUES
                 (0, ['data', 'stream']),
                 (1, ['hash', 'join']),
                 (2, ['sort', 'merge', 'window']),
                 (3, ['qqqxplughz']),
                 (4, ['table'])) AS v(query_id, terms))
        SELECT tok.doc_id, CAST(q.query_id AS BIGINT) AS query_id
        FROM tok, q
        WHERE len(list_intersect(list_distinct(t), terms)) = len(terms)
    """,
    # histogram aggregation over the full match set of 'data'
    "search_facet_hist": r"""
        SELECT floor(n_chars / 50.0) * 50.0 AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM documents
        WHERE list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'data')
        GROUP BY 1
    """,
    # metadata-sorted retrieval: match set of 'data' AND 'stream'
    # ordered n_chars DESC, doc_id ASC, top 15
    "search_sorted_docs": r"""
        SELECT doc_id, n_chars
        FROM documents
        WHERE list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'data')
          AND list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'stream')
        ORDER BY n_chars DESC, doc_id ASC
        LIMIT 15
    """,
    # ExactSubstr duplicate-span removal: a token survives iff no
    # k=5-token span with >= 2 corpus-wide occurrences covers it
    "doc_dup_spans_removed": r"""
        WITH tok AS (SELECT doc_id,
                            string_split_regex(trim(text), '\s+') AS toks
                     FROM documents WHERE trim(text) <> ''),
        sp AS (SELECT doc_id, unnest(range(1, len(toks) - 3)) AS i, toks
               FROM tok WHERE len(toks) >= 5),
        spans AS (SELECT doc_id, i,
                         array_to_string(toks[i:i + 4], ' ') AS span
                  FROM sp),
        occ AS (SELECT span, count(*) AS c FROM spans GROUP BY 1),
        dup AS (SELECT spans.doc_id, i
                FROM spans JOIN occ USING (span) WHERE c >= 2),
        tpos AS (SELECT doc_id, unnest(toks) AS tokn,
                        unnest(range(1, len(toks) + 1)) AS j,
                        len(toks) AS n
                 FROM tok),
        kept AS (SELECT t.doc_id, t.tokn, t.j, t.n,
                        NOT EXISTS (SELECT 1 FROM dup d
                                    WHERE d.doc_id = t.doc_id
                                      AND d.i BETWEEN t.j - 4 AND t.j)
                            AS keep
                 FROM tpos t)
        SELECT d.doc_id,
               CAST(coalesce(len(tok.toks), 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(len(tok.toks), 0)
                    - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
               coalesce(k.txt, '') AS clean_text
        FROM documents d
        LEFT JOIN tok USING (doc_id)
        LEFT JOIN (SELECT doc_id,
                          count(*) FILTER (WHERE keep) AS n_kept,
                          string_agg(tokn, ' ' ORDER BY j)
                              FILTER (WHERE keep) AS txt
                   FROM kept GROUP BY doc_id) k ON d.doc_id = k.doc_id
    """,
    # stats + cardinality + value_count aggregations over the match
    # set of 'data': exact int count/min/max/sum, avg = the single
    # IEEE division sum/count, exact distinct sources. HAVING drops
    # the aggregate row on a zero-match corpus (engine: typed empty).
    "search_agg_stats": r"""
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(n_chars) AS BIGINT) AS n_vals
        FROM documents
        WHERE list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'data')
        HAVING count(*) > 0
    """,
    # range aggregation over the match set of 'data': half-open
    # [from, to) buckets with open ends, bucket keys as literals
    "search_agg_range": r"""
        WITH m AS (SELECT n_chars FROM documents
                   WHERE list_contains(string_split_regex(
                             lower(trim(text)), '\s+'), 'data'))
        SELECT '*-100.0' AS bucket, CAST(count(*) FILTER (
                   WHERE n_chars < 100) AS BIGINT) AS n FROM m
        UNION ALL
        SELECT '100.0-250.0', CAST(count(*) FILTER (
                   WHERE n_chars >= 100 AND n_chars < 250) AS BIGINT)
        FROM m
        UNION ALL
        SELECT '250.0-400.0', CAST(count(*) FILTER (
                   WHERE n_chars >= 250 AND n_chars < 400) AS BIGINT)
        FROM m
        UNION ALL
        SELECT '400.0-*', CAST(count(*) FILTER (
                   WHERE n_chars >= 400) AS BIGINT) FROM m
    """,
    # sort+search_after pagination: two 8-row pages over the match set
    # of 'data' ordered n_chars DESC, doc_id ASC == one-shot LIMIT 16
    # (composite cursor key is unique per doc)
    "search_sorted_paged": r"""
        WITH m AS (SELECT doc_id, n_chars,
                          row_number() OVER (ORDER BY n_chars DESC,
                                             doc_id ASC) AS rn
                   FROM documents
                   WHERE list_contains(string_split_regex(
                             lower(trim(text)), '\s+'), 'data'))
        SELECT CAST((rn - 1) // 8 AS BIGINT) AS page, doc_id, n_chars
        FROM m WHERE rn <= 16
    """,
    # multi_match field-subset match sets for query 'data en': case 0 =
    # fields ["text"] (token hits in text only), case 1 = fields
    # ["text", "lang^2"] (adds docs whose lang field is 'en'; boosts
    # never change the match SET)
    "search_multi_match_docs": r"""
        WITH tok AS (SELECT doc_id, lang,
                            string_split_regex(lower(trim(text)),
                                               '\s+') AS t
                     FROM documents),
        txt AS (SELECT doc_id, lang,
                       (list_contains(t, 'data')
                        OR list_contains(t, 'en')) AS hit_text
                FROM tok)
        SELECT CAST(0 AS BIGINT) AS case_id, doc_id
        FROM txt WHERE hit_text
        UNION ALL
        SELECT CAST(1 AS BIGINT), doc_id
        FROM txt WHERE hit_text OR lang = 'en'
    """,
    # nested sub-aggregation: per-lang stats of n_chars over the match
    # set of 'data' (terms bucket agg + stats sub-agg); avg is the
    # single IEEE division sum/count of exact ints
    "search_agg_terms_stats": r"""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        FROM documents
        WHERE list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'data')
        GROUP BY lang
    """,
    # faceted search: terms aggregation over the full conjunctive match
    # set ("data" AND "stream"), per kept metadata column
    "search_facets": r"""
        WITH m AS (SELECT lang, source
                   FROM documents
                   WHERE list_contains(string_split_regex(
                             lower(trim(text)), '\s+'), 'data')
                     AND list_contains(string_split_regex(
                             lower(trim(text)), '\s+'), 'stream'))
        SELECT 'lang' AS facet, lang AS value,
               CAST(count(*) AS BIGINT) AS n
        FROM m GROUP BY lang
        UNION ALL
        SELECT 'source', source, CAST(count(*) AS BIGINT)
        FROM m GROUP BY source
    """,
    # Misra–Gries heavy hitters in the exact regime (k=4096 ≫ vocab →
    # no trim, dec=0): estimates equal exact counts, err_bound is 0
    "doc_heavy_terms": r"""
        WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)),
                                                      '\s+')) AS term
                     FROM documents WHERE trim(text) <> '')
        SELECT term, CAST(count(*) AS BIGINT) AS est_count,
               CAST(0 AS BIGINT) AS err_bound
        FROM tok GROUP BY term
        ORDER BY est_count DESC, term ASC
        LIMIT 20
    """,
    # CCNet-style corpus-bigram-LM perplexity (add-0.5 smoothing, V =
    # distinct unigrams); ce/ppl round(6) absorbs sum-order/libm ulps
    "doc_lm_score": r"""
        WITH tok AS (SELECT doc_id,
                            string_split_regex(lower(trim(text)),
                                               '\s+') AS toks
                     FROM documents WHERE trim(text) <> ''),
        pos AS (SELECT doc_id, toks,
                       unnest(range(1, len(toks))) AS i
                FROM tok WHERE len(toks) >= 2),
        bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM pos),
        bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        cc AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        v AS (SELECT count(DISTINCT t) AS vsz
              FROM (SELECT unnest(toks) AS t FROM tok)),
        sc AS (SELECT bg.doc_id,
                      ln((c12 + 0.5) / (c1 + 0.5 * vsz)) AS lp
               FROM bg JOIN bc USING (w1, w2) JOIN cc USING (w1), v),
        agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                       sum(lp) AS s
                FROM sc GROUP BY 1)
        SELECT doc_id, n_bigrams,
               round(-s / n_bigrams, 6) AS cross_entropy,
               round(exp(-s / n_bigrams), 6) AS ppl
        FROM agg
    """,
    # Q7 volume shipping: revenue flow between the two first nations,
    # both directions, by ship year (exact u4 sums)
    "tpch_q7": """
        WITH ns AS (SELECT n_name FROM nation ORDER BY n_name LIMIT 2)
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(sum(CAST(trunc(l_extendedprice * (1 - l_discount)
                                   * 10000 + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_u4
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE cn.n_name IN (SELECT n_name FROM ns)
          AND sn.n_name IN (SELECT n_name FROM ns)
          AND sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3
    """,
    # Q15 top supplier: max revenue over the fixed 3-month window, ties
    # kept (exact u4 sums)
    "tpch_q15": """
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(sum(CAST(trunc(l_extendedprice * (1 - l_discount)
                                       * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS total_revenue_u4
            FROM lineitem
            WHERE l_shipdate >= DATE '1997-07-01'
              AND l_shipdate <  DATE '1997-10-01'
            GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue_u4
        FROM rev JOIN supplier ON s_suppkey = l_suppkey
        WHERE total_revenue_u4 = (SELECT max(total_revenue_u4) FROM rev)
    """,
    # Q17 small-quantity revenue: correlated per-part 0.2*avg(qty) cut
    # over the min-brand parts; exact cent sum, then /100/7 in order
    "tpch_q17": """
        WITH pk AS (SELECT p_partkey FROM part
                    WHERE p_brand = (SELECT min(p_brand) FROM part)),
        cut AS (SELECT l_partkey,
                       0.2 * (sum(l_quantity) / count(*)) AS c
                FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM pk)
                GROUP BY 1),
        hit AS (SELECT CAST(trunc(l_extendedprice * 100 + 0.5) AS BIGINT)
                           AS rc
                FROM lineitem JOIN cut ON lineitem.l_partkey = cut.l_partkey
                WHERE l_quantity < c)
        SELECT (CAST(coalesce(sum(rc), 0) AS DOUBLE) / 100.0) / 7.0
                   AS avg_yearly
        FROM hit
    """,
    # Q19 disjunctive brand/size/qty predicates (brands = first three
    # distinct, same combos as the engine)
    "tpch_q19": """
        WITH b AS (SELECT p_brand, row_number() OVER (ORDER BY p_brand)
                              AS i
                   FROM (SELECT DISTINCT p_brand FROM part)),
        pa AS (SELECT p_partkey, p_brand, p_size FROM part)
        SELECT CAST(coalesce(sum(CAST(trunc(l_extendedprice
                                            * (1 - l_discount) * 10000
                                            + 0.5) AS BIGINT)), 0)
                    AS BIGINT) AS revenue_u4
        FROM lineitem JOIN pa ON l_partkey = p_partkey
        WHERE (p_brand = (SELECT p_brand FROM b WHERE i = 1)
               AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = (SELECT p_brand FROM b WHERE i = 2)
               AND p_size BETWEEN 5 AND 25
               AND l_quantity BETWEEN 10 AND 40)
           OR (p_brand = (SELECT p_brand FROM b WHERE i = 3)
               AND p_size BETWEEN 15 AND 50
               AND l_quantity BETWEEN 20 AND 50)
    """,
    # Q22: customers above the avg POSITIVE balance (avg from exact
    # cents, one division) with no orders, per nation
    "tpch_q22": """
        WITH c AS (SELECT c_custkey, c_nationkey,
                          CAST(trunc(c_acctbal * 100 + 0.5) AS BIGINT)
                              AS bal_c
                   FROM customer),
        cut AS (SELECT CAST(sum(bal_c) AS DOUBLE) / count(*) AS v
                FROM c WHERE bal_c > 0)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
        FROM c
        WHERE bal_c > (SELECT v FROM cut)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderdate >= DATE '2000-01-01')
        GROUP BY 1
    """,
    # top-N per group (windowed row_number), ties by event_id asc
    "events_topn_per_user": """
        WITH r AS (SELECT user_id, event_id, value,
                          row_number() OVER (PARTITION BY user_id
                                             ORDER BY value DESC,
                                                      event_id ASC) AS rnk
                   FROM events)
        SELECT user_id, CAST(rnk AS BIGINT) AS rnk, event_id, value
        FROM r WHERE rnk <= 3
    """,
    # CUBE(status, priority) from one scan — 'all' sentinels for the
    # coarser grouping sets, exact cent sums
    "tpch_cube_status_priority": """
        WITH f AS (SELECT o_orderstatus, o_orderpriority,
                          CAST(trunc(o_totalprice * 100 + 0.5) AS BIGINT)
                              AS c
                   FROM orders)
        SELECT coalesce(o_orderstatus, 'all') AS o_orderstatus,
               coalesce(o_orderpriority, 'all') AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS total_c
        FROM f
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    # lag() window: per-user inter-event gap seconds
    "events_inter_deltas": """
        WITH d AS (SELECT user_id, event_id, ts,
                          lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT user_id, event_id,
               round(epoch(ts) - epoch(prev), 6) AS gap_sec
        FROM d WHERE prev IS NOT NULL
    """,
    # unbounded-preceding window sum: cumulative daily count per type
    "events_running_total": """
        WITH dd AS (SELECT event_type, date_trunc('day', ts) AS day,
                           CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1, 2)
        SELECT event_type, day, n,
               CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS running_n
        FROM dd
    """,
    # GPT-2-style pre-tokenizer count (ASCII classes; RE2 == re here)
    "doc_token_count_bpe": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'))
                    AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    # Q2 min-cost supplier: correlated per-part min unit cost over
    # the first region's suppliers, size-15 parts, ties kept, top 100
    "tpch_q2": """
        WITH r AS (SELECT r_regionkey FROM region
                   WHERE r_name = (SELECT min(r_name) FROM region)),
        sn AS (SELECT s_suppkey, s_name,
                      CAST(trunc(s_acctbal * 100 + 0.5) AS BIGINT)
                          AS bal_c, n_name
               FROM supplier JOIN nation ON n_nationkey = s_nationkey
               WHERE n_regionkey IN (SELECT r_regionkey FROM r)),
        pk AS (SELECT p_partkey FROM part WHERE p_size = 15),
        cost AS (SELECT l_partkey, l_suppkey,
                        min(CAST(trunc(l_extendedprice / l_quantity
                                       * 10000 + 0.5) AS BIGINT))
                            AS cost_u4
                 FROM lineitem
                 WHERE l_partkey IN (SELECT p_partkey FROM pk)
                   AND l_suppkey IN (SELECT s_suppkey FROM sn)
                 GROUP BY 1, 2),
        best AS (SELECT * FROM cost c
                 WHERE cost_u4 = (SELECT min(cost_u4) FROM cost c2
                                  WHERE c2.l_partkey = c.l_partkey))
        SELECT bal_c AS s_acctbal_c, s_name, n_name,
               l_partkey AS p_partkey, s_suppkey, cost_u4
        FROM best JOIN sn ON sn.s_suppkey = best.l_suppkey
        ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey, s_suppkey
        LIMIT 100
    """,
    # Q8 national market share: first region, ECONOMY parts, share of
    # the region's first nation by order year (exact u4 sums; the
    # share is one IEEE division of them)
    "tpch_q8": """
        WITH r AS (SELECT r_regionkey FROM region
                   WHERE r_name = (SELECT min(r_name) FROM region)),
        rn AS (SELECT n_nationkey, n_name FROM nation
               WHERE n_regionkey IN (SELECT r_regionkey FROM r)),
        tgt AS (SELECT n_nationkey FROM rn
                WHERE n_name = (SELECT min(n_name) FROM rn)),
        f AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     CAST(trunc(l_extendedprice * (1 - l_discount)
                                * 10000 + 0.5) AS BIGINT) AS rev_u4,
                     (s_nationkey IN (SELECT n_nationkey FROM tgt))
                         AS is_t
              FROM lineitem
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN part     ON p_partkey = l_partkey
              WHERE c_nationkey IN (SELECT n_nationkey FROM rn)
                AND p_type = \'ECONOMY\'
                AND o_orderdate >= DATE \'1996-01-01\'
                AND o_orderdate <  DATE \'1998-01-01\')
        SELECT o_year,
               CAST(sum(CASE WHEN is_t THEN rev_u4 ELSE 0 END)
                    AS BIGINT) AS nation_u4,
               CAST(sum(rev_u4) AS BIGINT) AS total_u4,
               CAST(sum(CASE WHEN is_t THEN rev_u4 ELSE 0 END)
                    AS DOUBLE) / sum(rev_u4) AS mkt_share
        FROM f GROUP BY 1 ORDER BY 1
    """,
    # Q9 product-type profit by (supplier nation, order year): parts
    # named %red%, cost term = 0.5 * retailprice * qty (no partsupp),
    # both terms exact u4 integers
    "tpch_q9": """
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(trunc(l_extendedprice * (1 - l_discount)
                                   * 10000 + 0.5) AS BIGINT)
                        - CAST(trunc(p_retailprice * 0.5 * l_quantity
                                     * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_profit_u4
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN part     ON p_partkey = l_partkey
        WHERE p_name LIKE \'%red%\'
        GROUP BY 1, 2 ORDER BY n_name, o_year DESC
    """,
    # Q11 important stock: per-part value over the first nation\'s
    # suppliers, HAVING > 0.001 of the grand total
    "tpch_q11": """
        WITH tgt AS (SELECT n_nationkey FROM nation
                     WHERE n_name = (SELECT min(n_name) FROM nation)),
        sk AS (SELECT s_suppkey FROM supplier
               WHERE s_nationkey IN (SELECT n_nationkey FROM tgt)),
        v AS (SELECT l_partkey AS p_partkey,
                     CAST(sum(CAST(trunc(l_extendedprice
                                         * (1 - l_discount) * 10000
                                         + 0.5) AS BIGINT)) AS BIGINT)
                         AS value_u4
              FROM lineitem
              WHERE l_suppkey IN (SELECT s_suppkey FROM sk)
              GROUP BY 1)
        SELECT p_partkey, value_u4 FROM v
        WHERE value_u4 > (SELECT sum(value_u4) FROM v) * 2.0
                         / (SELECT count(*) FROM part)
        ORDER BY value_u4 DESC, p_partkey
    """,
    # Q20 dominant-supplier promotion: first region\'s suppliers who
    # shipped > half of some small%-part\'s 1997 total quantity
    "tpch_q20": """
        WITH pk AS (SELECT p_partkey FROM part
                    WHERE p_name LIKE \'small%\'),
        q AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM pk)
                AND l_shipdate >= DATE \'1997-01-01\'
                AND l_shipdate <  DATE \'1998-01-01\'
              GROUP BY 1, 2),
        dom AS (SELECT DISTINCT l_suppkey FROM q
                WHERE sq > 0.5 * (SELECT sum(sq) FROM q q2
                                  WHERE q2.l_partkey = q.l_partkey)),
        r AS (SELECT r_regionkey FROM region
              WHERE r_name = (SELECT min(r_name) FROM region))
        SELECT s_suppkey, s_name
        FROM supplier JOIN dom ON l_suppkey = s_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_regionkey IN (SELECT r_regionkey FROM r)
        ORDER BY s_name, s_suppkey
    """,
    # Q21 sole-late supplier: finished multi-supplier orders where one
    # supplier\'s max ship date strictly leads all others, counted per
    # supplier, top 100
    "tpch_q21": """
        WITH f AS (SELECT l_orderkey, l_suppkey, l_shipdate
                   FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                   WHERE o_orderstatus = \'F\'),
        per AS (SELECT l_orderkey, l_suppkey,
                       max(l_shipdate) AS smax
                FROM f GROUP BY 1, 2),
        om AS (SELECT l_orderkey, max(smax) AS omax,
                      count(*) AS nsupp
               FROM per GROUP BY 1),
        w AS (SELECT per.l_orderkey, per.l_suppkey FROM per
              JOIN om ON om.l_orderkey = per.l_orderkey
              WHERE nsupp >= 2 AND smax = omax),
        sole AS (SELECT l_orderkey FROM w GROUP BY 1
                 HAVING count(*) = 1)
        SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM w JOIN sole ON sole.l_orderkey = w.l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY 1, 2
        ORDER BY numwait DESC, s_name, s_suppkey LIMIT 100
    """,
    # FULL OUTER join of two day-keyed aggregates (zero-filled)
    "events_daily_click_purchase": """
        WITH c AS (SELECT date_trunc('day', ts) AS day,
                          CAST(count(*) AS BIGINT) AS n_clicks
                   FROM events WHERE event_type = 'click' GROUP BY 1),
        p AS (SELECT date_trunc('day', ts) AS day,
                     CAST(count(*) AS BIGINT) AS n_purchases
              FROM events WHERE event_type = 'purchase' GROUP BY 1)
        SELECT coalesce(c.day, p.day) AS day,
               coalesce(n_clicks, 0) AS n_clicks,
               coalesce(n_purchases, 0) AS n_purchases
        FROM c FULL OUTER JOIN p ON c.day = p.day
    """,
    # CountMin frequency sketch: rebuild the same d x w counter table
    # with the engine's multiply-shift hashes in HUGEINT arithmetic;
    # estimate = min over rows of the key's counter (deterministic ->
    # hash-exact). Top-20 users by estimated count.
    "events_user_freq_cms": """
        WITH k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
                   FROM events GROUP BY 1),
        seeds AS (SELECT * FROM (VALUES
            (0, 11400714819323198485::HUGEINT),
            (1, 14029467366897019727::HUGEINT),
            (2, 1609587929392839161::HUGEINT),
            (3, 2870177450012600261::HUGEINT)) t(i, a)),
        h AS (SELECT user_id, c, i,
                     CAST(((CAST(user_id AS HUGEINT) * a)
                           % 18446744073709551616)
                          // 18014398509481984 AS BIGINT) AS b
              FROM k CROSS JOIN seeds),
        cnt AS (SELECT i, b, CAST(sum(c) AS BIGINT) AS tot
                FROM h GROUP BY 1, 2),
        est AS (SELECT h.user_id, max(h.c) AS true_count,
                       CAST(min(cnt.tot) AS BIGINT) AS est_count
                FROM h JOIN cnt ON cnt.i = h.i AND cnt.b = h.b
                GROUP BY 1)
        SELECT user_id, est_count, true_count
        FROM est ORDER BY est_count DESC, user_id LIMIT 20
    """,
    # top-20 word bigrams (lower + whitespace split; 1-based list
    # indexing, range(1,len) = adjacent pairs)
    "doc_top_bigrams": """
        WITH t AS (SELECT string_split_regex(lower(trim(text)), '\\s+')
                          AS w
                   FROM documents WHERE trim(text) <> ''),
        b AS (SELECT w[CAST(i AS BIGINT)] || ' '
                     || w[CAST(i AS BIGINT) + 1] AS bigram
              FROM t, UNNEST(range(1, len(w))) AS r(i))
        SELECT bigram, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20
    """,
    # Pearson corr of value-cents vs hour per type, from exact integer
    # sums with the engine's exact op order (no rounding needed)
    "events_value_hour_corr": """
        WITH f AS (SELECT event_type,
                          CAST(trunc(value * 100 + 0.5) AS BIGINT) AS x,
                          CAST(extract(hour FROM ts) AS BIGINT) AS y
                   FROM events),
        s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx,
                     CAST(sum(y) AS HUGEINT) AS sy,
                     CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                     CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                     CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
              FROM f GROUP BY 1)
        SELECT event_type, n,
               CASE WHEN (n * sxx - sx * sx) > 0
                         AND (n * syy - sy * sy) > 0
                    THEN CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                    ELSE 0.0 END AS corr_r
        FROM s ORDER BY event_type
    """,
    # global running value total (distributed prefix scan): exact
    # cents cumsum in event_id order, row per event
    "events_running_value": """
        WITH f AS (SELECT event_id,
                          CAST(trunc(value * 100 + 0.5) AS BIGINT) AS c
                   FROM events)
        SELECT event_id,
               CAST(sum(c) OVER (ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_value_c
        FROM f
    """,
    # adaptive mixture: per-source rate from exact char shares, keep
    # by integer hash-vs-cut compare (same op order as the engine)
    "doc_mix_adaptive": """
        WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
                   FROM documents GROUP BY 1),
        tot AS (SELECT CAST(sum(chars) AS BIGINT) AS t,
                       count(*) AS k FROM s),
        c AS (SELECT source,
                     CAST(floor(least(1.0, (CAST(chars AS DOUBLE) / t)
                                           * k * 0.5)
                                * 4294967296) AS BIGINT) AS cut
              FROM s, tot)
        SELECT d.doc_id, d.source
        FROM documents d JOIN c ON c.source = d.source
        WHERE ((d.doc_id % 4294967296) * 2654435761::HUGEINT)
              % 4294967296 < cut
    """,
    # connected components over the exact Jaccard duplicate graph:
    # recursive reachability closure -> min label per component
    # (singletons via LEFT JOIN keep their own id)
    "dedup_jaccard_clusters": r"""
        WITH RECURSIVE w AS (SELECT doc_id,
                          string_split_regex(lower(trim(text)), '\s+')
                              AS ws
                   FROM documents WHERE trim(text) <> ''),
        g AS (
            SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(ws) >= 2 THEN
                    list_transform(range(1, len(ws)),
                                   i -> ws[i] || ' ' || ws[i+1])
                ELSE [ws[1]] END)) AS gram
            FROM w
        ),
        sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
            FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
        p AS (SELECT i.a, i.b
              FROM inter i
              JOIN sz sa ON sa.doc_id = i.a
              JOIN sz sb ON sb.doc_id = i.b
              WHERE CAST(i.inter AS DOUBLE)
                    / (sa.sz + sb.sz - i.inter) >= 0.5),
        e AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
        reach(n, l) AS (
            SELECT a AS n, a AS l FROM e
            UNION
            SELECT e.a AS n, r.l AS l
            FROM e JOIN reach r ON r.n = e.b),
        comp AS (SELECT n, CAST(min(l) AS BIGINT) AS cluster
                 FROM reach GROUP BY 1)
        SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp c ON c.n = d.doc_id
    """,
    # global NTILE(4) by (value cents, event_id) — distributed ranking
    "events_value_ntile": """
        WITH f AS (SELECT event_id,
                          CAST(trunc(value * 100 + 0.5) AS BIGINT) AS c
                   FROM events)
        SELECT event_id,
               CAST(ntile(4) OVER (ORDER BY c, event_id) AS BIGINT)
                   AS tile
        FROM f
    """,
    # PIVOT: one row per day, one count column per event type
    "events_daily_pivot": """
        SELECT date_trunc('day', ts) AS day,
               CAST(count(*) FILTER (WHERE event_type = 'click')
                    AS BIGINT) AS n_click,
               CAST(count(*) FILTER (WHERE event_type = 'error')
                    AS BIGINT) AS n_error,
               CAST(count(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS n_purchase,
               CAST(count(*) FILTER (WHERE event_type = 'signup')
                    AS BIGINT) AS n_signup,
               CAST(count(*) FILTER (WHERE event_type = 'view')
                    AS BIGINT) AS n_view
        FROM events GROUP BY 1
    """,
    # grouped string aggregation: per-user ordered event-type trace
    "events_user_seq": """
        SELECT user_id,
               string_agg(event_type, ','
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY 1
    """,
    # interval-overlap join: per session, error windows (ts ± 30 min)
    # it overlaps; LEFT JOIN keeps zero-overlap sessions
    "events_session_error_overlap": """
        WITH o AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w
                                > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s0 AS (SELECT user_id, ts,
                      sum(brk) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
               FROM o),
        s AS (SELECT user_id, min(ts) AS session_start,
                     max(ts) AS session_end
              FROM s0 GROUP BY user_id, sid),
        e AS (SELECT ts - INTERVAL 30 MINUTE AS lo,
                     ts + INTERVAL 30 MINUTE AS hi
              FROM events WHERE event_type = 'error')
        SELECT s.user_id, s.session_start, s.session_end,
               CAST(count(e.lo) AS BIGINT) AS n_error_windows
        FROM s LEFT JOIN e
          ON s.session_start <= e.hi AND s.session_end >= e.lo
        GROUP BY 1, 2, 3
    """,
    # date_histogram (calendar month) over the match set of 'data':
    # pub_day is the derived epoch-day column 18262 + doc_id % 1096
    # (same expression the engine's dated index derives); DuckDB
    # date_trunc == the engine's numpy datetime64 truncation
    "search_date_histogram": r"""
        WITH w AS (SELECT doc_id,
                          18262 + (doc_id % 1096) AS pub_day,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        m AS (SELECT date_trunc('month',
                     DATE '1970-01-01'
                     + CAST(pub_day AS INTEGER)) AS mo
              FROM w WHERE list_contains(ws, 'data'))
        SELECT strftime(mo, '%Y-%m-%d') AS key_as_string,
               CAST(datediff('day', DATE '1970-01-01', mo)
                    AS BIGINT) AS "key",
               CAST(count(*) AS BIGINT) AS doc_count
        FROM m GROUP BY mo
    """,
    # exact percentiles over the match set of 'data': quantile_disc is
    # the engine's verified-identical nearest-rank convention
    "search_percentiles": r"""
        SELECT CAST(quantile_disc(n_chars, 0.01) AS DOUBLE) AS p1,
               CAST(quantile_disc(n_chars, 0.05) AS DOUBLE) AS p5,
               CAST(quantile_disc(n_chars, 0.25) AS DOUBLE) AS p25,
               CAST(quantile_disc(n_chars, 0.50) AS DOUBLE) AS p50,
               CAST(quantile_disc(n_chars, 0.75) AS DOUBLE) AS p75,
               CAST(quantile_disc(n_chars, 0.95) AS DOUBLE) AS p95,
               CAST(quantile_disc(n_chars, 0.99) AS DOUBLE) AS p99
        FROM documents
        WHERE list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'data')
        HAVING count(*) > 0
    """,
    # terms + top_hits: per source bucket over the data AND stream
    # match set, the top 2 docs by (n_chars DESC, doc_id ASC)
    "search_top_hits": r"""
        WITH w AS (SELECT doc_id, source, n_chars,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        m AS (SELECT doc_id, source, n_chars FROM w
              WHERE list_contains(ws, 'data')
                AND list_contains(ws, 'stream')),
        r AS (SELECT source, doc_id, n_chars,
                     count(*) OVER (PARTITION BY source) AS doc_count,
                     row_number() OVER (
                         PARTITION BY source
                         ORDER BY n_chars DESC, doc_id ASC) AS hit_rank
              FROM m)
        SELECT source, CAST(doc_count AS BIGINT) AS doc_count,
               CAST(hit_rank AS BIGINT) AS hit_rank, doc_id,
               CAST(n_chars AS BIGINT) AS n_chars
        FROM r WHERE hit_rank <= 2
    """,
    # significant_text (JLH) over the match set of 'data': fg/bg df
    # are per-doc-distinct word counts; the float chain (identical
    # IEEE op order to QueryEngine.score_significant) only drives the
    # ORDER BY — the compared columns are pure ints/strings
    "search_sigtext": r"""
        WITH w AS (SELECT doc_id,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        dw AS (SELECT DISTINCT doc_id, term
               FROM (SELECT doc_id, unnest(ws) AS term FROM w)),
        f AS (SELECT doc_id FROM w WHERE list_contains(ws, 'data')),
        tot AS (SELECT (SELECT count(*) FROM f) AS fgn,
                       (SELECT count(*) FROM w) AS bgn),
        c AS (SELECT term,
                     CAST(count(*) AS BIGINT) AS bg,
                     CAST(count(*) FILTER (WHERE doc_id IN
                          (SELECT doc_id FROM f)) AS BIGINT) AS fg
              FROM dw GROUP BY term),
        s AS (SELECT term, fg, bg,
                     (fg / fgn - bg / bgn)
                     * ((fg / fgn) / (bg / bgn)) AS score
              FROM c, tot
              WHERE bg >= 5 AND fg >= 5 AND fg / fgn > bg / bgn)
        SELECT CAST(row_number() OVER (ORDER BY score DESC, term ASC)
                    AS BIGINT) AS rnk,
               term, fg AS fg_df, bg AS bg_df
        FROM s ORDER BY score DESC, term ASC LIMIT 10
    """,
    # dis_max match set: union of phrase "table scan", term 'vector',
    # prefix 'st' (scoring identity is pytest-checked; the SET is SQL)
    "dismax_match_docs": r"""
        WITH w AS (SELECT doc_id, lower(trim(text)) AS lt,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents)
        SELECT doc_id FROM w
        WHERE regexp_matches(lt,
              '(^|[^a-z0-9_])table[^a-z0-9_]+scan([^a-z0-9_]|$)')
           OR list_contains(ws, 'vector')
           OR len(list_filter(ws, x -> x LIKE 'st%')) > 0
    """,
    # match_phrase_prefix 'merge so': word 'merge' immediately followed
    # by a word starting 'so' (expansion cap above vocab size == the
    # unbounded regexp)
    "phrase_prefix_docs": r"""
        SELECT doc_id FROM documents
        WHERE regexp_matches(lower(trim(text)),
              '(^|[^a-z0-9_])merge[^a-z0-9_]+so')
    """,
    # constant_score: every doc matching lang='en' AND the term 'data'
    # scores exactly the boost literal; top-25 by doc_id asc
    "search_constant_score": r"""
        SELECT doc_id, CAST(1.5 AS DOUBLE) AS score
        FROM documents
        WHERE lang = 'en'
          AND list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'data')
        ORDER BY doc_id ASC LIMIT 25
    """,
    # composite aggregation: the full after-cursor page chain over
    # (lang, source) buckets of the match set of 'data', page_size 4 —
    # buckets in ascending composite-key order == row_number pages
    "search_composite_pages": r"""
        WITH w AS (SELECT lang, source,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        g AS (SELECT lang, source,
                     CAST(count(*) AS BIGINT) AS doc_count
              FROM w WHERE list_contains(ws, 'data')
              GROUP BY lang, source),
        r AS (SELECT lang, source, doc_count,
                     row_number() OVER (ORDER BY lang, source) AS rn
              FROM g)
        SELECT CAST((rn - 1) // 4 AS BIGINT) AS page, lang, source,
               doc_count
        FROM r
    """,
    # function_score field_value_factor boost_mode=replace: lang='en'
    # docs matching 'data' scored ln(1 + 2*n_chars) — DuckDB ln is
    # libm, the engine computes the identical libm call
    "search_function_score": r"""
        SELECT doc_id, round(ln(1 + 2.0 * n_chars), 6) AS score
        FROM documents
        WHERE lang = 'en'
          AND list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'data')
        ORDER BY ln(1 + 2.0 * n_chars) DESC, doc_id ASC LIMIT 15
    """,
    # nested-bool retrieval: data AND (phrase "table scan" OR (vector
    # AND NOT stream)) AND NOT (lang='de' AND cache)
    "nested_bool_docs": r"""
        WITH w AS (SELECT doc_id, lang, lower(trim(text)) AS lt,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents)
        SELECT doc_id FROM w
        WHERE list_contains(ws, 'data')
          AND (regexp_matches(lt,
               '(^|[^a-z0-9_])table[^a-z0-9_]+scan([^a-z0-9_]|$)')
               OR (list_contains(ws, 'vector')
                   AND NOT list_contains(ws, 'stream')))
          AND NOT (lang = 'de' AND list_contains(ws, 'cache'))
    """,
    # terms (IN-list) filter: match 'data' AND lang IN (en, fr)
    "terms_filter_docs": r"""
        SELECT doc_id FROM documents
        WHERE lang IN ('en', 'fr')
          AND list_contains(string_split_regex(lower(trim(text)),
                                               '\s+'), 'data')
    """,
    # filters aggregation: named predicate buckets over the match set
    # of 'data' — (lang IN en/fr), contains 'vector', n_chars >= 250
    "search_filters_agg": r"""
        WITH m AS (SELECT lang, n_chars,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents)
        SELECT 'en_or_fr' AS bucket,
               CAST(count(*) FILTER (WHERE lang IN ('en', 'fr'))
                    AS BIGINT) AS doc_count
        FROM m WHERE list_contains(ws, 'data')
        UNION ALL
        SELECT 'has_vector',
               CAST(count(*) FILTER (WHERE list_contains(ws, 'vector'))
                    AS BIGINT)
        FROM m WHERE list_contains(ws, 'data')
        UNION ALL
        SELECT 'long',
               CAST(count(*) FILTER (WHERE n_chars >= 250) AS BIGINT)
        FROM m WHERE list_contains(ws, 'data')
    """,
    # parent pipeline aggs under a monthly date_histogram: derivative
    # of the sum metric (int diff cast to DOUBLE; first bucket NULL),
    # cumulative doc count (exact BIGINT running sum), and a trailing
    # 3-bucket moving average whose window ends BEFORE the current
    # bucket (moving_fn shift=0) — ONE sum/count division, exact
    "search_dh_pipeline": r"""
        WITH w AS (SELECT doc_id,
                          18262 + (doc_id % 1096) AS pub_day, n_chars,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        m AS (SELECT date_trunc('month',
                     DATE '1970-01-01'
                     + CAST(pub_day AS INTEGER)) AS mo, n_chars
              FROM w WHERE list_contains(ws, 'data')),
        b AS (SELECT mo, CAST(count(*) AS BIGINT) AS doc_count,
                     CAST(sum(n_chars) AS BIGINT) AS sum_chars
              FROM m GROUP BY mo)
        SELECT strftime(mo, '%Y-%m-%d') AS key_as_string,
               CAST(datediff('day', DATE '1970-01-01', mo)
                    AS BIGINT) AS "key",
               doc_count, sum_chars,
               CAST(sum_chars - lag(sum_chars) OVER (ORDER BY mo)
                    AS DOUBLE) AS deriv,
               CAST(sum(doc_count) OVER (ORDER BY mo
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
               CAST(sum(doc_count) OVER w3 AS DOUBLE)
                   / count(doc_count) OVER w3 AS ma3
        FROM b
        WINDOW w3 AS (ORDER BY mo
                      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
    """,
    # bucket_script (avg = sum/count, one division) + bucket_selector
    # (count > 1) + bucket_sort (top 3 by the scripted value; tie-break
    # matches the engine's stable sort over count desc, lang asc)
    "search_bucket_script": r"""
        WITH m AS (SELECT lang, n_chars,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        g AS (SELECT lang, CAST(count(*) AS BIGINT) AS doc_count,
                     CAST(sum(n_chars) AS BIGINT) AS sum_chars
              FROM m WHERE list_contains(ws, 'data')
              GROUP BY lang HAVING count(*) > 1)
        SELECT lang, doc_count, sum_chars,
               CAST(sum_chars AS DOUBLE) / doc_count AS avg_chars
        FROM g
        ORDER BY avg_chars DESC, doc_count DESC, lang
        LIMIT 3
    """,
    # span_near satisfiability on token positions (1-based ordinality
    # zipped with unnest): ordered = an increasing chain within slack,
    # unordered = any two distinct positions within slack; slack =
    # (span - 1) - (n_terms - 1)
    "span_near_docs": r"""
        WITH toks AS (
            SELECT doc_id, unnest(ws) AS tok,
                   unnest(range(1, len(ws) + 1)) AS pos
            FROM (SELECT doc_id,
                         string_split_regex(lower(trim(text)),
                                            '\s+') AS ws
                  FROM documents))
        SELECT CAST(0 AS BIGINT) AS query_id, doc_id FROM documents d
        WHERE EXISTS (SELECT 1 FROM toks a JOIN toks b
                      ON a.doc_id = b.doc_id
                      WHERE a.doc_id = d.doc_id
                        AND a.tok = 'data' AND b.tok = 'stream'
                        AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2)
        UNION ALL
        SELECT CAST(1 AS BIGINT), doc_id FROM documents d
        WHERE EXISTS (SELECT 1 FROM toks a JOIN toks b
                      ON a.doc_id = b.doc_id
                      WHERE a.doc_id = d.doc_id
                        AND a.tok = 'merge' AND b.tok = 'sort'
                        AND abs(b.pos - a.pos) - 1 <= 3)
        UNION ALL
        SELECT CAST(2 AS BIGINT), doc_id FROM documents d
        WHERE EXISTS (SELECT 1 FROM toks a JOIN toks b
                      ON a.doc_id = b.doc_id
                      JOIN toks c ON b.doc_id = c.doc_id
                      WHERE a.doc_id = d.doc_id
                        AND a.tok = 'table' AND b.tok = 'scan'
                        AND c.tok = 'merge'
                        AND b.pos > a.pos AND c.pos > b.pos
                        AND c.pos - a.pos - 2 <= 2)
    """,
    # extended_stats: exact int partials; variance spelled with the
    # SAME float expression/order as the engine
    "search_extended_stats": r"""
        WITH m AS (SELECT n_chars FROM documents
                   WHERE list_contains(string_split_regex(
                       lower(trim(text)), '\s+'), 'data')),
        p AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(min(n_chars) AS BIGINT) AS mn,
                     CAST(max(n_chars) AS BIGINT) AS mx,
                     CAST(sum(n_chars) AS BIGINT) AS s,
                     CAST(sum(CAST(n_chars AS BIGINT)
                              * CAST(n_chars AS BIGINT))
                          AS BIGINT) AS ssq
              FROM m HAVING count(*) > 0)
        SELECT n AS cnt, mn AS vmin, mx AS vmax, s AS vsum,
               ssq,
               CAST(s AS DOUBLE) / n AS avg,
               (CAST(ssq AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n
                   AS variance,
               sqrt((CAST(ssq AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n)
                   AS std_dev
        FROM p
    """,
    # weighted_avg: exact int partial sums, one final division
    "search_weighted_avg": r"""
        WITH m AS (SELECT n_chars,
                          18262 + (doc_id % 1096) AS pub_day
                   FROM documents
                   WHERE list_contains(string_split_regex(
                       lower(trim(text)), '\s+'), 'data')),
        p AS (SELECT CAST(sum(CAST(n_chars AS BIGINT)
                              * CAST(pub_day AS BIGINT))
                          AS BIGINT) AS vw,
                     CAST(sum(pub_day) AS BIGINT) AS w
              FROM m HAVING count(*) > 0)
        SELECT CAST(vw AS DOUBLE) / w AS wavg FROM p
    """,
    # boxplot: exact five-number summary (quantile_disc == the
    # engine's nearest-rank convention)
    "search_boxplot": r"""
        WITH m AS (SELECT n_chars FROM documents
                   WHERE list_contains(string_split_regex(
                       lower(trim(text)), '\s+'), 'data'))
        SELECT CAST(min(n_chars) AS DOUBLE) AS "min",
               CAST(quantile_disc(n_chars, 0.25) AS DOUBLE) AS q1,
               CAST(quantile_disc(n_chars, 0.50) AS DOUBLE) AS q2,
               CAST(quantile_disc(n_chars, 0.75) AS DOUBLE) AS q3,
               CAST(max(n_chars) AS DOUBLE) AS "max"
        FROM m HAVING count(*) > 0
    """,
    # percentile_ranks: exact 100*(count<=v)/n, one division per probe
    "search_percentile_ranks": r"""
        WITH m AS (SELECT n_chars FROM documents
                   WHERE list_contains(string_split_regex(
                       lower(trim(text)), '\s+'), 'data'))
        SELECT 100.0 * count(*) FILTER (WHERE n_chars <= 100)
                   / count(*) AS r100,
               100.0 * count(*) FILTER (WHERE n_chars <= 250)
                   / count(*) AS r250,
               100.0 * count(*) FILTER (WHERE n_chars <= 400)
                   / count(*) AS r400,
               100.0 * count(*) FILTER (WHERE n_chars <= 550)
                   / count(*) AS r550
        FROM m HAVING count(*) > 0
    """,
    # multi_terms: tuple buckets, (count desc, key asc) at the cut
    "search_multi_terms": r"""
        WITH m AS (SELECT lang, source FROM documents
                   WHERE list_contains(string_split_regex(
                       lower(trim(text)), '\s+'), 'data'))
        SELECT lang, source, CAST(count(*) AS BIGINT) AS doc_count
        FROM m GROUP BY lang, source
        ORDER BY doc_count DESC, lang, source
        LIMIT 10
    """,
    # rare_terms: buckets at or under the threshold
    "search_rare_terms": r"""
        WITH m AS (SELECT source FROM documents
                   WHERE list_contains(string_split_regex(
                       lower(trim(text)), '\s+'), 'data'))
        SELECT source, CAST(count(*) AS BIGINT) AS doc_count
        FROM m GROUP BY source HAVING count(*) <= 30
    """,
    # date_histogram min_doc_count=0 + extended_bounds: every month
    # in the bounded range, zero-filled
    "search_dh_empty_buckets": r"""
        WITH w AS (SELECT doc_id, n_chars,
                          18262 + (doc_id % 1096) AS pub_day,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        m AS (SELECT date_trunc('month',
                     DATE '1970-01-01'
                     + CAST(pub_day AS INTEGER)) AS mo
              FROM w WHERE list_contains(ws, 'data')
                AND n_chars >= 460),
        c AS (SELECT mo, CAST(count(*) AS BIGINT) AS n
              FROM m GROUP BY mo),
        months AS (SELECT unnest(generate_series(
                       DATE '2020-01-01', DATE '2022-12-01',
                       INTERVAL 1 MONTH))::DATE AS mo)
        SELECT strftime(months.mo, '%Y-%m-%d') AS key_as_string,
               CAST(datediff('day', DATE '1970-01-01', months.mo)
                    AS BIGINT) AS "key",
               CAST(coalesce(c.n, 0) AS BIGINT) AS doc_count
        FROM months LEFT JOIN c ON months.mo = c.mo
    """,
    # DSL-body percolation: each body re-expressed as SQL predicates
    # over the same doc (sloppy phrase = bounded intervening-token
    # regex, the engine's ordered-chain slack rule)
    "percolate_dsl_docs": r"""
        WITH w AS (SELECT doc_id, lang, n_chars, lower(trim(text))
                       AS lt,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents)
        SELECT doc_id, CAST(0 AS BIGINT) AS query_id FROM w
        WHERE list_contains(ws, 'data')
          AND list_contains(ws, 'stream')
          AND NOT list_contains(ws, 'vector')
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT) FROM w
        WHERE lang = 'en' AND n_chars >= 200
          AND regexp_matches(lt,
              '(^|[^a-z0-9_])table([^a-z0-9_]+[a-z0-9_]+){0,1}[^a-z0-9_]+scan([^a-z0-9_]|$)')
        UNION ALL
        SELECT doc_id, CAST(2 AS BIGINT) FROM w
        WHERE list_contains(ws, 'merge') AND list_contains(ws, 'sort')
    """,
    # stemmed-analyzer retrieval: inflected query forms conflate with
    # corpus words at the Porter stem; "the" is stop-filtered away
    "stemmed_match_docs": r"""
        WITH w AS (SELECT doc_id,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents)
        SELECT CAST(0 AS BIGINT) AS query_id, doc_id FROM w
        WHERE list_contains(ws, 'query')     -- queries → queri
        UNION ALL
        SELECT CAST(1 AS BIGINT), doc_id FROM w
        WHERE list_contains(ws, 'table')     -- tables → tabl
        UNION ALL
        SELECT CAST(2 AS BIGINT), doc_id FROM w
        WHERE list_contains(ws, 'merge')     -- merged → merg
        -- query_id 3 ("the") is stop-filtered: no rows by design
    """,
    # _termvectors: per-doc term counts + corpus-wide df/cf
    "doc_termvectors": r"""
        WITH toks0 AS (SELECT doc_id,
                              unnest(string_split_regex(
                                  lower(trim(text)), '\s+')) AS term
                       FROM documents),
        -- splitting an EMPTY text yields [''] — drop it like the
        -- tokenizer does (deep-seed fuzz: an all-empty doc produced a
        -- spurious ''-term row)
        toks AS (SELECT doc_id, term FROM toks0 WHERE term <> ''),
        v AS (SELECT doc_id, term,
                     CAST(count(*) AS BIGINT) AS term_freq
              FROM toks WHERE doc_id IN (0, 1, 2, 3, 4, 7, 11)
              GROUP BY doc_id, term),
        s AS (SELECT term,
                     CAST(count(DISTINCT doc_id) AS BIGINT)
                         AS doc_freq,
                     CAST(count(*) AS BIGINT) AS total_freq
              FROM toks GROUP BY term)
        SELECT v.doc_id, v.term, v.term_freq, s.doc_freq,
               s.total_freq
        FROM v JOIN s USING (term)
    """,
    # script_score: metadata-only arithmetic re-scoring of the match
    # set — same single exact division, same tie-break
    "search_script_score": r"""
        WITH w AS (SELECT doc_id, n_chars,
                          18262 + (doc_id % 1096) AS pub_day,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        m AS (SELECT doc_id,
                     n_chars * 1.0 / (1 + pub_day % 7) AS score
              FROM w WHERE list_contains(ws, 'data')),
        r AS (SELECT doc_id, score,
                     row_number() OVER (ORDER BY score DESC,
                                        doc_id ASC) AS rank
              FROM m)
        SELECT CAST(rank AS BIGINT) AS rank, doc_id,
               CAST(score AS DOUBLE) AS score
        FROM r WHERE rank <= 20
    """,
    # ids query: present subset of a fixed id list
    "ids_filter_docs": r"""
        SELECT doc_id FROM documents
        WHERE doc_id IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144,
                         999999999)
    """,
    # date_range buckets [from, to) over the derived epoch-day column
    "search_date_range_agg": r"""
        WITH w AS (SELECT doc_id,
                          18262 + (doc_id % 1096) AS pub_day,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        m AS (SELECT pub_day FROM w WHERE list_contains(ws, 'data')),
        b AS (SELECT datediff('day', DATE '1970-01-01',
                              DATE '2020-07-01') AS d1,
                     datediff('day', DATE '1970-01-01',
                              DATE '2022-01-01') AS d2)
        SELECT '*-2020-07-01' AS "key",
               CAST(count(*) FILTER (WHERE pub_day < d1) AS BIGINT)
                   AS doc_count FROM m, b
        UNION ALL
        SELECT '2020-07-01-2022-01-01',
               CAST(count(*) FILTER (WHERE pub_day >= d1
                                       AND pub_day < d2) AS BIGINT)
        FROM m, b
        UNION ALL
        SELECT '2022-01-01-*',
               CAST(count(*) FILTER (WHERE pub_day >= d2) AS BIGINT)
        FROM m, b
    """,
    # adjacency_matrix: named predicate counts + pairwise
    # intersections over the match set, zero cells dropped
    "search_adjacency_matrix": r"""
        WITH m AS (SELECT lang, n_chars,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        d AS (SELECT lang = 'en' AS en, n_chars >= 250 AS lng,
                     list_contains(ws, 'vector') AS vec
              FROM m WHERE list_contains(ws, 'data')),
        c AS (
            SELECT 'en' AS "key",
                   CAST(count(*) FILTER (WHERE en) AS BIGINT) AS
                       doc_count FROM d
            UNION ALL SELECT 'long',
                   CAST(count(*) FILTER (WHERE lng) AS BIGINT) FROM d
            UNION ALL SELECT 'vec',
                   CAST(count(*) FILTER (WHERE vec) AS BIGINT) FROM d
            UNION ALL SELECT 'en&long',
                   CAST(count(*) FILTER (WHERE en AND lng) AS BIGINT)
                   FROM d
            UNION ALL SELECT 'en&vec',
                   CAST(count(*) FILTER (WHERE en AND vec) AS BIGINT)
                   FROM d
            UNION ALL SELECT 'long&vec',
                   CAST(count(*) FILTER (WHERE lng AND vec) AS BIGINT)
                   FROM d)
        SELECT * FROM c WHERE doc_count > 0
    """,
    # SynonymQuery match sets: a group matches when ANY member token
    # occurs; operator=and requires every group
    "synonym_match_docs": r"""
        WITH w AS (SELECT doc_id,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents)
        SELECT CAST(0 AS BIGINT) AS query_id, doc_id FROM w
        WHERE (list_contains(ws, 'data') OR list_contains(ws, 'stream'))
          AND (list_contains(ws, 'merge') OR list_contains(ws, 'sort'))
        UNION ALL
        SELECT CAST(1 AS BIGINT), doc_id FROM w
        WHERE list_contains(ws, 'table') OR list_contains(ws, 'scan')
    """,
    # span_first: first occurrence of the term within the first N
    # token positions (list_position is 1-based, the engine's 0-based
    # pos < end is the same predicate)
    "span_first_docs": r"""
        WITH w AS (SELECT doc_id,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents)
        SELECT CAST(0 AS BIGINT) AS query_id, doc_id FROM w
        WHERE list_position(ws, 'data') BETWEEN 1 AND 3
        UNION ALL
        SELECT CAST(1 AS BIGINT), doc_id FROM w
        WHERE list_position(ws, 'stream') BETWEEN 1 AND 5
    """,
    # span_not: an include-term position with no exclude-term position
    # within dist=2
    "span_not_docs": r"""
        WITH toks AS (
            SELECT doc_id, unnest(ws) AS tok,
                   unnest(range(1, len(ws) + 1)) AS pos
            FROM (SELECT doc_id,
                         string_split_regex(lower(trim(text)),
                                            '\s+') AS ws
                  FROM documents))
        SELECT doc_id FROM documents d
        WHERE EXISTS (
            SELECT 1 FROM toks a
            WHERE a.doc_id = d.doc_id AND a.tok = 'data'
              AND NOT EXISTS (
                  SELECT 1 FROM toks b
                  WHERE b.doc_id = a.doc_id AND b.tok = 'vector'
                    AND abs(b.pos - a.pos) <= 2))
    """,
    # sibling stats_bucket over the monthly bucket doc counts: exact
    # int min/max/sum, avg is the same single sum/count division
    "search_sibling_stats": r"""
        WITH w AS (SELECT doc_id,
                          18262 + (doc_id % 1096) AS pub_day,
                          string_split_regex(lower(trim(text)),
                                             '\s+') AS ws
                   FROM documents),
        b AS (SELECT date_trunc('month',
                     DATE '1970-01-01'
                     + CAST(pub_day AS INTEGER)) AS mo,
                     CAST(count(*) AS BIGINT) AS c
              FROM w WHERE list_contains(ws, 'data') GROUP BY mo)
        SELECT CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(min(c) AS BIGINT) AS min_docs,
               CAST(max(c) AS BIGINT) AS max_docs,
               CAST(sum(c) AS BIGINT) AS sum_docs,
               CAST(sum(c) AS DOUBLE) / count(*) AS avg_docs
        FROM b HAVING count(*) > 0
    """,
}


# ---------------------------------------------------------------------------
# BM25 in SQL (round-5: promote the headline search family from rows-only
# to hash-exact). On the word-list test corpus the engine's analyzer
# degenerates to whitespace split + lowercase (no camelCase, no CJK —
# the same equivalence the doc_token_count / doc_term_df_top oracles
# already rely on), so full Lucene-default BM25 (k1=1.2, b=0.75,
# idf = ln(1 + (N - df + 0.5)/(df + 0.5)), global stats even under
# metadata filters) is expressible in one DuckDB query. Query-side term
# extraction uses the engine's own tokenizer (query analysis is a
# driver-side constant; the corpus-side scoring is what SQL verifies).

_BM25_TEMPLATE = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents),
    tok2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                     (SELECT sum(dl) FROM dl)::DOUBLE
                     / (SELECT count(*) FROM documents) AS avgdl),
    q(query_id, k, term) AS (VALUES {values}),
    df AS (SELECT term, count(DISTINCT doc_id) AS df
           FROM tok2 GROUP BY term),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM tok2 GROUP BY doc_id, term),
    scored AS (
      -- per-term contributions snapped to a 1e-12 grid and summed as
      -- exact BIGINTs: DuckDB's parallel float sum is order-
      -- nondeterministic run to run, which can flip the doc_id
      -- tiebreak between docs whose true scores are exactly equal
      SELECT q.query_id, q.k, t.doc_id,
             sum(CAST(round(
                 ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.tf
                 / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
                 * 1e12) AS BIGINT)) / 1e12 AS score
      FROM q JOIN df d USING (term) JOIN tf t USING (term)
      JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN stats s
      {doc_restrict}
      GROUP BY q.query_id, q.k, t.doc_id),
    ranked AS (
      SELECT query_id, k, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rn
      FROM scored)
    {select}
"""


def _bm25_values(queries) -> str:
    """(query_id, k, term) VALUES rows — one per DISTINCT analyzed query
    term, via the engine's own tokenizer (sorted-set semantics match
    ``QueryEngine._iters``)."""
    from baram_ray.tokenizer import tokenize
    rows = []
    for q in queries:
        for t in sorted(set(tokenize(q["text"]))):
            safe = t.replace("'", "''")
            rows.append(f"({q['query_id']}, {int(q.get('k', 10))},"
                        f" '{safe}')")
    return ", ".join(rows)


def _bm25_sql(queries, *, doc_restrict: str = "", min_score=None,
              select: str | None = None) -> str:
    flt = f" AND score >= {min_score}" if min_score is not None else ""
    if select is None:
        select = f"""
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(rn AS BIGINT) AS rank, doc_id,
           round(score, 6) AS score
    FROM ranked WHERE rn <= k{flt}"""
    return _BM25_TEMPLATE.format(values=_bm25_values(queries),
                                 doc_restrict=doc_restrict,
                                 select=select)


def _register_bm25_oracles() -> None:
    from baram_ray.pipelines.search import DOC_QUERIES

    ORACLES["search_bm25_topk"] = _bm25_sql(DOC_QUERIES)
    # the sharded scatter-gather merge is rank-identical by contract
    ORACLES["search_bm25_sharded"] = _bm25_sql(DOC_QUERIES)

    one = [{"query_id": 0, "text": "data stream query", "k": 10}]
    flat = """
    SELECT CAST(rn AS BIGINT) AS rank, doc_id, round(score, 6) AS score
    FROM ranked WHERE rn <= k"""
    # lang term filter + min_score (engine applies min_score AFTER the
    # top-k cut — a suffix of the score-desc list, so rn is unchanged)
    ORACLES["search_bm25_filtered"] = _bm25_sql(
        one,
        doc_restrict="JOIN documents dd ON dd.doc_id = t.doc_id "
                     "AND dd.lang = 'en'",
        select=flat + " AND score >= 0.01")
    # n_chars gte/lte range mask (global idf/avgdl per engine semantics)
    ORACLES["search_bm25_daterange"] = _bm25_sql(
        one,
        doc_restrict="JOIN documents dd ON dd.doc_id = t.doc_id "
                     "AND dd.n_chars BETWEEN 100 AND 400",
        select=flat)
    # search_after pagination: pages of 7, first 3 pages == top-21
    ORACLES["search_bm25_paged"] = _bm25_sql(
        [{"query_id": 0, "text": "table scan filter", "k": 21}],
        select="""
    SELECT CAST((rn - 1) // 7 AS BIGINT) AS page,
           CAST((rn - 1) % 7 + 1 AS BIGINT) AS rank,
           doc_id, round(score, 6) AS score
    FROM ranked WHERE rn <= k""")

    # G12 vocabulary statistics recomputed from raw text
    ORACLES["search_term_stats"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(lower(text), '\s+')) AS term
          FROM documents),
        tok2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        d AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
              FROM tok2 GROUP BY term)
        SELECT CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax_terms,
               round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE
                     / greatest(count(*), 1), 6) AS hapax_rate,
               CAST(sum(cf) AS BIGINT) AS cf_total,
               CAST(max(df) AS BIGINT) AS max_df
        FROM d
    """


_register_bm25_oracles()


# ---------------------------------------------------------------------------
# Expansion-scored query kinds (prefix / wildcard / fuzzy) and boolean
# BM25 — same corpus-side BM25 in SQL, with the term set derived from
# the vocabulary exactly as the engine expands it (term-dict order,
# 50-expansion cap — the test vocabulary is far below the cap).

_BM25_EXP_TEMPLATE = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents),
    tok2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                     (SELECT sum(dl) FROM dl)::DOUBLE
                     / (SELECT count(*) FROM documents) AS avgdl),
    vocab AS (SELECT DISTINCT term FROM tok2),
    exp(query_id, k, term, w) AS ({exp}),
    df AS (SELECT term, count(DISTINCT doc_id) AS df
           FROM tok2 GROUP BY term),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM tok2 GROUP BY doc_id, term),
    scored AS (
      -- exact integer-grid sum (see _BM25_TEMPLATE note): immune to
      -- DuckDB's order-nondeterministic parallel float aggregation
      SELECT e.query_id, e.k, t.doc_id,
             sum(CAST(round(
                 e.w * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.tf
                 / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
                 * 1e12) AS BIGINT)) / 1e12 AS score
      FROM exp e JOIN df d ON d.term = e.term
      JOIN tf t ON t.term = e.term
      JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN stats s
      GROUP BY e.query_id, e.k, t.doc_id),
    ranked AS (
      SELECT query_id, k, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rn
      FROM scored)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(rn AS BIGINT) AS rank, doc_id,
           round(score, 6) AS score
    FROM ranked WHERE rn <= k
"""


def _register_expansion_oracles() -> None:
    from baram_ray.pipelines.search import (FUZZY_QUERIES, PREFIX_QUERIES,
                                            WILDCARD_QUERIES)
    from baram_ray.tokenizer import tokenize

    # prefix: first 50 vocab terms with the analyzed prefix, weight 1
    parts = []
    for q in PREFIX_QUERIES:
        pre = tokenize(q["text"])[0].replace("'", "''")
        parts.append(f"""
        SELECT {q['query_id']}, {int(q.get('k', 10))}, term, 1.0::DOUBLE
        FROM (SELECT term FROM vocab WHERE term LIKE '{pre}%'
              ORDER BY term LIMIT 50)""")
    ORACLES["search_prefix_topk"] = _BM25_EXP_TEMPLATE.format(
        exp=" UNION ALL ".join(parts))

    # wildcard: glob over the vocab (pattern lowercased, not analyzed)
    parts = []
    for q in WILDCARD_QUERIES:
        pat = q["text"].strip().lower().replace("'", "''")
        parts.append(f"""
        SELECT {q['query_id']}, {int(q.get('k', 10))}, term, 1.0::DOUBLE
        FROM (SELECT term FROM vocab WHERE term GLOB '{pat}'
              ORDER BY term LIMIT 50)""")
    ORACLES["search_wildcard_topk"] = _BM25_EXP_TEMPLATE.format(
        exp=" UNION ALL ".join(parts))

    # fuzzy: Damerau-Levenshtein AUTO expansion per analyzed query term,
    # Lucene fuzzy downweight 1 − d/len(qt)
    parts = []
    for q in FUZZY_QUERIES:
        for qt in sorted(set(tokenize(q["text"]))):
            me = 0 if len(qt) < 3 else (1 if len(qt) <= 5 else 2)
            safe = qt.replace("'", "''")
            parts.append(f"""
        SELECT {q['query_id']}, {int(q.get('k', 10))}, term,
               CASE WHEN d = 0 THEN 1.0
                    ELSE greatest(0.0, 1.0 - d / {len(qt)}.0) END
        FROM (SELECT term, damerau_levenshtein(term, '{safe}') AS d
              FROM vocab
              WHERE damerau_levenshtein(term, '{safe}') <= {me}
              ORDER BY d, term LIMIT 50)""")
    ORACLES["search_fuzzy_topk"] = _BM25_EXP_TEMPLATE.format(
        exp=" UNION ALL ".join(parts))


_register_expansion_oracles()

# shared whitespace-tokenizer prelude (corpus stats + per-(doc,term)
# tf) — the non-positional counterpart of _POS_PREFIX; every BM25-
# derived oracle below builds on this one text, so a tokenizer- or
# stats-equivalence change edits exactly one place
_TF_PREFIX = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents),
    tok2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                     (SELECT sum(dl) FROM dl)::DOUBLE
                     / (SELECT count(*) FROM documents) AS avgdl),
    df AS (SELECT term, count(DISTINCT doc_id) AS df
           FROM tok2 GROUP BY term),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM tok2 GROUP BY doc_id, term),
"""

# boolean BM25 (BOOL_QUERIES probes): score = Σ BM25 of every
# must/should clause term present; eligibility = all must clauses
# match AND ≥ msm should clauses match AND no must_not clause matches.
ORACLES["search_bool_topk"] = _TF_PREFIX + r"""
    bm AS (SELECT t.doc_id, t.term,
                  -- 1e-12-grid integer contribution (exact sums; see
                  -- _BM25_TEMPLATE note on DuckDB float-sum order)
                  CAST(round(
                      ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.tf
                      / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                       / s.avgdl)) * 1e12) AS BIGINT)
                      AS s
           FROM tf t JOIN df d USING (term)
           JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN stats s
           WHERE t.term IN ('data', 'table', 'scan', 'merge', 'sort',
                            'query', 'hash', 'join', 'group', 'agg')),
    flags AS (SELECT doc_id,
                     bool_or(term = 'data')  AS h_data,
                     bool_or(term = 'query') AS h_query,
                     bool_or(term = 'vector') AS h_vector,
                     bool_or(term IN ('table', 'scan'))  AS c_ts,
                     bool_or(term IN ('merge', 'sort'))  AS c_ms,
                     bool_or(term IN ('hash', 'join'))   AS c_hj,
                     bool_or(term IN ('group', 'agg'))   AS c_ga
              FROM tok2 GROUP BY doc_id),
    q0 AS (SELECT 0 AS query_id, 10 AS k, b.doc_id, sum(b.s) / 1e12 AS score
           FROM bm b JOIN flags f ON f.doc_id = b.doc_id
           WHERE b.term IN ('data', 'table', 'scan', 'merge', 'sort')
             AND f.h_data AND (f.c_ts::INT + f.c_ms::INT) >= 1
           GROUP BY b.doc_id),
    q1 AS (SELECT 1 AS query_id, 10 AS k, b.doc_id, sum(b.s) / 1e12 AS score
           FROM bm b JOIN flags f ON f.doc_id = b.doc_id
           WHERE b.term = 'query' AND f.h_query AND NOT f.h_vector
           GROUP BY b.doc_id),
    q2 AS (SELECT 2 AS query_id, 15 AS k, b.doc_id, sum(b.s) / 1e12 AS score
           FROM bm b JOIN flags f ON f.doc_id = b.doc_id
           WHERE b.term IN ('hash', 'join', 'group', 'agg')
             AND f.c_hj AND f.c_ga
           GROUP BY b.doc_id),
    scored AS (SELECT * FROM q0 UNION ALL SELECT * FROM q1
               UNION ALL SELECT * FROM q2),
    ranked AS (
      SELECT query_id, k, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rn
      FROM scored)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(rn AS BIGINT) AS rank, doc_id,
           round(score, 6) AS score
    FROM ranked WHERE rn <= k
"""


# ---------------------------------------------------------------------------
# Round 5: positional BM25 in SQL. With token positions recoverable in
# DuckDB (unnest + generate_subscripts zip in list order; positions are
# indices among non-empty tokens — identical to the index builder's
# position stream on the whitespace-equivalent test corpus), the
# phrase family and everything layered on it (rescore, collapse,
# boosting, more-like-this) become hash-exact oracles. Lucene
# PhraseQuery scoring per the engine (`query/engine.py:_phrase_field`):
# score = (Σ idf over distinct phrase terms) · fr / (fr + k1(1-b+b·dl/avgdl))
# with fr = |base offsets aligning every term|; for distinct-term
# phrases that is exactly the adjacency-join count below.

_POS_PREFIX = r"""
    WITH raw AS (SELECT doc_id,
                        string_split_regex(lower(text), '\s+') AS arr
                 FROM documents),
    tokp AS (SELECT doc_id, unnest(arr) AS term,
                    generate_subscripts(arr, 1) AS idx
             FROM raw),
    pos AS (SELECT doc_id, term,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY idx) - 1 AS p
            FROM tokp WHERE term <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM pos GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                     (SELECT sum(dl) FROM dl)::DOUBLE
                     / (SELECT count(*) FROM documents) AS avgdl),
    df AS (SELECT term, count(DISTINCT doc_id) AS df
           FROM pos GROUP BY term),
"""




def _phrase_fr_select(qid: int, k: int, terms: list[str]) -> str:
    """Adjacency-join phrase-frequency SELECT for one distinct-term
    phrase (one JOIN per subsequent term at offset +j)."""
    joins = []
    for j, t in enumerate(terms[1:], 1):
        safe = t.replace("'", "''")
        joins.append(f"JOIN pos p{j} ON p{j}.doc_id = p0.doc_id "
                     f"AND p{j}.p = p0.p + {j} AND p{j}.term = '{safe}'")
    t0 = terms[0].replace("'", "''")
    return (f"SELECT {qid} AS query_id, {k} AS k, p0.doc_id,"
            f" count(*) AS fr FROM pos p0 {' '.join(joins)}"
            f" WHERE p0.term = '{t0}' GROUP BY p0.doc_id")


def _register_phrase_oracles() -> None:
    from baram_ray.pipelines.search import DOC_QUERIES, PHRASE_QUERIES
    from baram_ray.tokenizer import tokenize

    frs, qts = [], []
    for q in PHRASE_QUERIES:
        terms = tokenize(q["text"])
        frs.append(_phrase_fr_select(q["query_id"], int(q.get("k", 10)),
                                     terms))
        for t in sorted(set(terms)):
            qts.append(f"({q['query_id']}, '{t.replace(chr(39), chr(39) * 2)}')")
    ORACLES["search_phrase_topk"] = _POS_PREFIX + f"""
    fr AS ({' UNION ALL '.join(frs)}),
    qidf AS (SELECT qt.query_id,
                    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)))
                        AS idf_sum
             FROM (VALUES {', '.join(qts)}) AS qt(query_id, term)
             JOIN df d USING (term) CROSS JOIN stats s
             GROUP BY qt.query_id),
    scored AS (SELECT f.query_id, f.k, f.doc_id,
                      i.idf_sum * f.fr
                      / (f.fr + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
                          AS score
               FROM fr f JOIN qidf i USING (query_id)
               JOIN dl ON dl.doc_id = f.doc_id CROSS JOIN stats s),
    ranked AS (SELECT query_id, k, doc_id, score,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, doc_id)
                          AS rn
               FROM scored)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(rn AS BIGINT) AS rank, doc_id, round(score, 6) AS score
    FROM ranked WHERE rn <= k
    """

    # rescore (QueryRescorer): BM25 'data stream' top-50 window,
    # comb = 0.7·primary + 1.3·phrase("table scan") where it matches
    # (engine: query/engine.py search_rescore — strict-head window)
    ORACLES["search_rescore_topk"] = _POS_PREFIX + r"""
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM pos GROUP BY doc_id, term),
    prim AS (SELECT t.doc_id,
                    sum(CAST(round(
                        ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.tf
                        / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                         / s.avgdl)) * 1e12) AS BIGINT))
                        / 1e12 AS s1
             FROM tf t JOIN df d USING (term)
             JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN stats s
             WHERE t.term IN ('data', 'stream')
             GROUP BY t.doc_id),
    win AS (SELECT doc_id, s1,
                   row_number() OVER (ORDER BY s1 DESC, doc_id) AS wrn
            FROM prim),
    fr AS (SELECT p0.doc_id, count(*) AS fr
           FROM pos p0
           JOIN pos p1 ON p1.doc_id = p0.doc_id AND p1.p = p0.p + 1
                       AND p1.term = 'scan'
           WHERE p0.term = 'table' GROUP BY p0.doc_id),
    pidf AS (SELECT sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)))
                 AS idf_sum
             FROM df d CROSS JOIN stats s
             WHERE d.term IN ('table', 'scan')),
    ph AS (SELECT f.doc_id,
                  i.idf_sum * f.fr
                  / (f.fr + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
                      AS s2
           FROM fr f CROSS JOIN pidf i
           JOIN dl ON dl.doc_id = f.doc_id CROSS JOIN stats s),
    comb AS (SELECT w.doc_id,
                    0.7 * w.s1 + 1.3 * coalesce(p.s2, 0.0) AS score
             FROM win w LEFT JOIN ph p USING (doc_id)
             WHERE w.wrn <= 50),
    ranked AS (SELECT doc_id, score,
                      row_number() OVER (ORDER BY score DESC, doc_id)
                          AS rn
               FROM comb)
    SELECT CAST(rn AS BIGINT) AS rank, doc_id, round(score, 6) AS score
    FROM ranked WHERE rn <= 10
    """

    # boosting query: positive match 'data stream' demoted ×0.25 where
    # 'vector' also matches (engine: query/engine.py search_boosting)
    ORACLES["search_boosting_topk"] = _TF_PREFIX + r"""
    scored AS (SELECT t.doc_id,
                      sum(CAST(round(
                          ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.tf
                          / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                           / s.avgdl)) * 1e12) AS BIGINT))
                          / 1e12 AS score
               FROM tf t JOIN df d USING (term)
               JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN stats s
               WHERE t.term IN ('data', 'stream')
               GROUP BY t.doc_id),
    neg AS (SELECT DISTINCT doc_id FROM tok2 WHERE term = 'vector'),
    fin AS (SELECT s.doc_id,
                   s.score * (CASE WHEN n.doc_id IS NULL THEN 1.0
                                   ELSE 0.25 END) AS score
            FROM scored s LEFT JOIN neg n USING (doc_id)),
    ranked AS (SELECT doc_id, score,
                      row_number() OVER (ORDER BY score DESC, doc_id)
                          AS rn
               FROM fin)
    SELECT CAST(rn AS BIGINT) AS rank, doc_id, round(score, 6) AS score
    FROM ranked WHERE rn <= 10
    """

    # field collapse: globally-sorted hits keep the first per `source`
    # group == best (score desc, doc_id) per group, re-ranked
    ORACLES["search_collapse_docs"] = _bm25_sql(DOC_QUERIES, select="""
    , coll AS (SELECT r.query_id, r.k, r.doc_id, r.score,
                      d.source AS grp,
                      row_number() OVER (PARTITION BY r.query_id, d.source
                                         ORDER BY r.score DESC, r.doc_id)
                          AS grn
               FROM ranked r JOIN documents d ON d.doc_id = r.doc_id),
    cranked AS (SELECT query_id, k, doc_id, score, grp,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, doc_id)
                           AS rn
                FROM coll WHERE grn = 1)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(rn AS BIGINT) AS rank, doc_id, round(score, 6) AS score,
           grp AS "group"
    FROM cranked WHERE rn <= k""")

    # more-like-this: seed doc 0's top-5 tf·idf terms (desc, term asc
    # tiebreak — exactly pipelines/search.py search_mlt's sort) as a
    # bool-should msm=1 query, seed excluded
    ORACLES["search_mlt"] = _TF_PREFIX + r"""
    mterm AS (SELECT t.term
              FROM tf t JOIN df d USING (term) CROSS JOIN stats s
              WHERE t.doc_id = 0
              ORDER BY t.tf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                           DESC,
                       t.term
              LIMIT 5),
    scored AS (SELECT t.doc_id,
                      sum(CAST(round(
                          ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.tf
                          / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                           / s.avgdl)) * 1e12) AS BIGINT))
                          / 1e12 AS score
               FROM tf t JOIN mterm m USING (term)
               JOIN df d USING (term)
               JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN stats s
               WHERE t.doc_id <> 0
               GROUP BY t.doc_id),
    ranked AS (SELECT doc_id, score,
                      row_number() OVER (ORDER BY score DESC, doc_id)
                          AS rn
               FROM scored)
    SELECT CAST(rn AS BIGINT) AS rank, doc_id, round(score, 6) AS score
    FROM ranked WHERE rn <= 10
    """


_register_phrase_oracles()


# ---------------------------------------------------------------------------
# Hybrid fusion in SQL: with BM25 (grid-summed) and exact cosine
# (list_cosine_similarity over DOUBLE casts) both SQL-expressible, the
# two hybrid combiners become oracles — min-max weighted mean
# (pipelines/search.py hybrid_topk: 0.3·bm25 + 0.7·knn over the
# top-100 pools) and reciprocal rank fusion (hybrid_rrf_topk:
# Σ 1/(60 + rank), rank-only). vec_id == doc_id in the testdata.

_HYBRID_BASE = _TF_PREFIX + r"""
    bscore AS (SELECT t.doc_id,
                      sum(CAST(round(
                          ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.tf
                          / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                           / s.avgdl)) * 1e12) AS BIGINT))
                          / 1e12 AS score
               FROM tf t JOIN df d USING (term)
               JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN stats s
               WHERE t.term IN ('data', 'query', 'stream')
               GROUP BY t.doc_id),
    branked AS (SELECT doc_id, score,
                       row_number() OVER (ORDER BY score DESC, doc_id)
                           AS rn
                FROM bscore),
    bpool AS (SELECT doc_id, score, rn FROM branked WHERE rn <= 100),
    qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id = 0),
    ks AS (SELECT e.vec_id AS doc_id,
                  list_cosine_similarity(e.embedding::DOUBLE[], q.v) AS c
           FROM embeddings e, qv q WHERE e.vec_id <> 0),
    kranked AS (SELECT doc_id, c,
                       row_number() OVER (ORDER BY c DESC, doc_id) AS rn
                FROM ks),
    kpool AS (SELECT doc_id, c, rn FROM kranked WHERE rn <= 100),
"""

ORACLES["search_hybrid_topk"] = _HYBRID_BASE + r"""
    bn AS (SELECT doc_id,
                  CASE WHEN mx = mn THEN 1.0
                       ELSE (score - mn) / (mx - mn) END AS ns
           FROM bpool,
                (SELECT min(score) AS mn, max(score) AS mx FROM bpool)),
    kn AS (SELECT doc_id,
                  CASE WHEN mx = mn THEN 1.0
                       ELSE (c - mn) / (mx - mn) END AS ns
           FROM kpool,
                (SELECT min(c) AS mn, max(c) AS mx FROM kpool)),
    merged AS (SELECT doc_id,
                      0.3 * coalesce(b.ns, 0.0)
                      + 0.7 * coalesce(k.ns, 0.0) AS score
               FROM bn b FULL OUTER JOIN kn k USING (doc_id)),
    ranked AS (SELECT doc_id, score,
                      row_number() OVER (ORDER BY score DESC, doc_id)
                          AS rn
               FROM merged)
    SELECT CAST(rn AS BIGINT) AS rank, doc_id, round(score, 6) AS score
    FROM ranked WHERE rn <= 10
"""

ORACLES["search_hybrid_rrf"] = _HYBRID_BASE + r"""
    fused AS (SELECT doc_id, sum(1.0 / (60 + rn)) AS score
              FROM (SELECT doc_id, rn FROM bpool
                    UNION ALL SELECT doc_id, rn FROM kpool)
              GROUP BY doc_id),
    ranked AS (SELECT doc_id, score,
                      row_number() OVER (ORDER BY score DESC, doc_id)
                          AS rn
               FROM fused)
    SELECT CAST(rn AS BIGINT) AS rank, doc_id, round(score, 6) AS score
    FROM ranked WHERE rn <= 10
"""


# sampler aggregation: terms sub-agg over the GLOBAL top-100 BM25
# matches for 'data' (single-reader sampler — the sample is
# rank-defined, so with BM25 in SQL it is too; the driver compare is
# order-insensitive, so bucket ordering is immaterial)
ORACLES["search_sampler"] = _TF_PREFIX + r"""
    scored AS (SELECT t.doc_id,
                      sum(CAST(round(
                          ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * t.tf
                          / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                           / s.avgdl)) * 1e12) AS BIGINT))
                          / 1e12 AS score
               FROM tf t JOIN df d USING (term)
               JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN stats s
               WHERE t.term = 'data'
               GROUP BY t.doc_id),
    smp AS (SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS rn
            FROM scored)
    SELECT d.lang, CAST(count(*) AS BIGINT) AS doc_count
    FROM smp s JOIN documents d USING (doc_id)
    WHERE s.rn <= 100
    GROUP BY d.lang
"""


def _slop_sql(queries) -> str:
    """Sloppy-phrase BM25 in SQL for the given (query_id, text, k,
    slop) probes. The engine's two-pass sweep
    (`query/engine.py:_sloppy_freq`) emits exactly the
    containment-minimal ordered spans, so the window set is
    declaratively expressible: valid spans (s from the first term's
    positions, e from the last term's, an ORDERED chain of every
    intermediate term strictly inside — b₁ < b₂ < … between s and e,
    matching the sweep's in_order=True semantics) minus any span that
    strictly contains another valid span. Each minimal span with
    slack = (e - s) - (m-1) ≤ slop contributes 1/(1+slack);
    score = idf_sum · fr / (fr + k1(1-b+b·dl/avgdl)). Property-tested
    against ``_sloppy_freq`` up to 4-term phrases
    (tests/test_differential.py)."""
    from baram_ray.tokenizer import tokenize

    spans, qidf, qmeta = [], [], []
    for q in queries:
        terms = tokenize(q["text"])
        qid, k, slop = q["query_id"], int(q.get("k", 10)), int(q["slop"])
        m = len(terms)
        t0 = terms[0].replace("'", "''")
        tl = terms[-1].replace("'", "''")
        # one EXISTS with an ORDERED chain over ALL intermediate terms
        # (independent per-term EXISTS would accept out-of-order
        # middles for m >= 4 — the engine's sweep rejects those)
        mid = ""
        if m > 2:
            froms, conds, prev = [], [], "a"
            for j, t in enumerate(terms[1:-1], 1):
                safe = t.replace("'", "''")
                froms.append(f"pos b{j}")
                conds.append(f"b{j}.doc_id = a.doc_id AND "
                             f"b{j}.term = '{safe}' AND "
                             f"b{j}.p > {prev}.p")
                prev = f"b{j}"
            mid = (f"AND EXISTS (SELECT 1 FROM {', '.join(froms)} "
                   f"WHERE {' AND '.join(conds)} "
                   f"AND {prev}.p < c.p)")
        spans.append(f"""
        SELECT {qid} AS query_id, a.doc_id, a.p AS s, c.p AS e
        FROM pos a JOIN pos c ON c.doc_id = a.doc_id
                              AND c.term = '{tl}' AND c.p >= a.p + {m - 1}
        WHERE a.term = '{t0}' {mid}""")
        for t in sorted(set(terms)):
            qidf.append(f"({qid}, '{t.replace(chr(39), chr(39) * 2)}')")
        qmeta.append(f"({qid}, {k}, {slop}, {m})")
    return _POS_PREFIX + f"""
    qm(query_id, k, slop, m) AS (VALUES {', '.join(qmeta)}),
    spans AS ({' UNION ALL '.join(spans)}),
    minimal AS (SELECT * FROM spans s1
                WHERE NOT EXISTS (
                    SELECT 1 FROM spans s2
                    WHERE s2.query_id = s1.query_id
                      AND s2.doc_id = s1.doc_id
                      AND s2.s >= s1.s AND s2.e <= s1.e
                      AND (s2.s > s1.s OR s2.e < s1.e))),
    fr AS (SELECT w.query_id, q.k, w.doc_id,
                  sum(1.0 / (1 + (w.e - w.s) - (q.m - 1))) AS fr
           FROM minimal w JOIN qm q USING (query_id)
           WHERE (w.e - w.s) - (q.m - 1) <= q.slop
           GROUP BY w.query_id, q.k, w.doc_id),
    qidf AS (SELECT qt.query_id,
                    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)))
                        AS idf_sum
             FROM (VALUES {', '.join(qidf)}) AS qt(query_id, term)
             JOIN df d USING (term) CROSS JOIN stats s
             GROUP BY qt.query_id),
    scored AS (SELECT f.query_id, f.k, f.doc_id,
                      i.idf_sum * f.fr
                      / (f.fr + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
                          AS score
               FROM fr f JOIN qidf i USING (query_id)
               JOIN dl ON dl.doc_id = f.doc_id CROSS JOIN stats s),
    ranked AS (SELECT query_id, k, doc_id, score,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, doc_id)
                          AS rn
               FROM scored)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(rn AS BIGINT) AS rank, doc_id, round(score, 6) AS score
    FROM ranked WHERE rn <= k
    """


def _register_slop_oracle() -> None:
    from baram_ray.pipelines.search import SLOP_QUERIES
    ORACLES["search_phrase_slop_topk"] = _slop_sql(SLOP_QUERIES)


_register_slop_oracle()


# index statistics recomputed from raw text: n_docs / distinct-term
# count / avgdl match the builder's meta exactly (same tokenizer
# equivalence as every BM25 oracle); num_shards is the builder's
# documented formula next_pow2(max(1, n_docs // 262144))
# (`index/build.py:892`) — ceil-to-power-of-two in SQL
ORACLES["search_index_stats"] = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents),
    tok2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id)
    SELECT (SELECT count(*) FROM documents) AS n_docs,
           (SELECT count(DISTINCT term) FROM tok2) AS n_terms,
           round((SELECT sum(dl) FROM dl)::DOUBLE
                 / (SELECT count(*) FROM documents), 6) AS avgdl_text,
           CAST(power(2, ceil(log2(greatest(1,
                (SELECT count(*) FROM documents) // 262144))))
                AS BIGINT) AS num_shards
"""


# markdown-export manifest: one file per document named {doc_id}.md,
# n_bytes = rendered template length (Python len == DuckDB length;
# the corpus is ASCII so chars == bytes) — the sink's exact template
# from pipelines/knowledge.py doc_markdown_export
ORACLES["doc_markdown_export"] = r"""
    SELECT doc_id || '.md' AS file,
           CAST(length('---' || chr(10) || 'doc_id: ' || doc_id
                || chr(10) || 'lang: ' || lang || chr(10) || '---'
                || chr(10) || chr(10) || '# Document ' || doc_id
                || chr(10) || chr(10) || text || chr(10)) AS BIGINT)
               AS n_bytes
    FROM documents
"""
