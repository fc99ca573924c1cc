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
    "doc_term_df_top": r"""
        SELECT term, count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+')) AS term
              FROM documents)
        WHERE term <> ''
        GROUP BY term
        ORDER BY df DESC, term LIMIT 20
    """,
    "events_type_agg": """
        SELECT event_type, count(*) AS n,
               sum(CAST(trunc(value * 1000000.0 + 0.5) AS BIGINT)) AS total_value_u6
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
               round((n - avg(n) OVER (PARTITION BY event_type))
                     / stddev_pop(n) OVER (PARTITION BY event_type),
                     6) AS zscore
        FROM daily
    """,
    "events_user_topk": """
        SELECT user_id, count(*) AS n FROM events
        GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(CAST(trunc(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS sum_base_price_c,
               sum(CAST(trunc(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS sum_disc_price_u4,
               sum(CAST(trunc(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000.0 + 0.5) AS BIGINT)) AS sum_charge_u6,
               sum(CAST(trunc(l_discount * 100.0 + 0.5) AS BIGINT)) AS sum_disc_c,
               count(*) AS count_order,
               round(sum(l_quantity) / count(*), 6) AS avg_qty,
               round(sum(CAST(trunc(l_discount * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(*), 6) AS avg_disc
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_orders_by_status": """
        SELECT o_orderstatus, count(*) AS n,
               sum(CAST(trunc(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS total_c
        FROM orders GROUP BY o_orderstatus
    """,
    "tpch_revenue_by_nation": """
        SELECT n_name, count(*) AS n_orders,
               sum(CAST(trunc(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS revenue_c
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "tpch_top_parts": """
        SELECT l_partkey,
               sum(CAST(trunc(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS revenue_u4
        FROM lineitem GROUP BY l_partkey
        ORDER BY revenue_u4 DESC, l_partkey LIMIT 10
    """,
    "tpch_supplier_by_nation": """
        SELECT n_name, count(*) AS n_suppliers,
               sum(CAST(trunc(s_acctbal * 100.0 + 0.5) AS BIGINT)) AS total_acctbal_c
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "tpch_orders_top": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    "tpch_part_brand_stats": """
        SELECT p_brand, count(*) AS n,
               sum(CAST(trunc(p_retailprice * 100.0 + 0.5) AS BIGINT)) AS sum_price_c,
               round(sum(CAST(trunc(p_retailprice * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(*), 6) AS avg_price,
               max(p_size) AS max_size
        FROM part GROUP BY p_brand
    """,
}
