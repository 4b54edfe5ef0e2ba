"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or in the library code these
callables use.

Every ``queries()`` entry is one operator family from SURVEY.md §2 (or
the training-data additions: dedup ladder, ANN, text analysis); SQL-
expressible ones have a DuckDB oracle in ``oracle_sql()`` with column
names matching the Ray result exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents →
    synthesized boilerplate-laden pages → validate → actor-pool
    extraction. Returns the extracted table."""
    from textextract_ray.pipelines.extract_pipeline import (
        _documents_as_pages,
        extract_dataset,
    )

    return extract_dataset(
        _documents_as_pages("/root/testdata/sf0.001"), dedup=False
    ).drop_columns(["spans"])


def queries() -> dict[str, Callable[[str], Any]]:
    from textextract_ray.pipelines import extract_pipeline as ep
    from textextract_ray.pipelines import relational as rel
    from textextract_ray.pipelines import textops as tx

    return {
        # extraction (the north_rule invariant, SQL-checkable)
        "extract_documents": ep.extract_documents,
        "extract_pdf_documents": ep.extract_pdf_documents,
        "extract_spans": ep.extract_spans,
        # relational / metering operators (SURVEY.md §2.5-2.7)
        "q1_pricing_summary": rel.q1_pricing_summary,
        "q3_top_orders": rel.q3_top_orders,
        "usage_daily": rel.usage_daily,
        "usage_monthly": rel.usage_monthly,
        "remaining_quota": rel.remaining_quota,
        "recent_events": rel.recent_events,
        "latest_order_per_customer": rel.latest_release_per_user,
        "filter_regex_count": rel.filter_regex_count,
        "dedup_exact": rel.dedup_exact_documents,
        "distinct_langs": rel.distinct_langs,
        "customer_nation_region": rel.customer_nation_region,
        "period_usage": rel.period_usage,
        "events_in_range": rel.events_in_range,
        "events_hourly_window": rel.events_hourly_window,
        "events_sliding_window": rel.events_sliding_window,
        "asof_latest_order": rel.asof_latest_order,
        "session_counts": rel.session_counts,
        "props_extract": rel.props_extract,
        "running_user_totals": rel.running_user_totals,
        "recent_events_per_user": rel.recent_events_per_user,
        "value_median": rel.value_median,
        "parts_by_brand": rel.parts_by_brand,
        "supplier_by_nation": rel.supplier_by_nation,
        # text analysis / training-data ops
        "token_stats": tx.token_stats,
        "bpe_token_stats": tx.bpe_token_stats,
        "fingerprints": tx.fingerprints,
        "normalized_fingerprints": tx.normalized_fingerprints,
        "host_doc_counts": tx.host_doc_counts,
        "quality_scores": tx.quality_scores,
        "language_id": tx.language_id,
        # dedup ladder (sketch-based: deterministic, pytest-checked)
        "minhash_near_dups": tx.minhash_near_dups,
        "simhash_near_dups": tx.simhash_near_dups,
        "embedding_near_dups": tx.embedding_near_dups,
        "ngram_jaccard": tx.ngram_jaccard,
        "rolling_fingerprints": tx.rolling_fingerprints,
        # similarity search
        "ann_topk": tx.ann_topk,
        "ann_topk_ivf": tx.ann_topk_ivf,
        "clean_corpus": tx.clean_corpus,
        "approx_distinct": tx.approx_distinct,
        # multimodal plumbing (stubbed codecs, real Ray stages)
        "image_metadata": tx.image_metadata,
        "media_features": tx.media_features,
        "frame_samples": tx.frame_samples,
    }


def oracle_sql() -> dict[str, str]:
    url_expr = (
        "concat('https://host', CAST(doc_id % 20 AS VARCHAR), "
        "'.example/doc/', CAST(doc_id AS VARCHAR))"
    )
    return {
        "extract_documents": f"""
            SELECT {url_expr} AS url, text AS extracted_text, 'ok' AS status
            FROM documents ORDER BY url
        """,
        "extract_pdf_documents": f"""
            SELECT {url_expr} AS url, text AS extracted_text, 'ok' AS status
            FROM documents ORDER BY url
        """,
        "extract_spans": f"""
            SELECT {url_expr} AS url, 0 AS span_start,
                   length(text) AS span_end, 'text' AS span_kind
            FROM documents ORDER BY url
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   count(*) AS count_order,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT o.o_orderkey,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY o.o_orderkey
            ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, o.o_orderkey
            LIMIT 10
        """,
        "usage_daily": """
            SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                   count(*) AS requests_count,
                   round(sum(value), 4) AS total_value,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count
            FROM events GROUP BY user_id, day ORDER BY user_id, day
        """,
        "usage_monthly": """
            SELECT user_id, strftime(ts, '%Y-%m') AS month,
                   count(*) AS requests_count
            FROM events GROUP BY user_id, month ORDER BY user_id, month
        """,
        "remaining_quota": """
            SELECT user_id, count(*) AS used_requests,
                   greatest(0, 40 - count(*)) AS remaining_requests,
                   count(*) < 40 AS can_make_request
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "recent_events": """
            SELECT event_id, ts, user_id, event_type
            FROM events ORDER BY ts DESC, event_id DESC LIMIT 100
        """,
        "latest_order_per_customer": """
            SELECT o_custkey, o_orderkey, o_orderdate FROM (
                SELECT o_custkey, o_orderkey, o_orderdate,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC
                       ) AS rn
                FROM orders
            ) WHERE rn = 1 ORDER BY o_custkey
        """,
        "filter_regex_count": """
            SELECT lang, count(*) AS n_docs
            FROM documents
            WHERE regexp_matches(text, '(spark|vector)')
            GROUP BY lang ORDER BY lang
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, text
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "distinct_langs": """
            SELECT DISTINCT lang FROM documents ORDER BY lang
        """,
        "customer_nation_region": """
            SELECT r.r_name, n.n_name,
                   count(*) AS n_customers,
                   round(sum(c.c_acctbal), 4) AS total_acctbal
            FROM customer c
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name
        """,
        "period_usage": """
            SELECT user_id,
                   CASE WHEN extract(day FROM ts) >= 15
                        THEN date_trunc('month', ts) + INTERVAL 14 DAY
                        ELSE date_trunc('month', ts - INTERVAL 1 MONTH) + INTERVAL 14 DAY
                   END AS period_start,
                   count(*) AS requests_count,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY user_id, period_start
            ORDER BY user_id, period_start
        """,
        "events_in_range": """
            SELECT user_id, count(*) AS requests_count, round(sum(value), 4) AS total_value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-02-10'
            GROUP BY user_id ORDER BY user_id
        """,
        "events_hourly_window": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events, round(sum(value), 4) AS total_value
            FROM events GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "events_sliding_window": """
            SELECT event_type, window_start, count(*) AS n_events FROM (
                SELECT event_type, date_trunc('hour', ts) AS window_start FROM events
                UNION ALL
                SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events
            ) GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "asof_latest_order": """
            SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate
            FROM events e ASOF JOIN (
                SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                FROM orders GROUP BY o_custkey, o_orderdate
            ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
            ORDER BY e.event_id
        """,
        "session_counts": """
            WITH gaps AS (
                SELECT user_id,
                       ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap
                FROM events
            )
            SELECT user_id,
                   count(*) FILTER (
                       WHERE gap IS NULL OR gap > INTERVAL 30 MINUTE
                   ) AS n_sessions
            FROM gaps GROUP BY user_id ORDER BY user_id
        """,
        "running_user_totals": """
            SELECT user_id, ts, event_id, running_value FROM (
                SELECT user_id, ts, event_id,
                       round(sum(value) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ), 4) AS running_value,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
            ) WHERE rn = 1 ORDER BY user_id
        """,
        "recent_events_per_user": """
            SELECT user_id, ts, event_id FROM (
                SELECT user_id, ts, event_id,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
            ) WHERE rn <= 3 ORDER BY user_id, ts DESC, event_id DESC
        """,
        "value_median": """
            SELECT event_type, round(median(value), 4) AS median_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "parts_by_brand": """
            SELECT p_brand, count(*) AS n_parts,
                   round(avg(p_retailprice), 4) AS avg_price,
                   max(p_size) AS max_size
            FROM part GROUP BY p_brand ORDER BY p_brand
        """,
        "supplier_by_nation": """
            SELECT n.n_name, count(*) AS n_suppliers,
                   round(sum(s.s_acctbal), 4) AS total_acctbal
            FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY n.n_name ORDER BY n.n_name
        """,
        "clean_corpus": """
            -- dedup is GLOBAL by text (winner = min doc_id, whose lang
            -- is kept) to match exact_dedup; token count uses \S+ runs
            -- to match functions.text.token_count exactly
            SELECT lang, count(*) AS n_docs FROM (
                SELECT arg_min(lang, doc_id) AS lang
                FROM documents
                WHERE len(regexp_extract_all(text, '\S+')) >= 40
                  AND length(text) >= 200
                GROUP BY text
            ) GROUP BY lang ORDER BY lang
        """,
        "props_extract": """
            SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS total_k,
                   round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 4) AS avg_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "image_metadata": """
            SELECT doc_id AS media_id, 'png' AS format,
                   (strlen(text) + 8) * 7 % 1024 + 16 AS width,
                   (strlen(text) + 8) * 13 % 1024 + 16 AS height,
                   strlen(text) + 8 AS n_bytes,
                   'ok' AS status
            FROM documents ORDER BY media_id
        """,
        "token_stats": """
            -- \S+ runs == the pipeline's token_count (string_split on
            -- a single space would diverge on any doubled/leading
            -- whitespace)
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
                   round(avg(len(regexp_extract_all(text, '\S+'))), 4) AS avg_tokens
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "bpe_token_stats": """
            SELECT lang,
                   CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9[:space:]]'))) AS BIGINT) AS total_bpe_tokens
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "fingerprints": """
            SELECT doc_id, md5(text) AS fingerprint
            FROM documents ORDER BY doc_id
        """,
        "ann_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings ORDER BY vec_id LIMIT 5
            ),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                                    e.vec_id
                       ) AS rn
                FROM q CROSS JOIN embeddings e
            )
            SELECT query_id, vec_id FROM scored WHERE rn <= 10
            ORDER BY query_id, vec_id
        """,
        "normalized_fingerprints": """
            SELECT doc_id, md5(nfc_normalize(text)) AS norm_fingerprint
            FROM documents ORDER BY doc_id
        """,
        "host_doc_counts": """
            SELECT concat('host', CAST(doc_id % 20 AS VARCHAR), '.example') AS host,
                   count(*) AS n_pages
            FROM documents GROUP BY host ORDER BY host
        """,
        # quality_scores / language_id / near-dup sketches / ANN-IVF:
        # non-SQL-expressible (heuristic + sketch ops) → rows-only check;
        # their determinism is pinned by pytest golden tests instead.
    }
