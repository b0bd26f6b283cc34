"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

#: transcripts parquet path for the sf the driver checks at — DuckDB's
#: oracle reads the same deterministic files the Ray queries read.
_SF001_TRANSCRIPTS = "/tmp/lexor_ray_data/sf0.01/transcripts/*.parquet"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: extract clean text
    + spans from every transcript turn, stable (conv_id, turn_idx)
    order."""
    from lexor_ray.ops.transcripts_ops import extract_turns

    return extract_turns("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from lexor_ray.ops import (
        dedup,
        multimodal,
        relational,
        similarity,
        sketch,
        textstats,
        transcripts_ops,
    )

    from lexor_ray.ops import streaming_state

    _approx_distinct = sketch.approx_distinct_users
    _first_tool_flags = streaming_state.first_tool_turn_flags

    return {
        # flagship extraction (non-SQL: HTML parse)
        "extract_turns": transcripts_ops.extract_turns,
        "extract_markdown": transcripts_ops.extract_markdown,
        "extraction_log_summary": transcripts_ops.extraction_log_summary,
        "validate_extraction": transcripts_ops.validate_extraction,
        "conversation_stats_salted": transcripts_ops.conversation_stats_salted,
        "first_tool_turn_flags": _first_tool_flags,
        # transcripts relational (SQL-checked)
        "turns_per_conversation": transcripts_ops.turns_per_conversation,
        "role_distribution": transcripts_ops.role_distribution,
        "exact_dedup_turns": transcripts_ops.exact_dedup_turns,
        # relational over testdata tables (SQL-checked)
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_top_revenue_orders": relational.q3_top_revenue_orders,
        "order_priority_counts": relational.order_priority_counts,
        "customer_nation_revenue": relational.customer_nation_revenue,
        "part_type_stats": relational.part_type_stats,
        "events_tumbling_window": relational.events_tumbling_window,
        "events_sessionize": relational.events_sessionize,
        "events_asof_join": relational.events_asof_join,
        "events_json_stats": relational.events_json_stats,
        "conversation_documents": relational.conversation_documents,
        "events_sliding_window": relational.events_sliding_window,
        "top_events_per_user": relational.top_events_per_user,
        "customers_without_orders": relational.customers_without_orders,
        "distinct_users_per_event_type": relational.distinct_users_per_event_type,
        "approx_distinct_users": _approx_distinct,
        "top_customers_by_balance": relational.top_customers_by_balance,
        "lineitem_distinct_flags": relational.lineitem_distinct_flags,
        # dedup family
        "exact_dedup": dedup.exact_dedup,
        "minhash_dedup": dedup.minhash_dedup,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "simhash_candidates": dedup.simhash_candidates,
        "embedding_neardup": dedup.embedding_neardup,
        # similarity search
        "brute_force_topk": similarity.brute_force_topk,
        "lsh_ann_topk": similarity.lsh_ann_topk,
        "kmeans_embeddings": similarity.kmeans_embeddings,
        "ivf_ann_topk": similarity.ivf_ann_topk,
        "embedding_label_centroids": similarity.embedding_label_centroids,
        # text analysis
        "token_counts": textstats.token_counts,
        "quality_counts": textstats.quality_counts,
        "quality_scores": textstats.quality_scores,
        "filter_quality_documents": textstats.filter_quality_documents,
        "bpe_token_counts": textstats.bpe_token_counts,
        "tfidf_top_terms": textstats.tfidf_top_terms,
        "lang_id": textstats.lang_id,
        "fingerprints": textstats.fingerprints,
        "lang_distribution": textstats.lang_distribution,
        # multimodal plumbing
        "media_features": multimodal.media_features,
        "frame_sample": multimodal.frame_sample,
        "resize_media": multimodal.resize_media,
        "media_byte_totals": multimodal.media_byte_totals,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles with column names matching the Ray outputs.
    Non-SQL-expressible ops (HTML extraction, MinHash/SimHash/LSH,
    heuristic scoring/lang-id/fingerprints) are omitted → rows-only
    check. Generating the transcripts parquet here keeps the oracle's
    ``read_parquet`` target present regardless of call order."""
    try:
        from lexor_ray.transcripts import transcripts_dir

        transcripts_dir(0.01)
    except Exception:
        pass
    t = _SF001_TRANSCRIPTS
    return {
        "turns_per_conversation": f"""
            SELECT conv_id,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars,
                   CAST(count(*) AS BIGINT) AS n_turns
            FROM read_parquet('{t}')
            GROUP BY conv_id ORDER BY conv_id
        """,
        "role_distribution": f"""
            SELECT role, CAST(count(*) AS BIGINT) AS n_turns
            FROM read_parquet('{t}') GROUP BY role ORDER BY role
        """,
        "first_tool_turn_flags": f"""
            SELECT a.conv_id, a.turn_idx,
                   EXISTS (
                       SELECT 1 FROM read_parquet('{t}') b
                       WHERE b.conv_id = a.conv_id
                         AND b.role = 'tool' AND b.ts < a.ts
                   ) AS tool_seen_before
            FROM read_parquet('{t}') a
            ORDER BY a.conv_id, a.turn_idx
        """,
        "conversation_stats_salted": f"""
            SELECT conv_id,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars,
                   CAST(count(*) AS BIGINT) AS n_turns
            FROM read_parquet('{t}')
            GROUP BY conv_id ORDER BY conv_id
        """,
        "exact_dedup_turns": f"""
            SELECT conv_id, turn_idx, CAST(count(*) AS BIGINT) AS n_copies
            FROM read_parquet('{t}')
            GROUP BY conv_id, turn_idx ORDER BY conv_id, turn_idx
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_top_revenue_orders": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "order_priority_counts": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "customer_nation_revenue": """
            SELECT n_name,
                   round(sum(o_totalprice), 2) AS total_revenue,
                   CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "part_type_stats": """
            SELECT p_type,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   min(p_size) AS min_size,
                   max(p_size) AS max_size,
                   round(sum(p_retailprice) / count(*), 2) AS avg_price
            FROM part GROUP BY p_type ORDER BY p_type
        """,
        "events_tumbling_window": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
                   round(sum(value), 3) AS value_sum,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events
            GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "events_asof_join": """
            WITH clicks AS (
                SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
            ), purch AS (
                SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
            )
            SELECT c.event_id, c.user_id, p.value AS last_purchase_value
            FROM clicks c ASOF LEFT JOIN purch p
              ON c.user_id = p.user_id AND c.ts >= p.ts
            ORDER BY c.event_id
        """,
        "events_json_stats": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
                   CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
                   CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "conversation_documents": f"""
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   string_agg(text, chr(10) ORDER BY turn_idx) AS full_text
            FROM read_parquet('{t}')
            GROUP BY conv_id ORDER BY conv_id
        """,
        "events_sliding_window": """
            WITH w AS (
                SELECT event_type, value,
                       CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                           - s.i * 1800 AS window_start,
                       CAST(floor(epoch(ts)) AS BIGINT) AS es
                FROM events, (SELECT unnest([0, 1]) AS i) s
            )
            SELECT event_type, window_start,
                   round(sum(value), 3) AS value_sum,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM w
            WHERE es >= window_start AND es < window_start + 3600
            GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "top_events_per_user": """
            WITH ranked AS (
                SELECT user_id, event_id, ts,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id) AS rank
                FROM events
            )
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 3 ORDER BY user_id, rank
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2001-01-01'
            )
            ORDER BY c_custkey
        """,
        "distinct_users_per_event_type": """
            SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "events_sessionize": """
            WITH lagged AS (
                SELECT user_id, ts, event_type,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                FROM events
            ), marked AS (
                SELECT user_id, ts,
                       CASE WHEN prev_ts IS NULL
                                 OR epoch(ts) - epoch(prev_ts) > 600
                            THEN 1 ELSE 0 END AS brk
                FROM lagged
            ), sessions AS (
                SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked
            )
            SELECT user_id,
                   epoch_us(min(ts)) AS session_start,
                   epoch_us(max(ts)) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM sessions GROUP BY user_id, sid
            ORDER BY user_id, session_start
        """,
        "top_customers_by_balance": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 25
        """,
        "lineitem_distinct_flags": """
            SELECT DISTINCT l_returnflag, l_linestatus
            FROM lineitem ORDER BY l_returnflag, l_linestatus
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE array_length(string_split_regex(trim(text), '\s+'))
                   END AS BIGINT) AS n_tokens
            FROM documents ORDER BY doc_id
        """,
        "quality_counts": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE array_length(string_split_regex(trim(text), '\s+'))
                   END AS BIGINT) AS n_words,
                   CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS BIGINT) AS n_punct,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
                   CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper
            FROM documents ORDER BY doc_id
        """,
        "filter_quality_documents": r"""
            WITH sig AS (
                SELECT doc_id,
                       CAST(length(text) AS BIGINT) AS n_chars,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE array_length(string_split_regex(trim(text), '\s+'))
                       END AS BIGINT) AS n_words,
                       CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS BIGINT) AS n_punct
                FROM documents
            )
            SELECT doc_id, n_words, n_punct FROM sig
            WHERE n_words >= 20 AND n_punct * 100 <= n_chars * 5
            ORDER BY doc_id
        """,
        "lang_distribution": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "brute_force_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings ORDER BY vec_id LIMIT 10
            ), sims AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qe, e.embedding) AS cos
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id
            ), ranked AS (
                SELECT query_id, vec_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id) AS rank
                FROM sims
            )
            SELECT query_id, vec_id, round(cos, 4) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "embedding_label_centroids": """
            WITH u AS (
                SELECT label, i, embedding[i] AS v
                FROM embeddings, range(1, 65) t(i)
            ), c AS (
                SELECT label, i, sum(v) AS s, CAST(count(*) AS BIGINT) AS n
                FROM u GROUP BY label, i
            )
            SELECT label,
                   CAST(max(n) AS BIGINT) AS n_vecs,
                   round(sqrt(sum((s / n) * (s / n))), 4) AS centroid_norm
            FROM c GROUP BY label ORDER BY label
        """,
        "media_byte_totals": """
            SELECT doc_id,
                   CAST((8 + doc_id % 8) * (8 + doc_id % 5) AS BIGINT) AS n_bytes
            FROM documents ORDER BY doc_id
        """,
    }
