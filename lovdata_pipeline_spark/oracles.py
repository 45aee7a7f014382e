"""DuckDB oracle SQL for every SQL-expressible query in queries.py.

Engine-parity rules used throughout (see queries.py header):
  * double sums go through DECIMAL(18,4) → exact, order-independent;
  * every computed float is round(x, 6) in both engines;
  * DuckDB regexp_replace needs the 'g' flag (Spark replaces globally);
  * counts/sums cast so integer widths line up (Spark long ↔ BIGINT);
  * epoch comparisons in fractional seconds (ts::DOUBLE ↔ epoch(ts)).

Every query has an entry — including agg_approx_stats as of r4: raw
HLL/KLL sketch values are engine-specific by design, so its query emits
a tolerance-band VERDICT (exact distinct count + in-band booleans
against the sketches' documented error bounds) and the oracle recomputes
the exact count and asserts the verdicts TRUE — the driver hash-checks
a real pass/fail instead of sketch internals. Also oracle-checked are
the three flagship chunk/embed/enrich pipelines: the graded envelope
(queries._documents_as_xml) wraps each document in a single-legalP
simple-tier XML and every corpus text is far below max_tokens (max 158
vs 500 at sf0.1, probed), so the chunker provably emits exactly one
chunk per document whose content round-trips the original text —
making chunk ids, the regex-BPE token count, the enrichment columns,
and the md5-chained mock embedding all SQL-derivable
(`_chunk_pipeline_sql` / `_enrich_pipeline_sql` /
`_embed_pipeline_sql`). Both "approximate" ANN variants are
oracle-checked too — approximation is not nondeterminism:
`_ann_lsh_sql` inlines the seed-42 hyperplanes as literals, and
`_ann_ivf_sql` reproduces the portable md5-ordered centroid seeding,
assignment, and probe selection exactly.
"""

# Exact word-3-gram Jaccard pairs at threshold 0.8, as a reusable CTE
# body (jac holds every co-occurring pair with its jaccard) so the
# pair-emitting oracles AND the connected-components oracle share one
# definition.
_SHINGLE_BODY = """words AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), sw -> sw <> '') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                               i -> array_to_string(w[i:i+2], ' '))) AS shingle
  FROM words
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
copairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b,
         round(n_common * 1.0 / (x.n_sh + y.n_sh - n_common), 6) AS jaccard,
         n_common * 1.0 / (x.n_sh + y.n_sh - n_common) AS jv
  FROM copairs
  JOIN sizes x ON doc_a = x.doc_id
  JOIN sizes y ON doc_b = y.doc_id
)"""

_SHINGLE_CTE = f"""
WITH {_SHINGLE_BODY}
SELECT doc_a, doc_b, jaccard FROM jac WHERE jv >= 0.8
ORDER BY doc_a, doc_b
"""

_COSINE = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)

_NORMALIZED_TEXT = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), "
    "'\\s+', ' ', 'g'))"
)

_QUALITY_EXPRS = """
  greatest(length(text), 1) AS nc,
  list_filter(string_split_regex(trim(text), '\\s+'), sw -> sw <> '') AS w,
  greatest(len(list_filter(string_split_regex(trim(text), '\\s+'), sw -> sw <> '')), 1) AS nw,
  length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{}-]', '', 'g')) AS punct,
  length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
  length(regexp_replace(text, '[^A-Z]', '', 'g')) AS uppers
"""

_STOPWORDS_SQL = {
    "en": "['the','and','of','to','a','in','is','that']",
    "de": "['der','die','das','und','nicht','ist','ich','zu']",
    "fr": "['le','la','les','et','de','un','est','que']",
    "es": "['el','la','los','y','de','que','es','en']",
    "no": "['og','i','det','som','er','av','til','en']",
}

# Exact DuckDB replica of functions/tokens.py:count_tokens (the regex-BPE
# fallback, the live path in this container): one token per word-piece
# match of [^\W_]+|[^\w\s], long runs cost ceil(len/4). The corpus is
# ASCII (probed at sf0.1), so RE2's ASCII \w == Python's unicode \w here.
_TOKEN_COUNT = (
    r"CAST(coalesce(list_sum(list_transform("
    r"regexp_extract_all({col}, '[^\W_]+|[^\w\s]'), "
    r"p -> greatest(1, CAST(ceil(length(p) / 4.0) AS BIGINT)))), 0) AS INTEGER)"
)

# The graded chunker envelope (queries._documents_as_xml) is a
# single-legalP simple-tier document: tier 3 emits exactly one chunk per
# doc (every corpus text is far under max_tokens=500 — max 158 at sf0.1),
# whose content == the original text (ASCII, no XML specials, no
# surrounding whitespace — itertext().strip() round-trips byte-identically).
# So chunk_id/document_id/chunk_pos/token_count/source_hash are plain SQL.
_CHUNK_PIPELINE_SQL = f"""
    SELECT CAST(doc_id AS VARCHAR) || '_chunk_0' AS chunk_id,
           CAST(doc_id AS VARCHAR) AS document_id,
           CAST(0 AS INTEGER) AS chunk_pos,
           {_TOKEN_COUNT.format(col="text")} AS token_count,
           md5(text) AS source_hash
    FROM documents
    ORDER BY document_id, chunk_pos
"""

# Enrichment over those one-chunk docs (operators/enrichment.py): the
# envelope pins document_title='doc' (the <h1>), empty address and
# chapter_path (→ depths 0), and a digits-only document_id (law_date
# regex can't match); n_references / is_amendment re-run the REAL
# regex/marker logic over the content so they stay genuine detectors.
_ENRICH_PIPELINE_SQL = r"""
    SELECT CAST(doc_id AS VARCHAR) || '_chunk_0' AS chunk_id,
           CAST(doc_id AS VARCHAR) AS document_id,
           'doc' AS enriched_title,
           regexp_extract(CAST(doc_id AS VARCHAR), '(\d{4}-\d{2}-\d{2})', 1) AS law_date,
           CAST(0 AS INTEGER) AS hierarchy_depth,
           CAST(0 AS INTEGER) AS chapter_depth,
           CAST(len(list_distinct(regexp_extract_all(
               text, '(lov/\d{4}-\d{2}-\d{2}-\d+(?:/[^\s,.;]+)?)', 1))) AS INTEGER)
             AS n_references,
           (contains(lower(text), 'skal lyde')
            OR contains(lower(text), 'gjøres følgende endringer')
            OR contains(lower(text), 'oppheves')) AS is_amendment
    FROM documents
    ORDER BY document_id, chunk_id
"""


def _embed_pipeline_sql(dims: int = 16) -> str:
    """Exact oracle for the chunk+embed pipeline. mock_hash_provider is
    md5 hex-string chaining — v_j = int(md5(md5(content) || ':' || j)[:16],
    16) / 2^63 - 1, then L2-normalize — every step of which is portable
    SQL producing bit-identical doubles: hex→UBIGINT parse is exact, the
    2^63 divide is an exponent shift, list_reduce's first-element init
    equals Python sum()'s 0-init (0 + x == x), and the final float32
    narrowing (Spark's array<float>) is the same IEEE nearest-rounding
    CAST AS FLOAT in DuckDB."""
    return f"""
    WITH v AS (
      SELECT doc_id, text,
             list_transform(generate_series(0, {dims - 1}),
               j -> CAST(concat('0x', substr(md5(md5(text) || ':' || CAST(j AS VARCHAR)), 1, 16)) AS UBIGINT)
                    / 9223372036854775808.0 - 1.0) AS vals
      FROM documents
    )
    SELECT CAST(doc_id AS VARCHAR) || '_chunk_0' AS chunk_id,
           CAST(doc_id AS VARCHAR) AS document_id,
           {_TOKEN_COUNT.format(col="text")} AS token_count,
           CAST({dims} AS INTEGER) AS dims,
           round(CAST(CAST(vals[1] / sqrt(list_reduce(
                 list_transform(vals, x -> x * x), (a, b) -> a + b)) AS FLOAT) AS DOUBLE), 4) + 0.0 AS e0
    FROM v
    ORDER BY document_id, chunk_id
"""


def _simhash_sql(bits: int = 60, max_hamming: int = 3) -> str:
    """Exact DuckDB replica of the portable 60-bit simhash: bit b of the
    hash is bit b%4 of the md5 hex digit at 1-based position 15 - b//4
    (the same bits Spark reads from conv(substr(md5,1,15),16,10))."""
    votes = ",\n    ".join(
        f"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(hx, {15 - b // 4}, 1)) - 1) "
        f">> {b % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '\\s+'), sw -> sw <> '')) AS tok FROM documents
),
h AS (SELECT doc_id, md5(tok) AS hx FROM tok),
votes AS (
  SELECT doc_id,
    {votes}
  FROM h GROUP BY doc_id
),
sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


_SW_HITS = ",\n".join(
    f"  len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
    f"x -> list_contains({arr}, x))) AS h_{lang}"
    for lang, arr in _STOPWORDS_SQL.items()
)


ORACLES: dict[str, str] = {
    "chunk_documents_pipeline": _CHUNK_PIPELINE_SQL,
    "enrich_documents_pipeline": _ENRICH_PIPELINE_SQL,
    "embed_documents_pipeline": _embed_pipeline_sql(dims=16),
    "q1_pricing_summary": """
        -- decimal-input arithmetic: cast the 2dp base columns to decimal
        -- FIRST, multiply in decimal (exact in both engines) — never cast a
        -- double *product* to decimal (engine-dependent rounding).
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                        * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-12-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_top_unshipped": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_region_revenue": """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM region
        JOIN nation   ON r_regionkey = n_regionkey
        JOIN customer ON n_nationkey = c_nationkey
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'EUROPE'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "anti_join_changed": """
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        ORDER BY o_orderkey
    """,
    "semi_join_processed": """
        SELECT o_orderkey, o_orderstatus
        FROM orders
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem WHERE l_shipdate > TIMESTAMP '2001-01-01'
        )
        ORDER BY o_orderkey
    """,
    "status_counts": """
        SELECT o_orderstatus, count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "distinct_projection": """
        SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
    """,
    "filter_like": """
        SELECT p_partkey, p_name, p_brand
        FROM part WHERE p_name LIKE '%widget%' ORDER BY p_partkey
    """,
    "point_lookup": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem WHERE l_orderkey = 4788 ORDER BY l_linenumber
    """,
    "topk_limit": """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    """,
    "positional_ids": """
        SELECT l_orderkey, l_linenumber,
               CAST(l_orderkey AS VARCHAR) || '_chunk_' ||
               CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS VARCHAR)
               AS chunk_id
        FROM lineitem WHERE l_orderkey <= 100
        ORDER BY l_orderkey, l_linenumber
    """,
    "running_sum": """
        SELECT l_orderkey, l_linenumber,
               round(SUM(l_quantity) OVER (
                 PARTITION BY l_orderkey ORDER BY l_linenumber ROWS UNBOUNDED PRECEDING
               ), 6) AS cum_qty
        FROM lineitem WHERE l_orderkey <= 100
        ORDER BY l_orderkey, l_linenumber
    """,
    "greedy_token_buckets": """
        SELECT l_orderkey, l_linenumber,
               CAST(floor(coalesce(SUM(l_quantity) OVER (
                 PARTITION BY l_orderkey ORDER BY l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0.0) / 50.0) AS BIGINT) AS bucket_id
        FROM lineitem WHERE l_orderkey <= 100
        ORDER BY l_orderkey, l_linenumber
    """,
    "rollup_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "pivot_status": """
        SELECT l_returnflag,
               CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_open,
               CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_filled
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "set_difference_validation": """
        WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
             s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        SELECT nationkey, 'customer_only' AS problem
        FROM c WHERE nationkey NOT IN (SELECT nationkey FROM s)
        UNION ALL
        SELECT nationkey, 'supplier_only' AS problem
        FROM s WHERE nationkey NOT IN (SELECT nationkey FROM c)
        ORDER BY problem, nationkey
    """,
    # tolerance-band verdict for the sketch aggregates: the exact count
    # must match bit-for-bit; the in-band booleans are asserted TRUE —
    # if a Spark sketch ever lands outside its documented error bound
    # (4×rsd for HLL, ±1e-3 rank for the quantile sketch), the Spark
    # side emits false and the hash comparison fails loudly.
    "agg_approx_stats": """
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS exact_orders,
               TRUE AS orders_in_band,
               TRUE AS p50_in_band,
               TRUE AS p99_in_band
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "agg_distinct_counts": """
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT l_partkey) AS n_parts,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "set_ops_nations": """
        WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
             s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        SELECT nationkey, 'both' AS which FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        UNION ALL
        SELECT nationkey, 'customer_only' AS which FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        UNION ALL
        SELECT nationkey, 'supplier_only' AS which FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
        ORDER BY which, nationkey
    """,
    "left_join_customer_orders": """
        SELECT c_custkey,
               COUNT(o_orderkey) AS n_big_orders,
               round(COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0), 6) AS total_big
        FROM customer
        LEFT JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
                   WHERE o_totalprice > 350000) big
          ON c_custkey = big.o_custkey
        GROUP BY c_custkey ORDER BY c_custkey
    """,
    "full_outer_order_presence": """
        WITH o AS (SELECT DISTINCT o_orderkey FROM orders),
             l AS (SELECT DISTINCT l_orderkey FROM lineitem)
        SELECT COALESCE(o_orderkey, l_orderkey) AS orderkey,
               CAST(o_orderkey IS NOT NULL AS INT) AS in_orders,
               CAST(l_orderkey IS NOT NULL AS INT) AS in_lineitem
        FROM o FULL OUTER JOIN l ON o_orderkey = l_orderkey
        ORDER BY orderkey
    """,
    "exists_agg_priority": """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "not_exists_high_value": """
        WITH a AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_bal
                   FROM customer WHERE c_acctbal > 0)
        SELECT c_nationkey, count(*) AS n_cust,
               round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 6) AS total_bal
        FROM customer, a
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "scalar_subquery_part_avg": """
        WITH pq AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
          FROM lineitem GROUP BY l_partkey)
        SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 6) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN pq USING (l_partkey)
        WHERE p_brand = 'Brand#4' AND l_quantity < 0.5 * avg_qty
    """,
    "top3_orders_per_customer": """
        SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
        WHERE rk <= 3 ORDER BY o_custkey, rk
    """,
    "percentile_order_totals": """
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               count(*) AS n
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "grouping_sets_status_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "max_acctbal_supplier_per_nation": """
        WITH mx AS (SELECT s_nationkey, MAX(s_acctbal) AS max_bal
                    FROM supplier GROUP BY s_nationkey)
        SELECT n_name, s_name, s_acctbal
        FROM supplier
        JOIN mx ON supplier.s_nationkey = mx.s_nationkey AND s_acctbal = max_bal
        JOIN nation ON n_nationkey = supplier.s_nationkey
        ORDER BY n_name, s_name
    """,
    "events_lag_gaps": """
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events)
        SELECT user_id, count(*) AS n_gaps,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
               round(CAST(SUM(gap_us) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS avg_gap_s
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY user_id ORDER BY user_id
    """,
    "events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type
    """,
    "events_sessionize": """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                        OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, ts,
                 CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
                 ) AS BIGINT) AS session_no
          FROM g
        )
        SELECT user_id, session_no, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no
    """,
    "events_asof_join": """
        WITH purchases AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        clicks AS (
          SELECT user_id, ts, max(event_id) AS click_event_id
          FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        )
        SELECT p.event_id, p.user_id, p.ts,
               c.ts AS click_ts, c.click_event_id
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
    # r12 (r11 VERDICT Next #5): the ISO-8601 STRING time-key asof row.
    # DuckDB's ASOF JOIN compares the VARCHARs lexicographically — the
    # same chronological order the Spark layered key gives a
    # consistently-formatted non-numeric string column.
    "events_asof_join_string_time": """
        WITH ev AS (
          SELECT event_id, user_id, event_type,
                 strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
          FROM events
        ),
        purchases AS (
          SELECT event_id, user_id, ts_s FROM ev WHERE event_type = 'purchase'
        ),
        clicks AS (
          SELECT user_id, ts_s, max(event_id) AS click_event_id
          FROM ev WHERE event_type = 'click' GROUP BY user_id, ts_s
        )
        SELECT p.event_id, p.user_id, p.ts_s,
               c.ts_s AS click_ts, c.click_event_id
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts_s >= c.ts_s
        ORDER BY p.event_id
    """,
    "events_range_join": """
        WITH bands(lo, hi, band) AS (
          VALUES (0.0, 10.0, 'micro'), (10.0, 50.0, 'small'),
                 (50.0, 150.0, 'medium'), (150.0, 1000.0, 'large')
        )
        SELECT band, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band ORDER BY band
    """,
    "events_json_props": """
        SELECT event_type, count(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "dedup_exact_groups": """
        -- corpus has no natural exact dups; plant every-25th doc under a
        -- shifted id (mirrors the Spark query) so the check is non-vacuous;
        -- shift = max(doc_id)+1 so planted ids never collide at any sf
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id, text
            FROM documents WHERE doc_id % 25 = 0
        )
        SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_id
        FROM corpus GROUP BY md5(text) HAVING count(*) > 1
        ORDER BY content_hash
    """,
    # vocab-fingerprint dedup; the r2 alias key "dedup_fingerprint_groups" was removed r11
    # as a registry alias (see queries.py) so the r2→r3 rename is visible
    "dedup_vocab_fingerprint_groups": f"""
        SELECT md5(array_to_string(list_sort(list_distinct(
                   string_split({_NORMALIZED_TEXT}, ' '))), ' ')) AS fingerprint,
               count(*) AS n_docs, min(doc_id) AS keep_id
        FROM documents GROUP BY 1 HAVING count(*) > 1
        ORDER BY fingerprint
    """,
    "dedup_ngram_jaccard": _SHINGLE_CTE,
    # the CAPPED SSJoin scale path (r10): unlike the exact twin — whose
    # brute-force oracle is valid because prefix filtering is
    # exactness-preserving — this one must REPLAY candidate generation:
    # prefix = first (n_sh - ceil(0.8·n_sh) + 1) shingles by
    # (global df, 60-bit md5 portable hash), rows with df > cap
    # excluded from candidates only (cap = max(2, ceil(N/1000)), the
    # query's scale-aware rule), size filter, then verification over
    # the FULL shingle sets exactly like the exact form. The UBIGINT
    # hex read of md5's first 15 digits equals Spark's
    # conv(substr(md5,1,15),16,10) — the proven portable-hash identity.
    "dedup_ngram_jaccard_capped": r"""
        WITH nd AS (
          SELECT greatest(2, CAST(ceil(count(*) / 1000.0) AS BIGINT)) AS cap
          FROM documents
        ),
        words AS (
          SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') AS w FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 CAST(concat('0x', substr(md5(g), 1, 15)) AS UBIGINT) AS h
          FROM (SELECT doc_id,
                       unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                             i -> array_to_string(w[i:i+2], ' '))) AS g
                FROM words)
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        dfs AS (SELECT h, count(*) AS df FROM sh GROUP BY h),
        pfx AS (
          SELECT doc_id, h, n_sh FROM (
            SELECT sh.doc_id, sh.h, sizes.n_sh, dfs.df,
                   row_number() OVER (PARTITION BY sh.doc_id ORDER BY dfs.df, sh.h) AS pos
            FROM sh JOIN dfs USING (h) JOIN sizes USING (doc_id))
          WHERE pos <= n_sh - ceil(0.8 * n_sh) + 1
            AND df <= (SELECT cap FROM nd)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM pfx a JOIN pfx b USING (h)
          WHERE a.doc_id < b.doc_id
            AND b.n_sh >= 0.8 * a.n_sh AND b.n_sh <= a.n_sh / 0.8
        ),
        co AS (
          SELECT doc_a, doc_b, count(*) AS n_common
          FROM cand
          JOIN sh x ON x.doc_id = cand.doc_a
          JOIN sh y ON y.doc_id = cand.doc_b AND y.h = x.h
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
        FROM co
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.8
        ORDER BY doc_a, doc_b
    """,
    "dedup_minhash_lsh": _SHINGLE_CTE,  # LSH recall ≈ 1 at these params → same set
    "dedup_simhash": _simhash_sql(),
    "dedup_embedding_cosine": f"""
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, round({_COSINE}, 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_COSINE} >= 0.45
        ORDER BY doc_a, doc_b
    """,
    "dedup_embedding_cosine_blocked": f"""
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, round({_COSINE}, 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_COSINE} >= 0.45
        ORDER BY doc_a, doc_b
    """,
    "ann_cosine_topk": f"""
        SELECT b.vec_id AS vec_id, round({_COSINE}, 6) AS score
        FROM embeddings b
        JOIN embeddings a ON a.vec_id = 0
        ORDER BY score DESC, vec_id
        LIMIT 10
    """,
    "knn_join_top3": f"""
        WITH scored AS (
          SELECT a.vec_id AS query_id, b.vec_id AS vec_id, round({_COSINE}, 6) AS score
          FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id >= 5
        ),
        ranked AS (
          SELECT query_id, vec_id, score,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """,
    "curation_pipeline": f"""
        WITH h AS (SELECT doc_id,
{_SW_HITS}
        FROM documents),
        lang AS (
          SELECT doc_id,
                 CASE WHEN greatest(h_en,h_de,h_fr,h_es,h_no) = 0 THEN 'und'
                      WHEN h_de = greatest(h_en,h_de,h_fr,h_es,h_no) THEN 'de'
                      WHEN h_en = greatest(h_en,h_de,h_fr,h_es,h_no) THEN 'en'
                      WHEN h_es = greatest(h_en,h_de,h_fr,h_es,h_no) THEN 'es'
                      WHEN h_fr = greatest(h_en,h_de,h_fr,h_es,h_no) THEN 'fr'
                      ELSE 'no' END AS detected_lang
          FROM h),
        losers AS (SELECT DISTINCT doc_b FROM ({_SHINGLE_CTE}))
        SELECT d.doc_id, lang.detected_lang,
               CAST(CASE WHEN trim(text) = '' THEN 0
                         ELSE len(list_filter(string_split_regex(trim(text), '\\s+'), sw -> sw <> '')) END AS INTEGER) AS n_tokens
        FROM documents d
        JOIN lang USING (doc_id)
        WHERE detected_lang = 'en'
          AND NOT EXISTS (SELECT 1 FROM losers WHERE doc_b = d.doc_id)
        ORDER BY doc_id
    """,
    "text_language_id": f"""
        WITH h AS (SELECT doc_id,
{_SW_HITS}
        FROM documents)
        SELECT doc_id,
               CASE WHEN greatest(h_en,h_de,h_fr,h_es,h_no) = 0 THEN 'und'
                    WHEN h_de = greatest(h_en,h_de,h_fr,h_es,h_no) THEN 'de'
                    WHEN h_en = greatest(h_en,h_de,h_fr,h_es,h_no) THEN 'en'
                    WHEN h_es = greatest(h_en,h_de,h_fr,h_es,h_no) THEN 'es'
                    WHEN h_fr = greatest(h_en,h_de,h_fr,h_es,h_no) THEN 'fr'
                    ELSE 'no' END AS detected_lang
        FROM h ORDER BY doc_id
    """,
    "text_quality": f"""
        WITH f AS (SELECT doc_id, {_QUALITY_EXPRS} FROM documents)
        SELECT doc_id,
               CAST(len(w) AS INTEGER) AS n_words,
               round((nc - nw + 1) / nw, 6) AS mean_word_len,
               round(punct / nc, 6) AS punct_ratio,
               round(digits / nc, 6) AS digit_ratio,
               round(uppers / nc, 6) AS upper_ratio,
               round(greatest(least(
                 1.0
                 - (CASE WHEN nw < 10 THEN 0.5 WHEN nw > 100000 THEN 0.5 ELSE 0.0 END)
                 - least(punct / nc * 2, 0.3)
                 - least(digits / nc * 2, 0.3)
                 - least(uppers / nc, 0.2)
               , 1.0), 0.0), 6) AS quality
        FROM f ORDER BY doc_id
    """,
    "text_token_counts": """
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                         ELSE len(list_filter(string_split_regex(trim(text), '\\s+'), sw -> sw <> '')) END AS INTEGER) AS n_tokens,
               CAST(length(text) AS INTEGER) AS n_chars
        FROM documents ORDER BY doc_id
    """,
    "text_stopword_ratios": f"""
        WITH h AS (SELECT doc_id,
               len(list_filter(string_split_regex(trim(text), '\\s+'), sw -> sw <> '')) AS n,
{_SW_HITS}
        FROM documents)
        SELECT doc_id,
               round(h_en / greatest(n, 1), 6) AS sw_en,
               round(h_de / greatest(n, 1), 6) AS sw_de,
               round(h_fr / greatest(n, 1), 6) AS sw_fr,
               round(h_es / greatest(n, 1), 6) AS sw_es,
               round(h_no / greatest(n, 1), 6) AS sw_no
        FROM h ORDER BY doc_id
    """,
    "text_fingerprints": f"""
        SELECT doc_id, md5({_NORMALIZED_TEXT}) AS fingerprint
        FROM documents ORDER BY doc_id
    """,
    "multimodal_features": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
               CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
               CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
               CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames
        FROM documents ORDER BY doc_id
    """,
    "text_winnowing": """
        WITH d AS (
          -- length-preserving lowercase only (mirrors winnowing_anchors:
          -- expanding codepoints would shift offsets vs the original)
          SELECT doc_id,
                 CASE WHEN length(lower(text)) = length(text)
                      THEN lower(text) ELSE text END AS s,
                 length(text) - 7 AS ng
          FROM documents),
        g AS (
          SELECT doc_id,
                 list_transform(generate_series(1, greatest(ng, 0)),
                   i -> list_reduce(
                          list_transform(generate_series(0, 7),
                            j -> CAST(ord(substr(s, CAST(i + j AS INTEGER), 1)) AS BIGINT)),
                          (acc, x) -> (acc * 257 + x) % 2147483647)) AS grams
          FROM d),
        f AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(grams) - 3, 0)),
                   j -> list_min(grams[CAST(j AS INTEGER):CAST(j + 3 AS INTEGER)]))) AS fingerprint
          FROM g)
        SELECT DISTINCT doc_id, fingerprint FROM f
        ORDER BY doc_id, fingerprint
    """,
    # substring-level span dedup (operators/dedup.py shared_span_pairs,
    # k=25 w=8 min_anchors=3): positional winnowing — same rolling hash
    # as text_winnowing, window minima selected at the RIGHTMOST minimal
    # position (list_max over matching positions; 0 is the -inf sentinel,
    # real positions are ≥1) — then anchor matches on equal fingerprints,
    # grouped into runs by character-offset diagonal with a gap>w break
    # (gaps-and-islands), runs of ≥3 anchors reported with their 1-based
    # inclusive char hulls. Shared via _SPAN_CTES with the removal oracle.
    "dedup_shared_spans": None,  # assigned below from _SPAN_CTES
    "dedup_remove_spans": None,  # assigned below from _SPAN_CTES
    "multimodal_audio": """
        WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
        SELECT doc_id,
               CAST(8000 * (1 + n % 6) AS INTEGER) AS sample_rate,
               round(n / CAST(8000 * (1 + n % 6) AS DOUBLE), 6) AS duration_s
        FROM b ORDER BY doc_id
    """,
    # Gopher-style repetition signals (operators/textstats.py
    # repetition_signals): distinct-word ratio + top-bigram coverage.
    "text_repetition": r"""
        WITH w AS (
          SELECT doc_id,
                 CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                      ELSE list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '') END AS ws
          FROM documents),
        base AS (
          SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct, ws
          FROM w),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                        i -> ws[i] || ' ' || ws[i + 1])) AS bigram
          FROM w),
        bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        top AS (SELECT doc_id, max(c) AS top_c, sum(c) AS total_c FROM bc GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(n_words AS INTEGER) AS n_words,
               round(n_distinct * 1.0 / greatest(n_words, 1), 6) AS distinct_word_ratio,
               round(coalesce(top_c * 1.0 / total_c, 0.0), 6) AS top_bigram_frac
        FROM base b LEFT JOIN top USING (doc_id)
        ORDER BY doc_id
    """,
    # PII scan with the same in-query planting as the Spark side (every
    # 10th doc gets an email + phone appended); patterns are ASCII-only
    # so Java regex and RE2 agree. Same replace order: emails first.
    "pii_scan_documents": r"""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 = 0
                      THEN text || ' contact_' || CAST(doc_id AS VARCHAR)
                           || '@example.com call +1-555-' || CAST(doc_id AS VARCHAR)
                      ELSE text END AS text
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(text, '\+\d{1,2}-\d{3}-\d+')) AS INTEGER) AS n_phones,
               md5(regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                     '\+\d{1,2}-\d{3}-\d+', '[PHONE]', 'g')) AS redacted_hash
        FROM planted ORDER BY doc_id
    """,
    # deterministic stratified sampling: keep iff the portable 60-bit
    # md5 hash of the key (mod 10000) clears the stratum's rate. The
    # hash is the same first-15-hex-digits construction as
    # operators/sampling.portable_rate_hash.
    "stratified_sample_orders": """
        SELECT o_orderkey, o_orderpriority
        FROM orders
        -- integer thresholds = round(rate * 10000), mirroring the Spark
        -- side's per-stratum driver-fixed integers (no float product at
        -- the comparison boundary on either engine)
        WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS UBIGINT)
              % 10000
              < (CASE o_orderpriority
                   WHEN '1-URGENT' THEN 5000
                   WHEN '2-HIGH' THEN 2500
                   WHEN '3-MEDIUM' THEN 1000
                   WHEN '4-NOT SPECIFIED' THEN 500
                   WHEN '5-LOW' THEN 200
                   ELSE 0 END)
        ORDER BY o_orderkey
    """,
    # BM25 top-20 (operators/search.py): Lucene-style idf/tf-saturation,
    # formula written with IDENTICAL literal values and associativity as
    # the Spark expression so every double matches; per-term scores sum
    # in fixed column order (a bare SUM would add floats in shuffle
    # order). ln() is the only libm call — 1-ulp engine differences are
    # absorbed by round(,6).
    "text_bm25_search": None,  # assigned below from _BM25_CTES
    # shard packing: global running token total BEFORE each doc (id
    # order), integer-divided by the 4096 budget. One window here; the
    # Spark side computes the identical values with the distributed
    # two-phase prefix sum (operators/packing.py).
    "shard_pack_documents": r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                           ELSE len(list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '')) END AS INTEGER)
                   AS n_tokens
          FROM documents)
        SELECT doc_id, n_tokens,
               CAST(floor(coalesce(SUM(n_tokens) OVER (
                 ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 4096.0) AS BIGINT) AS shard_id
        FROM t ORDER BY doc_id
    """,
}


def _ann_lsh_sql() -> str:
    """Exact oracle for the 'approximate' SRP-LSH ANN query: the
    hyperplanes are FIXED (seed-42 randn, mirroring queries.py), so the
    bucket assignment, the 1-bit multi-probe set, and the within-bucket
    exact cosine are all deterministic and SQL-expressible. The plane
    values are inlined as DOUBLE literals via repr (shortest round-trip,
    parses to the identical double in both engines); sign-of-dot is a
    sequential fold in both (bitwise-equal per the parity rules), and
    Hamming distance over the 4-bit signature strings reproduces the
    multi-probe bucket set."""
    import numpy as np

    planes = np.random.RandomState(42).randn(4, 64)

    def arr(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    bits = " || ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {arr(planes[i])}) >= 0 "
        f"THEN '1' ELSE '0' END)"
        for i in range(4)
    )
    ham = " + ".join(
        f"(CASE WHEN substr(s.sig, {i}, 1) <> substr(q.sig, {i}, 1) THEN 1 ELSE 0 END)"
        for i in range(1, 5)
    )
    return f"""
        WITH sig AS (SELECT vec_id, embedding, {bits} AS sig FROM embeddings),
        q AS (SELECT embedding, sig FROM sig WHERE vec_id = 0)
        SELECT s.vec_id AS vec_id,
               round(list_dot_product(s.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
                     (sqrt(list_dot_product(s.embedding::DOUBLE[], s.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 6) AS score
        FROM sig s, q
        WHERE ({ham}) <= 1
          AND sqrt(list_dot_product(s.embedding::DOUBLE[], s.embedding::DOUBLE[])) > 0
        ORDER BY score DESC, vec_id
        LIMIT 10
    """


try:  # numpy only needed to regenerate the plane literals; without it
    # the ANN LSH entry is simply absent and the driver falls back to its
    # rows-only check — oracles.py stays importable in a DuckDB-only env.
    ORACLES["ann_topk_lsh_bucketed"] = _ann_lsh_sql()
except ImportError:  # pragma: no cover - numpy is present in this container
    pass


# sequential-fold squared L2 — dims come from len() of the vectors
# themselves, matching the Spark side's data-derived dims — a hardcoded
# width would fail SILENTLY on a dims change (DuckDB out-of-range list
# indexing yields NULL, collapsing every assignment to cell 0, instead
# of erroring loudly).
_IVF_SQ = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> ({a}[CAST(i AS INTEGER)] - {b}[CAST(i AS INTEGER)]) "
    "* ({a}[CAST(i AS INTEGER)] - {b}[CAST(i AS INTEGER)])), "
    "(x, y) -> x + y)"
)


def _ivf_assigned_ctes(n_cells: int) -> str:
    """Shared CTE block reproducing deterministic_centroids(portable) +
    ivf_assign exactly: (1) seeds = the n_cells rows with smallest
    md5(vec_id) hex; (2) assignment = argmin of sequential-fold squared
    L2 (list_reduce's first-element init equals Spark's 0.0-init fold
    bitwise since 0.0 + x == x), ties to the lower cell exactly like
    Spark's struct-array_min."""
    return f"""c AS (
          SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
                 embedding::DOUBLE[] AS cv
          FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {n_cells}
        ),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        assigned AS (
          SELECT vec_id, ev, cell FROM (
            SELECT e.vec_id, e.ev, c.cell,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {_IVF_SQ.format(a="e.ev", b="c.cv")}, c.cell
                   ) AS rn
            FROM e CROSS JOIN c
          ) WHERE rn = 1
        )"""


def _ann_ivf_sql(n_cells: int = 8, n_probe: int = 2) -> str:
    """Exact oracle for the IVF ANN query (see _ivf_assigned_ctes for the
    deterministic seeding/assignment; probes = the n_probe cells nearest
    the query, same fold and tie-break; exact cosine top-k inside the
    probed cells)."""
    return f"""
        WITH {_ivf_assigned_ctes(n_cells)},
        q AS (SELECT ev AS qe FROM e WHERE vec_id = 0),
        probes AS (
          SELECT cell FROM c CROSS JOIN q
          ORDER BY {_IVF_SQ.format(a="q.qe", b="c.cv")}, cell
          LIMIT {n_probe}
        )
        SELECT a.vec_id AS vec_id,
               round(list_dot_product(a.ev, q.qe) /
                     (sqrt(list_dot_product(a.ev, a.ev)) *
                      sqrt(list_dot_product(q.qe, q.qe))), 6) AS score
        FROM assigned a
        JOIN probes p ON a.cell = p.cell
        CROSS JOIN q
        WHERE sqrt(list_dot_product(a.ev, a.ev)) > 0
        ORDER BY score DESC, vec_id
        LIMIT 10
    """


ORACLES["ann_topk_ivf"] = _ann_ivf_sql()

# k-means-style cluster assignment over the whole embedding corpus (the
# partitioning step of IVF indexing / topic bucketing), reusing the same
# deterministic seeding + argmin CTEs as the IVF ANN oracle.
ORACLES["embedding_cluster_assign"] = f"""
        WITH {_ivf_assigned_ctes(8)}
        SELECT vec_id, CAST(cell AS INTEGER) AS cell FROM assigned
        ORDER BY vec_id
"""

# per-doc mean unigram surprisal under add-one smoothing with the corpus
# as its own LM (textstats.unigram_surprisal): per-token values round to
# 9 dp then accumulate in DECIMAL(18,9) — same fixed-point discipline as
# the Spark side, so shuffle-order float addition can't diverge.
ORACLES["text_unigram_surprisal"] = r"""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '')) AS w
          FROM documents),
        vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        stats AS (SELECT SUM(c) AS N, count(*) AS V FROM vocab),
        per AS (
          SELECT tok.doc_id,
                 -ln((c + CAST(1.0 AS DOUBLE)) / (N + V)) AS s
          FROM tok JOIN vocab USING (w) CROSS JOIN stats)
        SELECT doc_id,
               count(*) AS n_tokens,
               round(CAST(SUM(CAST(round(s, 9) AS DECIMAL(18,9))) AS DOUBLE)
                     / count(*), 6) AS mean_surprisal
        FROM per GROUP BY doc_id ORDER BY doc_id
"""

# (The r2 alias key "dedup_fingerprint_groups" and its duplicate oracle
# were removed in r11 — one computation, one registry entry; see the
# dedup_vocab_fingerprint_groups entry above and queries.py.)

# Dedup clusters: transitive closure of the MinHash pair graph via a
# recursive CTE (reach(n, m) = m reachable from n), component id = min
# reachable node, survivor = the node equal to its component id — the
# exact semantics of the Spark label-propagation loop
# (dedup.connected_components). Pairs come from the shared jaccard CTEs
# (LSH recall ≈ 1 at these parameters — same equivalence as the
# dedup_minhash_lsh oracle).
ORACLES["dedup_components"] = f"""
        WITH RECURSIVE {_SHINGLE_BODY},
        good AS (SELECT doc_a, doc_b FROM jac WHERE jv >= 0.8),
        sym AS (
          SELECT doc_a AS a, doc_b AS b FROM good
          UNION ALL
          SELECT doc_b AS a, doc_a AS b FROM good),
        reach(n, m) AS (
          SELECT a, a FROM (SELECT DISTINCT a FROM sym)
          UNION
          SELECT r.n, s.b FROM reach r JOIN sym s ON s.a = r.m
        )
        SELECT n AS doc_id, min(m) AS component_id, (n = min(m)) AS is_survivor
        FROM reach GROUP BY n ORDER BY doc_id
"""

# BM25 pipeline as reusable CTEs (through the fixed-order score sum) so the
# standalone ranking query and the hybrid-fusion query share one definition.
_BM25_CTES = r"""tok AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '')) AS w
          FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        corpus AS (
          SELECT count(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl
          FROM dl),
        tf AS (
          SELECT doc_id, w, count(*) AS tf FROM tok
          WHERE w IN ('vector', 'join', 'stream') GROUP BY 1, 2),
        dft AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        per AS (
          SELECT tf.doc_id, tf.w,
                 ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS s
          FROM tf JOIN dft USING (w) JOIN dl USING (doc_id) CROSS JOIN corpus),
        piv AS (
          SELECT doc_id,
                 max(CASE WHEN w = 'vector' THEN s END) AS s0,
                 max(CASE WHEN w = 'join' THEN s END) AS s1,
                 max(CASE WHEN w = 'stream' THEN s END) AS s2
          FROM per GROUP BY doc_id),
        bm AS (
          SELECT doc_id,
                 round(coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0), 6) AS score
          FROM piv ORDER BY score DESC, doc_id LIMIT 20)"""

ORACLES["text_bm25_search"] = f"""
        WITH {_BM25_CTES}
        SELECT doc_id, score FROM bm ORDER BY score DESC, doc_id
"""

# Positional winnowing + diagonal span assembly as reusable CTEs (through
# the `spans` hull table) so the span-report query and the span-removal
# query share one definition. k=25 (hash over 25 chars), w=8 (windows of
# 8 grams), min 3 anchors per run — mirrors shared_span_pairs' registry
# parameters.
_SPAN_CTES = """d AS (
          SELECT doc_id,
                 CASE WHEN length(lower(text)) = length(text)
                      THEN lower(text) ELSE text END AS s,
                 length(text) - 24 AS ng
          FROM documents),
        g AS (
          SELECT doc_id,
                 list_transform(generate_series(1, greatest(ng, 0)),
                   i -> list_reduce(
                          list_transform(generate_series(0, 24),
                            j -> CAST(ord(substr(s, CAST(i + j AS INTEGER), 1)) AS BIGINT)),
                          (acc, x) -> (acc * 257 + x) % 2147483647)) AS grams
          FROM d),
        wins AS (
          SELECT doc_id, grams,
                 unnest(generate_series(1, greatest(len(grams) - 7, 0))) AS j
          FROM g),
        sel AS (
          SELECT doc_id, grams, j,
                 list_min(grams[CAST(j AS INTEGER):CAST(j + 7 AS INTEGER)]) AS mn
          FROM wins),
        anchors AS (
          SELECT DISTINCT doc_id,
                 list_max(list_transform(generate_series(0, 7),
                   t -> CASE WHEN grams[CAST(j + t AS INTEGER)] = mn
                             THEN j + t ELSE 0 END)) AS pos,
                 mn AS fingerprint
          FROM sel),
        m AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
          FROM anchors a
          JOIN anchors b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id),
        brks AS (
          SELECT *, CASE WHEN pos_a - lag(pos_a) OVER win IS NULL
                           OR pos_a - lag(pos_a) OVER win > 8
                         THEN 1 ELSE 0 END AS brk
          FROM m WINDOW win AS (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a)),
        isl AS (
          SELECT *, sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
                                   ROWS UNBOUNDED PRECEDING) AS island
          FROM brks),
        spans AS (
          SELECT doc_a, doc_b,
                 min(pos_a) AS a_start, max(pos_a) + 24 AS a_end,
                 min(pos_b) AS b_start, max(pos_b) + 24 AS b_end,
                 count(*) AS n_anchors
          FROM isl GROUP BY doc_a, doc_b, diag, island
          HAVING count(*) >= 3)"""

ORACLES["dedup_shared_spans"] = f"""
        WITH {_SPAN_CTES}
        SELECT * FROM spans ORDER BY doc_a, doc_b, a_start, b_start
"""

# Span REMOVAL (operators/dedup.py remove_duplicated_spans): doc_b-side
# ranges merge per doc via gaps-and-islands on the running max end, kept
# segments between merged ranges splice back in start order, and every
# document reports (#cut regions, #chars removed, md5 of spliced text) —
# untouched docs hash their original text through the left join.
ORACLES["dedup_remove_spans"] = f"""
        WITH {_SPAN_CTES},
        -- DISTINCT (r11): removal ranges are a SET — the same doc_b
        -- range arriving from several doc_a partners is one removal.
        -- Without it, exact-duplicate (s, e) rows make the ordd→risl
        -- window chain ORDER BY (s, e) tie-AMBIGUOUS, and DuckDB's two
        -- window passes re-sort independently (parallel, unstable), so
        -- the pme=NULL marker and the cumulative island sum could land
        -- on DIFFERENT physical duplicates run to run — the r11 sf1
        -- sweep caught the flap (islands [1,1] vs [0,1] for the same
        -- doc). Spark is single-pass over one sort, but mirrors the
        -- DISTINCT so both engines merge the same set.
        rb AS (SELECT DISTINCT doc_b AS doc_id, b_start AS s, b_end AS e FROM spans),
        ordd AS (
          SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
          FROM rb),
        risl AS (
          SELECT *, sum(CASE WHEN pme IS NULL OR s > pme + 1 THEN 1 ELSE 0 END)
                      OVER (PARTITION BY doc_id ORDER BY s, e
                            ROWS UNBOUNDED PRECEDING) AS island
          FROM ordd),
        mrg AS (SELECT doc_id, island, min(s) AS s, max(e) AS e
                FROM risl GROUP BY doc_id, island),
        cuts AS (
          SELECT *, coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s) + 1, 1)
                      AS keep_from
          FROM mrg),
        pieces AS (
          SELECT c.doc_id, c.keep_from AS start,
                 substr(dd.text, CAST(c.keep_from AS INTEGER),
                        CAST(c.s - c.keep_from AS INTEGER)) AS piece,
                 c.e - c.s + 1 AS removed
          FROM cuts c JOIN documents dd USING (doc_id)),
        tails AS (
          SELECT doc_id, max(e) AS last_e, count(*) AS n_cut_regions
          FROM mrg GROUP BY doc_id),
        heads AS (
          SELECT doc_id, sum(removed) AS n_chars_removed,
                 string_agg(piece, '' ORDER BY start) AS head_text
          FROM pieces GROUP BY doc_id),
        cleaned AS (
          SELECT h.doc_id, t.n_cut_regions, h.n_chars_removed,
                 h.head_text || substr(dd.text, CAST(t.last_e + 1 AS INTEGER)) AS clean
          FROM heads h JOIN tails t USING (doc_id) JOIN documents dd USING (doc_id))
        SELECT dd.doc_id,
               CAST(coalesce(c.n_cut_regions, 0) AS BIGINT) AS n_cut_regions,
               CAST(coalesce(c.n_chars_removed, 0) AS BIGINT) AS n_chars_removed,
               md5(coalesce(c.clean, dd.text)) AS clean_hash
        FROM documents dd LEFT JOIN cleaned c USING (doc_id)
        ORDER BY dd.doc_id
"""

# Hybrid retrieval: reciprocal-rank fusion of the BM25 top-20 and the
# cosine top-20 for the vec_id=0 query embedding — ranks from the rounded
# scores (bit-matched above), contributions 1/(60+rank) added in fixed
# (lexical, semantic) order, all arithmetic explicitly DOUBLE (DuckDB
# would otherwise divide 1.0 as DECIMAL).
ORACLES["hybrid_search_rrf"] = f"""
        WITH {_BM25_CTES},
        bmr AS (
          SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM bm),
        ann AS (
          SELECT b.vec_id AS doc_id, round({_COSINE}, 6) AS score
          FROM embeddings b JOIN embeddings a ON a.vec_id = 0
          ORDER BY score DESC, doc_id LIMIT 20),
        annr AS (
          SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM ann)
        SELECT coalesce(bmr.doc_id, annr.doc_id) AS doc_id,
               round(coalesce(CAST(1.0 AS DOUBLE) / (60 + bmr.r), CAST(0.0 AS DOUBLE))
                     + coalesce(CAST(1.0 AS DOUBLE) / (60 + annr.r), CAST(0.0 AS DOUBLE)), 6)
                 AS rrf_score
        FROM bmr FULL OUTER JOIN annr ON bmr.doc_id = annr.doc_id
        ORDER BY rrf_score DESC, doc_id LIMIT 10
"""

# Benchmark decontamination (r4): word-3-gram overlap between the train
# slice (doc_id % 97 != 0) and the benchmark slice (doc_id % 97 = 0).
# The Spark side joins on xxhash64(ngram); the oracle joins on the raw
# n-gram string — collision-equivalent, the same contract as
# dedup_ngram_jaccard. overlap_frac divides two exact integers, rounded
# identically in both engines.
#: n-gram + bench/train-slice CTEs shared by the flag and report oracles
_DECONTAM_BASE = r"""words AS (
          SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') AS w FROM documents),
        dsh AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                       i -> array_to_string(w[i:i+2], ' '))) AS shingle
          FROM words),
        bench AS (SELECT DISTINCT doc_id AS bench_doc, shingle FROM dsh WHERE doc_id % 97 = 0),
        train AS (SELECT doc_id, shingle FROM dsh WHERE doc_id % 97 <> 0)"""

_DECONTAM_CTES = _DECONTAM_BASE + r""",
        flags AS (
          SELECT t.doc_id,
                 count(DISTINCT t.shingle) AS n_ngrams,
                 count(DISTINCT CASE WHEN b.bench_doc IS NOT NULL THEN t.shingle END) AS n_overlap,
                 count(DISTINCT b.bench_doc) AS n_benchmark_docs
          FROM train t LEFT JOIN bench b USING (shingle)
          GROUP BY t.doc_id
          HAVING count(DISTINCT CASE WHEN b.bench_doc IS NOT NULL THEN t.shingle END) >= 1)"""

ORACLES["decontaminate_benchmark_overlap"] = f"""
        WITH {_DECONTAM_CTES}
        -- overlap_frac UNROUNDED: exact-integer ratio is IEEE-identical
        -- cross-engine; round(,6) would diverge on ties like 1/128
        SELECT doc_id, n_ngrams, n_overlap, n_benchmark_docs,
               n_overlap * CAST(1.0 AS DOUBLE) / n_ngrams AS overlap_frac
        FROM flags ORDER BY doc_id
"""

ORACLES["decontaminate_clean_set"] = f"""
        WITH {_DECONTAM_CTES}
        SELECT d.doc_id, d.source, d.n_chars
        FROM documents d
        WHERE d.doc_id % 97 <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM flags)
        ORDER BY d.doc_id
"""

# Hashed linear quality classifier (r4): integer weights w(token) =
# hash60(md5(token || seed)) % 10001 - 5000, summed exactly as BIGINT;
# the logit divides two exact integers (IEEE-identical division) and is
# deliberately UNROUNDED — it often lands exactly on 6-decimal ties
# (denominator 5000·n_tokens) where the two engines' round() disagree,
# while the raw double is bit-identical. The sigmoid IS rounded to 6
# (exp may differ by an ulp across libms; its output never ties).
# UBIGINT arithmetic is kept away from the subtraction (cast to BIGINT
# first) so the % result can go negative safely.
ORACLES["text_quality_classifier"] = r"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\s+'), sw -> sw <> '')) AS w
          FROM documents),
        wt AS (
          SELECT doc_id,
                 CAST(CAST(concat('0x', substr(md5(w || 'quality-v1'), 1, 15)) AS UBIGINT)
                      % 10001 AS BIGINT) - 5000 AS wgt
          FROM tok),
        agg AS (
          SELECT doc_id, count(*) AS n_tokens, SUM(wgt) AS w_sum
          FROM wt GROUP BY doc_id),
        -- empty/NULL-text docs have no token rows but must still score
        -- (n_tokens 0, logit 0, score 0.5) — the no-row-loss contract,
        -- mirrored from Spark's explode_outer (r6 whitespace audit)
        alldocs AS (
          SELECT d.doc_id,
                 CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
                 coalesce(agg.w_sum, 0) AS w_sum
          FROM documents d LEFT JOIN agg USING (doc_id)),
        lg AS (
          SELECT doc_id, n_tokens,
                 CASE WHEN n_tokens = 0 THEN 0.0
                      ELSE w_sum * CAST(1.0 AS DOUBLE) / (n_tokens * 5000)
                 END AS quality_logit
          FROM alldocs)
        SELECT doc_id, n_tokens, quality_logit,
               round(CAST(1.0 AS DOUBLE) / (1 + exp(-4.0 * quality_logit)), 6)
                 AS quality_score,
               quality_logit > 0 AS keep
        FROM lg ORDER BY doc_id
"""

# Fixed-length token-sequence packing (r4): same token count and global
# prefix sum as shard_pack_documents, cut every 512 tokens. All-integer
# arithmetic — no float anywhere.
ORACLES["pack_sequences_documents"] = r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                           ELSE len(list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '')) END AS INTEGER)
                   AS n_tokens
          FROM documents),
        o AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS tok_start
          FROM t)
        SELECT doc_id, n_tokens, tok_start,
               tok_start // 512 AS seq_start,
               CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // 512
                    ELSE tok_start // 512 END AS seq_end,
               CAST(CASE WHEN n_tokens > 0
                    THEN (tok_start + n_tokens - 1) // 512 - tok_start // 512 + 1
                    ELSE 0 END AS BIGINT) AS n_seqs,
               tok_start % 512 AS offset_in_seq
        FROM o ORDER BY doc_id
"""

# Product-quantization ADC top-k (r4). Reproduces pq_codebooks +
# pq_encode + pq_adc_topk exactly: seeds = the 16 md5-hash-ordered
# corpus rows (same rule as the IVF oracle), codebook[j] = subspace-j
# slices of the seeds, encoding = per-(vec, subspace) argmin of the
# sequential-fold squared L2 (ties to the lower code, matching Spark's
# struct array_min), reconstruction = codebook picks flattened in
# subspace order, score = list_dot_product(query, reconstruction) —
# the same fold-parity contract the cosine/IVF oracles rely on.
def _ann_pq_sql(m: int = 8, k_sub: int = 16, dims: int = 64, k: int = 10) -> str:
    d_sub = dims // m
    sq = _IVF_SQ.format(a=f"(e.ev[b.j * {d_sub} + 1 : b.j * {d_sub} + {d_sub}])", b="b.cv")
    return f"""
        WITH seeds AS (
          SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code,
                 embedding::DOUBLE[] AS sv
          FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {k_sub}
        ),
        book AS (
          SELECT s.code, t.j, s.sv[t.j * {d_sub} + 1 : t.j * {d_sub} + {d_sub}] AS cv
          FROM seeds s CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS j) t
        ),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        enc AS (
          SELECT vec_id, j, code FROM (
            SELECT e.vec_id, b.j, b.code,
                   row_number() OVER (
                     PARTITION BY e.vec_id, b.j
                     ORDER BY {sq}, b.code
                   ) AS rn
            FROM e CROSS JOIN book b
          ) WHERE rn = 1
        ),
        recon AS (
          SELECT enc.vec_id, flatten(list(b.cv ORDER BY enc.j)) AS rv
          FROM enc JOIN book b ON b.j = enc.j AND b.code = enc.code
          GROUP BY enc.vec_id
        ),
        q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
        SELECT r.vec_id AS vec_id,
               round(list_dot_product(q.qe, r.rv), 6) AS adc_score
        FROM recon r CROSS JOIN q
        ORDER BY adc_score DESC, vec_id
        LIMIT {k}
    """


ORACLES["ann_topk_pq"] = _ann_pq_sql()

# SQ8 scalar-quantized ADC top-k (r6): per-dimension min/max fit (exact
# — min/max select existing doubles, no accumulation), floor(+0.5)
# half-up encode with [0,255] clamp, affine dequant, full-precision
# query dot via list_dot_product (same sequential-fold parity contract
# as the PQ oracle). Constant dimensions (mx = mn) reconstruct mn.
ORACLES["ann_topk_sq8"] = r"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        dim AS (SELECT unnest(generate_series(1, 64)) AS i),
        mm AS (SELECT i, min(ev[i]) AS mn, max(ev[i]) AS mx
               FROM e CROSS JOIN dim GROUP BY i),
        mma AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
                FROM mm),
        q AS (SELECT ev AS qe FROM e WHERE vec_id = 0),
        recon AS (
          SELECT e.vec_id,
                 list_transform(generate_series(1, 64), i ->
                   CASE WHEN mxs[i] = mns[i] THEN mns[i]
                        ELSE mns[i]
                             + least(255, greatest(0,
                                 floor((ev[i] - mns[i]) / (mxs[i] - mns[i]) * 255 + 0.5)))
                               * (mxs[i] - mns[i]) / 255.0 END
                 ) AS rv
          FROM e CROSS JOIN mma)
        SELECT r.vec_id AS vec_id, round(list_dot_product(q.qe, r.rv), 6) AS adc_score
        FROM recon r CROSS JOIN q
        ORDER BY adc_score DESC, vec_id
        LIMIT 10
"""

# Pretraining-data curation capstone (r4): PII gate → decontamination →
# exact fingerprint dedup → stratified domain mix → quality annotate →
# 512-token sequence packing, each stage the exact SQL replica of its
# graded standalone oracle (PII planting from pii_scan_documents,
# 3-gram flags from _DECONTAM_CTES' rule, _NORMALIZED_TEXT fingerprints,
# the integer-threshold portable rate hash, the quality-v1 weight hash,
# and the all-integer prefix-sum packing arithmetic).
ORACLES["pretraining_pipeline"] = rf"""
        WITH train AS (
          SELECT doc_id, source, text FROM documents WHERE doc_id % 97 <> 0),
        ingested AS (
          SELECT doc_id, source, text FROM train
          UNION ALL
          SELECT doc_id + (SELECT max(doc_id) + 1 FROM train), source, text
          FROM train WHERE doc_id % 25 = 0),
        planted AS (
          SELECT doc_id, source,
                 CASE WHEN doc_id % 10 = 0
                      THEN text || ' contact_' || CAST(doc_id AS VARCHAR)
                           || '@example.com call +1-555-' || CAST(doc_id AS VARCHAR)
                      ELSE text END AS text
          FROM ingested),
        no_pii AS (
          SELECT * FROM planted
          WHERE len(regexp_extract_all(coalesce(text, ''),
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) = 0
            AND len(regexp_extract_all(coalesce(text, ''), '\+\d{{1,2}}-\d{{3}}-\d+')) = 0),
        fp AS (
          SELECT doc_id, source, text, md5(coalesce(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), '')) AS f
          FROM no_pii),
        surv AS (
          SELECT doc_id, source, text FROM fp
          WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
        tr_sh AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                       i -> array_to_string(w[i:i+2], ' '))) AS shingle
          FROM (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') AS w FROM surv)),
        b_sh AS (
          SELECT DISTINCT
                 unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                       i -> array_to_string(w[i:i+2], ' '))) AS shingle
          FROM (SELECT list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') AS w
                FROM documents WHERE doc_id % 97 = 0)),
        contaminated AS (
          SELECT DISTINCT t.doc_id FROM tr_sh t JOIN b_sh b USING (shingle)),
        decont AS (
          SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
        mixed AS (
          SELECT * FROM decont
          WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'mix-v1'), 1, 15))
                     AS UBIGINT) % 10000
                < CASE WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 10000 ELSE 4000 END),
        tok AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\s+'), sw -> sw <> '')) AS w
          FROM mixed),
        stats AS (
          SELECT doc_id, count(*) AS n_tokens,
                 SUM(CAST(CAST(concat('0x', substr(md5(w || 'quality-v1'), 1, 15)) AS UBIGINT)
                          % 10001 AS BIGINT) - 5000) AS w_sum
          FROM tok GROUP BY doc_id),
        packed AS (
          SELECT doc_id, n_tokens, w_sum,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS tok_start
          FROM stats)
        SELECT p.doc_id, m.source, p.n_tokens,
               p.w_sum * CAST(1.0 AS DOUBLE) / (p.n_tokens * 5000) AS quality_logit,
               p.tok_start,
               p.tok_start // 512 AS seq_start,
               CAST(CASE WHEN p.n_tokens > 0
                    THEN (p.tok_start + p.n_tokens - 1) // 512 - p.tok_start // 512 + 1
                    ELSE 0 END AS BIGINT) AS n_seqs
        FROM packed p JOIN mixed m USING (doc_id)
        ORDER BY p.doc_id
"""

# Reverse-direction contamination report (r4): same join rule as the
# forward flags, aggregated per benchmark document.
ORACLES["benchmark_contamination_report"] = f"""
        WITH {_DECONTAM_BASE}
        SELECT b.bench_doc,
               count(DISTINCT t.doc_id) AS n_contaminated_train_docs,
               count(DISTINCT t.shingle) AS n_shared_ngrams
        FROM (SELECT DISTINCT doc_id, shingle FROM train) t
        JOIN bench b USING (shingle)
        GROUP BY b.bench_doc
        ORDER BY b.bench_doc
"""

# Temperature-alpha mixing (r4, alpha = 0.5): thresholds recomputed in
# SQL with the exact driver arithmetic — sqrt is IEEE correctly rounded
# in both engines and the quantization is floor (engine-identical),
# never round (tie-divergent).
ORACLES["temperature_mix_orders"] = """
        WITH s AS (SELECT o_orderkey,
                          CAST(length(CAST(o_orderkey AS VARCHAR)) AS INTEGER) AS magnitude
                   FROM orders),
        c AS (SELECT magnitude AS v, count(*) AS c FROM s GROUP BY 1),
        m AS (SELECT min(c) AS cmin FROM c),
        t AS (SELECT v, CAST(floor(10000 * sqrt(cmin * CAST(1.0 AS DOUBLE) / c)) AS BIGINT) AS th
              FROM c CROSS JOIN m)
        SELECT s.o_orderkey, s.magnitude
        FROM s JOIN t ON s.magnitude = t.v
        WHERE CAST(concat('0x', substr(md5(CAST(s.o_orderkey AS VARCHAR) || 'temp-v1'), 1, 15))
                   AS UBIGINT) % 10000 < th
        ORDER BY s.o_orderkey
"""

# IVF-PQ composition (r4): probe cells from the IVF oracle's seeding +
# assignment CTEs, then the PQ oracle's encode/reconstruct/ADC applied
# to the probed subset only. Python's probe-ordering fold (0-init
# left-to-right sum) is bitwise the SQL sequential fold, the contract
# ivf_topk already relies on.
def _ann_ivfpq_sql(
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    k_sub: int = 16,
    dims: int = 64,
    k: int = 10,
) -> str:
    d_sub = dims // m
    sq = _IVF_SQ.format(
        a=f"(p.ev[b.j * {d_sub} + 1 : b.j * {d_sub} + {d_sub}])", b="b.cv"
    )
    return f"""
        WITH {_ivf_assigned_ctes(n_cells)},
        q AS (SELECT ev AS qe FROM e WHERE vec_id = 0),
        probes AS (
          SELECT cell FROM c CROSS JOIN q
          ORDER BY {_IVF_SQ.format(a="q.qe", b="c.cv")}, cell
          LIMIT {n_probe}
        ),
        pr AS (SELECT a.vec_id, a.ev FROM assigned a JOIN probes USING (cell)),
        seeds AS (
          SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code,
                 embedding::DOUBLE[] AS sv
          FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {k_sub}
        ),
        book AS (
          SELECT s.code, t.j, s.sv[t.j * {d_sub} + 1 : t.j * {d_sub} + {d_sub}] AS cv
          FROM seeds s CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS j) t
        ),
        enc AS (
          SELECT vec_id, j, code FROM (
            SELECT p.vec_id, b.j, b.code,
                   row_number() OVER (
                     PARTITION BY p.vec_id, b.j
                     ORDER BY {sq}, b.code
                   ) AS rn
            FROM pr p CROSS JOIN book b
          ) WHERE rn = 1
        ),
        recon AS (
          SELECT enc.vec_id, flatten(list(b.cv ORDER BY enc.j)) AS rv
          FROM enc JOIN book b ON b.j = enc.j AND b.code = enc.code
          GROUP BY enc.vec_id
        )
        SELECT r.vec_id AS vec_id,
               round(list_dot_product(q.qe, r.rv), 6) AS adc_score
        FROM recon r CROSS JOIN q
        ORDER BY adc_score DESC, vec_id
        LIMIT {k}
    """


ORACLES["ann_topk_ivfpq"] = _ann_ivfpq_sql()

# Per-sequence manifest (r4): same token counts and prefix sum as the
# packing oracles, fanned out with generate_series and aggregated with
# pure interval arithmetic — all integers.
ORACLES["sequence_manifest_documents"] = r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                           ELSE len(list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '')) END AS INTEGER)
                   AS n_tokens
          FROM documents),
        o AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS tok_start
          FROM t),
        per AS (
          SELECT doc_id, n_tokens, tok_start,
                 unnest(generate_series(tok_start // 512,
                                        (tok_start + n_tokens - 1) // 512)) AS seq_id
          FROM o WHERE n_tokens > 0)
        SELECT seq_id,
               count(*) AS n_docs,
               CAST(SUM(least(tok_start + n_tokens, (seq_id + 1) * 512)
                   - greatest(tok_start, seq_id * 512)) AS BIGINT) AS n_tokens_filled,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM per GROUP BY seq_id ORDER BY seq_id
"""

# Sequence emitter (r5): same token counts + prefix sum as the manifest
# oracle, then a 1-based DuckDB list slice per (doc, sequence) and an
# ORDER BY tok_start string_agg — the exact splice the Spark side does
# with slice + array_sort + flatten + array_join.
ORACLES["pack_emit_sequences"] = r"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN []
                      ELSE list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') END AS w
          FROM documents),
        c AS (
          SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tokens FROM t),
        o AS (
          SELECT doc_id, w, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS tok_start
          FROM c),
        per AS (
          SELECT doc_id, w, n_tokens, tok_start,
                 unnest(generate_series(tok_start // 512,
                                        (tok_start + n_tokens - 1) // 512)) AS seq_id
          FROM o WHERE n_tokens > 0),
        sliced AS (
          SELECT seq_id, tok_start,
                 w[(greatest(seq_id * 512 - tok_start, 0) + 1):
                   (greatest(seq_id * 512 - tok_start, 0)
                    + least(tok_start + n_tokens, (seq_id + 1) * 512)
                    - greatest(tok_start, seq_id * 512))] AS piece
          FROM per)
        SELECT seq_id,
               count(*) AS n_docs,
               CAST(SUM(len(piece)) AS BIGINT) AS n_tokens_filled,
               string_agg(array_to_string(piece, ' '), ' ' ORDER BY tok_start)
                 AS seq_text
        FROM sliced GROUP BY seq_id ORDER BY seq_id
"""

# Gopher-rule quality gate (r5): every ratio replayed with the same
# integer counts and identical IEEE division operand order as the Spark
# column expressions.
ORACLES["text_gopher_quality"] = r"""
        WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
        w AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN []
                      ELSE list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') END AS words,
                 list_filter(list_transform(string_split_regex(text, '\r?\n'),
                                            x -> trim(x)), x -> x <> '') AS lines
          FROM d),
        m AS (
          SELECT doc_id,
                 CAST(len(words) AS BIGINT) AS n_words,
                 CASE WHEN len(words) = 0 THEN 0.0
                      ELSE CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE)
                           / len(words) END AS mean_word_len,
                 CASE WHEN len(words) = 0 THEN 0.0
                      ELSE CAST(len(list_filter(words,
                             x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                           / len(words) END AS frac_alpha_words,
                 CASE WHEN len(lines) = 0 THEN 0.0
                      ELSE CAST(len(list_filter(lines,
                             x -> regexp_matches(x, '^[-*•·]'))) AS DOUBLE)
                           / len(lines) END AS frac_bullet_lines,
                 CASE WHEN len(lines) = 0 THEN 0.0
                      ELSE CAST(len(list_filter(lines,
                             x -> regexp_matches(x, '(\.\.\.|…)$'))) AS DOUBLE)
                           / len(lines) END AS frac_ellipsis_lines,
                 CASE WHEN len(lines) = 0 THEN 0.0
                      ELSE CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                           / len(lines) END AS frac_dup_lines,
                 CAST(len(list_intersect(
                        list_distinct(list_transform(words, x -> lower(x))),
                        ['the','be','to','of','and','that','have','with']))
                      AS BIGINT) AS n_stop_present
          FROM w)
        SELECT *,
               (n_words >= 50 AND n_words <= 100000
                AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND frac_alpha_words >= 0.8
                AND frac_bullet_lines <= 0.9
                AND frac_ellipsis_lines <= 0.3
                AND frac_dup_lines <= 0.3
                AND n_stop_present >= 2) AS gopher_pass
        FROM m ORDER BY doc_id
"""

# DSIR-style importance scoring (r5): hashed-bigram bucket counts for
# raw and target corpora, per-doc mass sums, linear-difference score.
ORACLES["importance_score_documents"] = r"""
        WITH raw AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
        tgt AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
        rg AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(w) - 1),
                                       i -> w[i] || ' ' || w[i+1])) AS g
          FROM (SELECT doc_id,
                       list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '') AS w FROM raw)),
        tg AS (
          SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                       i -> w[i] || ' ' || w[i+1])) AS g
          FROM (SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '') AS w FROM tgt)),
        rb AS (
          SELECT doc_id,
                 CAST(CAST(concat('0x', substr(md5(g || 'dsir-v1'), 1, 15)) AS UBIGINT)
                      % 4096 AS BIGINT) AS b
          FROM rg),
        tb AS (
          SELECT CAST(CAST(concat('0x', substr(md5(g || 'dsir-v1'), 1, 15)) AS UBIGINT)
                      % 4096 AS BIGINT) AS b
          FROM tg),
        rc AS (SELECT b, count(*) AS r FROM rb GROUP BY b),
        tc AS (SELECT b, count(*) AS t FROM tb GROUP BY b),
        totals AS (SELECT (SELECT count(*) FROM rb) AS rt, (SELECT count(*) FROM tb) AS tt)
        SELECT rb.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(coalesce(tc.t, 0)) AS BIGINT) AS target_mass,
               CAST(SUM(coalesce(rc.r, 0)) AS BIGINT) AS raw_mass,
               CAST(SUM(coalesce(tc.t, 0)) AS DOUBLE) / (SELECT CAST(tt AS DOUBLE) FROM totals)
                 - CAST(SUM(coalesce(rc.r, 0)) AS DOUBLE) / (SELECT CAST(rt AS DOUBLE) FROM totals)
                 AS importance
        FROM rb LEFT JOIN rc USING (b) LEFT JOIN tc USING (b)
        GROUP BY rb.doc_id ORDER BY rb.doc_id
"""

# Deterministic global training shuffle (r5): rank by md5(key ‖ seed).
ORACLES["training_order_documents"] = """
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(doc_id AS VARCHAR) || 'shuffle-v1')
               ) - 1 AS BIGINT) AS shuffle_rank
        FROM documents ORDER BY doc_id
"""

# Fractional-epoch mixture materialization (r5): 2.5 epochs of src0-4
# (2 whole copies + hash < 5000 for the half), 0.4 of the rest (hash <
# 4000, no whole copy) — integer thresholds, engine-identical.
ORACLES["epoch_mix_documents"] = """
        WITH p AS (
          SELECT doc_id, source,
                 CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 2 ELSE 0 END
                   AS n_whole,
                 CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 5000 ELSE 4000 END
                   AS th
          FROM documents),
        e AS (
          SELECT doc_id, source,
                 n_whole + CASE WHEN CAST(concat('0x',
                     substr(md5(CAST(doc_id AS VARCHAR) || 'epoch-v1'), 1, 15))
                     AS UBIGINT) % 10000 < th THEN 1 ELSE 0 END AS n_copies
          FROM p)
        SELECT doc_id, source,
               CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS epoch
        FROM e WHERE n_copies > 0 ORDER BY doc_id, epoch
"""

# Exact-substring contamination (r5): the oracle verifies containment
# naively over all pairs (the needle side is k rows), space-padded so
# the match is word-aligned exactly like the Spark locate.
ORACLES["exact_contamination_documents"] = r"""
        WITH c AS (
          SELECT doc_id, regexp_replace(trim(text), '\s+', ' ', 'g') AS hay
          FROM documents),
        s AS (
          SELECT doc_id AS needle_id, array_to_string(w[3:10], ' ') AS needle
          FROM (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') AS w
                FROM documents WHERE doc_id % 53 = 0)
          WHERE len(w) >= 10)
        SELECT c.doc_id, s.needle_id,
               CAST(strpos(' ' || c.hay || ' ', ' ' || s.needle || ' ') AS BIGINT)
                 AS position
        FROM c CROSS JOIN s
        WHERE strpos(' ' || c.hay || ' ', ' ' || s.needle || ' ') > 0
        ORDER BY c.doc_id, s.needle_id
"""

# Span-level decontamination surgery (r6): replay the union-of-covered-
# token-positions semantics — per needle, every aligned match start
# (slice-equality over the filtered word list), expanded to covered
# positions, unioned per doc; the clean text splices the uncovered
# positions back together. The word-aligned strpos prune mirrors the
# operator's lossless anchor-gram candidate pruning.
ORACLES["decontam_remove_spans"] = r"""
        WITH nd0 AS (
          SELECT list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') AS w
          FROM documents WHERE doc_id % 53 = 0),
        nd AS (
          SELECT DISTINCT array_to_string(w[3:10], ' ') AS needle, 8 AS nlen
          FROM nd0 WHERE len(w) >= 10),
        c AS (
          SELECT doc_id,
                 regexp_replace(trim(coalesce(text, '')), '\s+', ' ', 'g') AS hay,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN CAST([] AS VARCHAR[])
                      ELSE list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') END AS words
          FROM documents),
        hit AS (
          SELECT c.doc_id, n.needle, n.nlen, c.words
          FROM c JOIN nd n ON strpos(' ' || c.hay || ' ', ' ' || n.needle || ' ') > 0),
        st AS (
          SELECT doc_id, needle,
                 flatten(list_transform(
                   list_filter(generate_series(1, len(words) - nlen + 1),
                               p -> array_to_string(words[p:p+nlen-1], ' ') = needle),
                   p -> generate_series(p, p + nlen - 1))) AS covp
          FROM hit),
        cov AS (
          SELECT doc_id,
                 count(DISTINCT needle) AS n_hit,
                 list_distinct(flatten(list(covp))) AS cov
          FROM st GROUP BY doc_id)
        SELECT c.doc_id,
               CAST(coalesce(v.n_hit, 0) AS INTEGER) AS n_needles_hit,
               CAST(coalesce(len(v.cov), 0) AS INTEGER) AS n_tokens_removed,
               md5(CASE WHEN v.doc_id IS NULL THEN c.hay
                        ELSE array_to_string(list_transform(
                               list_filter(generate_series(1, len(c.words)),
                                           i -> NOT list_contains(v.cov, i)),
                               i -> c.words[i]), ' ') END) AS clean_hash
        FROM c LEFT JOIN cov v USING (doc_id)
        ORDER BY c.doc_id
"""

# Data-expectations gate (r6): per-column nulls / exact distincts /
# PK-contract flag, unpivoted with UNION ALL. null_frac stays the
# unrounded exact-integer ratio; count(DISTINCT col) ignores NULLs in
# both engines, so unique_nonnull is the same conjunction.
ORACLES["validate_documents_expectations"] = r"""
        WITH s AS (
          SELECT count(*) AS n,
                 coalesce(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END), 0) AS nn_doc_id,
                 count(DISTINCT doc_id) AS nd_doc_id,
                 coalesce(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END), 0) AS nn_lang,
                 count(DISTINCT lang) AS nd_lang,
                 coalesce(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END), 0) AS nn_source,
                 count(DISTINCT source) AS nd_source,
                 coalesce(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END), 0) AS nn_text,
                 count(DISTINCT text) AS nd_text
          FROM documents)
        SELECT col_name, n AS n_rows, CAST(nn AS BIGINT) AS n_nulls,
               CAST(nn AS DOUBLE) / greatest(n, 1) AS null_frac,
               nd AS n_distinct,
               (nn = 0 AND nd = n) AS unique_nonnull
        FROM (
          SELECT 'doc_id' AS col_name, n, nn_doc_id AS nn, nd_doc_id AS nd FROM s
          UNION ALL
          SELECT 'lang', n, nn_lang, nd_lang FROM s
          UNION ALL
          SELECT 'source', n, nn_source, nd_source FROM s
          UNION ALL
          SELECT 'text', n, nn_text, nd_text FROM s)
        ORDER BY col_name
"""

# Cluster-balanced diversity sampling (r5): the IVF seeding/assignment
# CTEs, k-row integer thresholds (floor division, engine-exact), and
# the portable hash keep rule.
ORACLES["cluster_balanced_sample_embeddings"] = f"""
        WITH {_ivf_assigned_ctes(8)},
        cnt AS (SELECT cell, count(*) AS n FROM assigned GROUP BY cell),
        thr AS (SELECT cell, least(10000, (10000 * 30) // n) AS th FROM cnt)
        SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell
        FROM assigned a JOIN thr t USING (cell)
        WHERE CAST(concat('0x', substr(md5(CAST(a.vec_id AS VARCHAR) || 'diverse-v1'),
                                       1, 15)) AS UBIGINT) % 10000 < t.th
        ORDER BY a.vec_id
"""

# Per-source curation report (r5 capstone): gopher rules, quality-v1
# keep (sign of the integer weight sum), fingerprint dups, and the
# 3-gram contamination rule, each replayed with the exact expressions of
# their standalone oracles, aggregated per source with integer counts.
ORACLES["curation_report_by_source"] = rf"""
        WITH t0 AS (
          SELECT doc_id, source, text FROM documents WHERE doc_id % 97 <> 0),
        base AS (
          SELECT doc_id, source,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                      ELSE len(list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '')) END AS n_tokens
          FROM t0),
        gw AS (
          SELECT doc_id,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN []
                      ELSE list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'), sw -> sw <> '') END AS words,
                 list_filter(list_transform(string_split_regex(coalesce(text, ''), '\r?\n'),
                                            x -> trim(x)), x -> x <> '') AS lines
          FROM t0),
        gm AS (
          SELECT doc_id,
                 CAST(len(words) AS BIGINT) AS n_words,
                 CASE WHEN len(words) = 0 THEN 0.0
                      ELSE CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE)
                           / len(words) END AS mwl,
                 CASE WHEN len(words) = 0 THEN 0.0
                      ELSE CAST(len(list_filter(words,
                             x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                           / len(words) END AS fa,
                 CASE WHEN len(lines) = 0 THEN 0.0
                      ELSE CAST(len(list_filter(lines,
                             x -> regexp_matches(x, '^[-*•·]'))) AS DOUBLE)
                           / len(lines) END AS fb,
                 CASE WHEN len(lines) = 0 THEN 0.0
                      ELSE CAST(len(list_filter(lines,
                             x -> regexp_matches(x, '(\.\.\.|…)$'))) AS DOUBLE)
                           / len(lines) END AS fe,
                 CASE WHEN len(lines) = 0 THEN 0.0
                      ELSE CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                           / len(lines) END AS fd,
                 CAST(len(list_intersect(
                        list_distinct(list_transform(words, x -> lower(x))),
                        ['the','be','to','of','and','that','have','with']))
                      AS BIGINT) AS ns
          FROM gw),
        gp AS (
          SELECT doc_id,
                 (n_words >= 50 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
                  AND fa >= 0.8 AND fb <= 0.9 AND fe <= 0.3 AND fd <= 0.3 AND ns >= 2)
                   AS gopher_pass
          FROM gm),
        qtok AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\s+'), sw -> sw <> '')) AS w
          FROM t0),
        qk AS (
          SELECT doc_id,
                 SUM(CAST(CAST(concat('0x', substr(md5(w || 'quality-v1'), 1, 15))
                               AS UBIGINT) % 10001 AS BIGINT) - 5000) > 0 AS keep
          FROM qtok GROUP BY doc_id),
        fp AS (
          SELECT doc_id, md5(coalesce({_NORMALIZED_TEXT}, '')) AS f FROM t0),
        dups AS (
          SELECT doc_id,
                 doc_id > min(doc_id) OVER (PARTITION BY f) AS is_dup
          FROM fp),
        tw AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') AS w FROM t0),
        tsh AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                       i -> array_to_string(w[i:i+2], ' '))) AS shingle
          FROM tw),
        bsh AS (
          SELECT DISTINCT
                 unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                       i -> array_to_string(w[i:i+2], ' '))) AS shingle
          FROM (SELECT list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') AS w
                FROM documents WHERE doc_id % 97 = 0)),
        cont AS (
          SELECT DISTINCT t.doc_id FROM tsh t JOIN bsh b USING (shingle))
        SELECT b.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(b.n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN g.gopher_pass THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_gopher_pass,
               CAST(SUM(CASE WHEN q.keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_quality_pass,
               CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_exact_dup,
               CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_contaminated
        FROM base b
        JOIN gp g USING (doc_id)
        LEFT JOIN qk q USING (doc_id)
        JOIN dups d USING (doc_id)
        LEFT JOIN cont c USING (doc_id)
        GROUP BY b.source ORDER BY b.source
"""

# Deterministic train/val/test split (r5): cumulative integer bounds in
# sorted-name order (test 0.1 -> 1000, train +0.8 -> 9000, val = rest),
# half-open ranges over the portable hash.
ORACLES["hash_split_documents"] = """
        SELECT doc_id, source,
               CASE WHEN h < 1000 THEN 'test'
                    WHEN h < 9000 THEN 'train'
                    ELSE 'val' END AS split
        FROM (SELECT doc_id, source,
                     CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)
                                                  || 'split-v1'), 1, 15))
                          AS UBIGINT) % 10000 AS h
              FROM documents)
        ORDER BY doc_id
"""

# Conditional-bigram surprisal (r5): bigram + unigram counts from one
# tokenize, add-one smoothing, the unigram oracle's 9-dp DECIMAL
# fixed-point accumulation.
ORACLES["text_bigram_surprisal"] = r"""
        WITH tok AS (
          SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '') AS w
          FROM documents),
        pairs0 AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                       i -> {'w1': w[i], 'w2': w[i+1]})) AS g
          FROM tok),
        pairs AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM pairs0),
        uni AS (SELECT unnest(w) AS u FROM tok),
        uc AS (SELECT u, count(*) AS c1 FROM uni GROUP BY u),
        bc AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
        vs AS (SELECT count(*) AS V FROM uc),
        per AS (
          SELECT p.doc_id,
                 -ln((c12 + CAST(1.0 AS DOUBLE)) / (c1 + V)) AS s
          FROM pairs p JOIN bc USING (w1, w2) JOIN uc ON p.w1 = uc.u CROSS JOIN vs)
        SELECT doc_id,
               count(*) AS n_bigrams,
               round(CAST(SUM(CAST(round(s, 9) AS DECIMAL(18,9))) AS DOUBLE)
                     / count(*), 6) AS mean_surprisal
        FROM per GROUP BY doc_id ORDER BY doc_id
"""

# Length-bucketed batching (r5): the naive global ROW_NUMBER the Spark
# side deliberately avoids (two-phase prefix rank instead).
ORACLES["length_bucketed_batches_documents"] = r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                           ELSE len(list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '')) END
                      AS INTEGER) AS n_tokens
          FROM documents)
        SELECT doc_id, n_tokens,
               CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) - 1 AS BIGINT)
                 AS rank,
               CAST((ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) - 1) // 64
                    AS BIGINT) AS batch_id
        FROM t ORDER BY doc_id
"""

# SemDeDup-style cluster-pruned near-dup pairs (r5): within-cell pairs
# only (the method's explicit trade), cosine from the same sequential
# fold as the other embedding oracles, unrounded threshold filter with
# rounded output.
ORACLES["semantic_dedup_pairs_embeddings"] = f"""
        WITH {_ivf_assigned_ctes(8)}
        SELECT CAST(a.cell AS INTEGER) AS cell,
               a.vec_id AS doc_a, b.vec_id AS doc_b,
               round(list_dot_product(a.ev, b.ev) /
                     (sqrt(list_dot_product(a.ev, a.ev)) *
                      sqrt(list_dot_product(b.ev, b.ev))), 6) AS cosine
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.ev, b.ev) /
              (sqrt(list_dot_product(a.ev, a.ev)) *
               sqrt(list_dot_product(b.ev, b.ev))) >= 0.45
        ORDER BY cell, doc_a, doc_b
"""

# Top-5 TF-IDF keywords per source (late r5): one tokenize CTE feeds the
# per-source tf and per-term df aggregates; idf = ln(N/df) with N = all
# docs; ranked on the ROUNDED score with term-asc ties (the BM25
# ordering discipline — both engines rank the same 6-dp number).
ORACLES["tfidf_keywords_by_source"] = r"""
        WITH tok AS (
          SELECT doc_id, source,
                 unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '')) AS term
          FROM documents WHERE trim(text) <> ''),
        tf AS (SELECT source, term, count(*) AS tf FROM tok GROUP BY source, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents),
        s AS (
          SELECT tf.source, tf.term,
                 round(tf.tf * ln(n_docs / df.df), 6) AS tfidf
          FROM tf JOIN df USING (term) CROSS JOIN n),
        r AS (
          SELECT source, term, tfidf,
                 CAST(row_number() OVER (
                   PARTITION BY source ORDER BY tfidf DESC, term) AS INTEGER) AS rk
          FROM s)
        SELECT source, term, tfidf, rk FROM r WHERE rk <= 5
        ORDER BY source, rk
"""

# BPE pair statistics (late r5): per-word adjacent character pairs via
# the same list_transform+unnest idiom as text_winnowing; integer counts
# so the top-50 ordering is exactly deterministic.
ORACLES["bpe_pair_stats"] = r"""
        WITH w AS (
          SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '')) AS word
          FROM documents WHERE trim(text) <> ''),
        p AS (
          SELECT unnest(list_transform(generate_series(1, len(word) - 1),
                   i -> substring(word, CAST(i AS INTEGER), 2))) AS pair
          FROM w WHERE len(word) >= 2)
        SELECT pair, count(*) AS n_occurrences
        FROM p GROUP BY pair
        ORDER BY n_occurrences DESC, pair
        LIMIT 50
"""

# Rolling 1-hour RANGE frame (late r5): the Spark side orders the frame
# on ts cast to epoch SECONDS (truncating), so the oracle floors
# epoch_us the same way; DECIMAL(18,6) accumulation makes the windowed
# sum exact under any intra-frame order; no division is emitted.
ORACLES["events_rolling_1h"] = r"""
        WITH e AS (
          SELECT event_id, user_id,
                 epoch_us(ts) // 1000000 AS tsec,
                 CAST(value AS DECIMAL(18,6)) AS v
          FROM events)
        SELECT event_id, user_id,
               CAST(round(SUM(v) OVER w, 6) AS DOUBLE) AS sum_1h,
               COUNT(*) OVER w AS n_1h
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY tsec
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
"""

# Majority-vote k-NN classification (late r5): same cosine + 6-dp
# rounding + corpus-id tie-break as knn_join_top3, k=10; votes are
# integer counts so the per-query argmax (count desc, label asc) is
# exactly deterministic.
ORACLES["knn_classify_embeddings"] = f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding FROM embeddings
          WHERE vec_id % 97 = 0),
        c AS (
          SELECT vec_id, embedding, label FROM embeddings
          WHERE vec_id % 97 <> 0),
        scored AS (
          SELECT a.query_id, b.vec_id, b.label, round({_COSINE}, 6) AS score
          FROM q a JOIN c b ON true),
        ranked AS (
          SELECT query_id, label,
                 row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, vec_id) AS rk
          FROM scored),
        votes AS (
          SELECT query_id, label, count(*) AS n_votes
          FROM ranked WHERE rk <= 10 GROUP BY query_id, label),
        win AS (
          SELECT query_id, label AS predicted_label, n_votes,
                 row_number() OVER (
                   PARTITION BY query_id ORDER BY n_votes DESC, label) AS vr
          FROM votes)
        SELECT w.query_id, w.predicted_label, w.n_votes,
               e.label AS true_label
        FROM win w JOIN embeddings e ON e.vec_id = w.query_id
        WHERE vr = 1 ORDER BY query_id
"""

# Per-domain quota cap (late r5): the text_quality composite ranked
# per source. The rank is computed on the ROUNDED 6-dp quality with
# doc_id-asc ties, matching the Spark side's two-phase exact top-k
# (sampling.top_k_per_group) — the phases are a physical detail; the
# logical result is this single window.
ORACLES["quality_quota_by_source"] = f"""
        WITH f AS (SELECT doc_id, source, {_QUALITY_EXPRS} FROM documents),
        q AS (
          SELECT doc_id, source,
                 round(greatest(least(
                   1.0
                   - (CASE WHEN nw < 10 THEN 0.5 WHEN nw > 100000 THEN 0.5 ELSE 0.0 END)
                   - least(punct / nc * 2, 0.3)
                   - least(digits / nc * 2, 0.3)
                   - least(uppers / nc, 0.2)
                 , 1.0), 0.0), 6) AS quality
          FROM f),
        r AS (
          SELECT doc_id, source, quality,
                 CAST(row_number() OVER (
                   PARTITION BY source ORDER BY quality DESC, doc_id) AS INTEGER) AS rk
          FROM q)
        SELECT doc_id, source, quality, rk FROM r WHERE rk <= 5
        ORDER BY source, rk
"""

# Quality-weighted sampling without replacement (late r5): the
# Efraimidis-Spirakis order replayed exactly — u from the FULL 60-bit
# 15-hex md5 hash (seed 'ws-v1'): (double(h) + 1) / 2^60, the identical
# IEEE operand order as the Spark side (cast first, then +1, then
# divide — r5 ADVICE raised the old 10k-value quantization's collision
# bias); score ln(u)/weight rounded to 6 dp before ranking (the BM25
# ordering discipline), doc_id-asc ties. The Spark side's two-phase
# top-k is a physical detail; the logical result is this single window.
ORACLES["weighted_sample_documents"] = f"""
        WITH f AS (SELECT doc_id, source, {_QUALITY_EXPRS} FROM documents),
        q AS (
          SELECT doc_id, source,
                 round(greatest(least(
                   1.0
                   - (CASE WHEN nw < 10 THEN 0.5 WHEN nw > 100000 THEN 0.5 ELSE 0.0 END)
                   - least(punct / nc * 2, 0.3)
                   - least(digits / nc * 2, 0.3)
                   - least(uppers / nc, 0.2)
                 , 1.0), 0.0), 6) + 0.05 AS weight
          FROM f),
        s AS (
          SELECT doc_id, source, weight,
                 round(ln((CAST(CAST(concat('0x',
                     substr(md5(CAST(doc_id AS VARCHAR) || 'ws-v1'), 1, 15))
                   AS UBIGINT) AS DOUBLE) + 1.0) / 1152921504606846976.0)
                   / weight, 6) AS es_score
          FROM q WHERE weight > 0),
        r AS (
          SELECT doc_id, source, weight, es_score,
                 CAST(row_number() OVER (
                   PARTITION BY source ORDER BY es_score DESC, doc_id) AS INTEGER) AS rk
          FROM s)
        SELECT doc_id, source, weight, es_score, rk FROM r WHERE rk <= 10
        ORDER BY source, rk
"""

# Cross-document paragraph dedup (r6): the same planted 3-paragraph
# construction, global first-(doc,pos)-survives rule via a window (the
# Spark side's min(struct) hash aggregate is a physical detail), and
# the identical filter-by-position splice before hashing.
ORACLES["paragraph_dedup_documents"] = r"""
        WITH t AS (
          SELECT doc_id,
                 coalesce(array_to_string(string_split_regex(trim(text), '\s+')[1:8], ' '), '')
                   || chr(10) || chr(10) ||
                 'shared boilerplate block ' || CAST(doc_id % 7 AS VARCHAR)
                   || chr(10) || chr(10) ||
                 coalesce(array_to_string(string_split_regex(trim(text), '\s+')[9:16], ' '), '')
                   AS text
          FROM documents),
        sp AS (SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ps, text FROM t),
        p AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(ps)),
                                       i -> {'pos': i - 1, 'para': ps[i]})) AS e
          FROM sp),
        q AS (
          SELECT doc_id, e.pos AS pos, md5(e.para) AS h
          FROM p WHERE trim(e.para) <> ''),
        r AS (
          SELECT doc_id, pos,
                 count(*) OVER (PARTITION BY h) AS n,
                 row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
          FROM q),
        d AS (
          SELECT doc_id, list_sort(list(pos)) AS drop_pos
          FROM r WHERE n > 1 AND rn > 1 GROUP BY doc_id)
        SELECT sp.doc_id,
               CAST(len(ps) AS BIGINT) AS n_paras,
               CAST(coalesce(len(drop_pos), 0) AS BIGINT) AS n_dropped,
               md5(CASE WHEN drop_pos IS NULL THEN text
                   ELSE coalesce(array_to_string(
                          list_transform(
                            list_filter(generate_series(1, len(ps)),
                                        i -> NOT list_contains(drop_pos, i - 1)),
                            i -> ps[i]),
                          chr(10)||chr(10)), '') END) AS cleaned_hash
        FROM sp LEFT JOIN d USING (doc_id)
        ORDER BY doc_id
"""

# Per-source boilerplate stripping (r6): frequency rule — a trimmed
# non-empty line in ≥ ceil(0.5·|source|) distinct docs of its source is
# cut everywhere; identical planted header/middle/footer construction
# and position splice.
ORACLES["boilerplate_strip_documents"] = r"""
        WITH t AS (
          SELECT doc_id, source,
                 'header ' || source || chr(10) ||
                 coalesce(array_to_string(string_split_regex(trim(text), '\s+')[1:12], ' '), '')
                   || chr(10) ||
                 'footer ' || source AS text
          FROM documents),
        sp AS (SELECT doc_id, source, string_split_regex(text, '\r?\n') AS ls, text
               FROM t),
        l AS (
          SELECT doc_id, source,
                 unnest(list_transform(generate_series(1, len(ls)),
                                       i -> {'pos': i - 1, 'ln': ls[i]})) AS e
          FROM sp),
        q AS (
          SELECT doc_id, source, e.pos AS pos, md5(trim(e.ln)) AS h
          FROM l WHERE trim(e.ln) <> ''),
        thr AS (
          SELECT source, greatest(2, CAST(ceil(0.5 * count(*)) AS BIGINT)) AS t
          FROM documents GROUP BY source),
        b AS (
          SELECT q.source, q.h
          FROM q JOIN thr USING (source)
          GROUP BY q.source, q.h, thr.t
          HAVING count(DISTINCT q.doc_id) >= t),
        d AS (
          SELECT doc_id, list_sort(list(pos)) AS drop_pos
          FROM q JOIN b USING (source, h) GROUP BY doc_id)
        SELECT sp.doc_id, sp.source,
               CAST(len(ls) AS BIGINT) AS n_lines,
               CAST(coalesce(len(drop_pos), 0) AS BIGINT) AS n_stripped,
               md5(CASE WHEN drop_pos IS NULL THEN text
                   ELSE coalesce(array_to_string(
                          list_transform(
                            list_filter(generate_series(1, len(ls)),
                                        i -> NOT list_contains(drop_pos, i - 1)),
                            i -> ls[i]),
                          chr(10)), '') END) AS cleaned_hash
        FROM sp LEFT JOIN d USING (doc_id)
        ORDER BY doc_id
"""

# Mixture planning (r6): per-source inventories from one tokenize
# aggregate; shares are unrounded IEEE divisions of exact integers
# (identical operand order both engines), epochs_uniform divides by the
# exact BIGINT product k·n_tokens.
ORACLES["mixture_plan_by_source"] = r"""
        WITH per AS (
          SELECT source,
                 count(*) AS n_docs,
                 CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '')) END)
                      AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        tot AS (SELECT SUM(n_tokens) AS total, count(*) AS k FROM per)
        SELECT source, n_docs, n_tokens,
               CASE WHEN total = 0 THEN NULL
                    ELSE CAST(n_tokens AS DOUBLE) / total END AS natural_share,
               CASE WHEN n_tokens = 0 THEN NULL
                    ELSE CAST(total AS DOUBLE) / (k * n_tokens)
               END AS epochs_uniform
        FROM per CROSS JOIN tot
        ORDER BY source
"""

# Percentile length-band filter (r6): DuckDB quantile_cont interpolates
# identically to Spark's exact percentile (the percentile_order_totals
# parity); integer token counts compare against the double bounds the
# same way in both engines.
ORACLES["token_length_band_documents"] = r"""
        WITH t AS (
          SELECT doc_id, source,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                      ELSE len(list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '')) END
                      AS BIGINT) AS n_tokens
          FROM documents),
        b AS (SELECT quantile_cont(n_tokens, 0.05) AS lo,
                     quantile_cont(n_tokens, 0.95) AS hi FROM t)
        SELECT doc_id, source, n_tokens
        FROM t CROSS JOIN b
        WHERE n_tokens >= lo AND n_tokens <= hi
        ORDER BY doc_id
"""

# Per-source vocabulary drift (late r6): identical planted drift, the
# DSIR bucket hashing on unigrams, add-one smoothing over all 2048
# buckets, per-bucket terms rounded to 12 dp and accumulated in
# DECIMAL(28,12) — operand order mirrors the Spark expressions exactly.
ORACLES["vocab_drift_by_source"] = r"""
        WITH t0 AS (
          SELECT source,
                 CASE WHEN source = 'src7'
                      THEN text || ' ' || repeat('drifta driftb driftc driftd ', 40)
                      ELSE text END AS text
          FROM documents),
        tok AS (
          SELECT source,
                 unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '')) AS w
          FROM t0 WHERE trim(text) <> '' AND source IS NOT NULL),
        cb AS (
          SELECT source,
                 CAST(CAST(concat('0x', substr(md5(w || 'drift-v1'), 1, 15))
                           AS UBIGINT) % 256 AS BIGINT) AS b,
                 count(*) AS c
          FROM tok GROUP BY source, b),
        ts AS (SELECT source, SUM(c) AS t FROM cb GROUP BY source),
        gb AS (SELECT b, SUM(c) AS g FROM cb GROUP BY b),
        tot AS (SELECT SUM(c) AS T FROM cb),
        grid AS (
          SELECT ts.source, ts.t, gs.b
          FROM ts CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS b) gs),
        terms AS (
          SELECT grid.source, grid.t,
                 round(
                   (CAST(coalesce(cb.c, 0) + 1 AS DOUBLE)
                    / CAST(grid.t + 256 AS DOUBLE))
                   * ln(
                       (CAST(coalesce(cb.c, 0) + 1 AS DOUBLE)
                        / CAST(grid.t + 256 AS DOUBLE))
                       / (CAST(coalesce(gb.g, 0) + 1 AS DOUBLE)
                          / CAST(tot.T + 256 AS DOUBLE))),
                   12) AS term
          FROM grid
          LEFT JOIN cb ON grid.source = cb.source AND grid.b = cb.b
          LEFT JOIN gb ON grid.b = gb.b
          CROSS JOIN tot)
        SELECT source,
               CAST(min(t) AS BIGINT) AS n_tokens,
               round(CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6)
                 AS kl_vs_corpus
        FROM terms GROUP BY source ORDER BY source
"""

# Hard-negative mining (r6): same cosine + 6-dp rounding + corpus-id
# tie-break as the knn oracles, restricted to different-label pairs;
# the Spark side's two-phase top-k is a physical detail.
ORACLES["hard_negatives_embeddings"] = f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding, label FROM embeddings
          WHERE vec_id % 101 = 0 AND label IS NOT NULL),
        c AS (
          SELECT vec_id, embedding, label FROM embeddings
          WHERE vec_id % 101 <> 0 AND label IS NOT NULL),
        scored AS (
          SELECT a.query_id, b.vec_id, b.label, round({_COSINE}, 6) AS score
          FROM q a JOIN c b ON a.label <> b.label),
        r AS (
          SELECT query_id, vec_id, label, score,
                 CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rk
          FROM scored)
        SELECT query_id, vec_id, label, score, rk FROM r WHERE rk <= 5
        ORDER BY query_id, rk
"""

# Gopher repetition signals (r6): the single-explode (kind, hash, chars)
# stream replayed as UNION ALL branches; same md5-derived 60-bit item
# hash, same integer sums, same struct-max tie-break (count, then char
# mass), same final division operand order as the Spark columns.
ORACLES["text_repetition_signals"] = r"""
        WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
        base AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN []
                      ELSE list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') END AS words,
                 list_filter(list_transform(string_split_regex(text, '\r?\n'),
                                            x -> trim(x)), x -> x <> '') AS lines,
                 list_filter(list_transform(string_split_regex(text, '\n\s*\n'),
                                            x -> trim(x)), x -> x <> '') AS paras
          FROM d),
        items AS (
          SELECT doc_id, -1 AS kind, CAST(0 AS BIGINT) AS h,
                 CAST(len(array_to_string(words, ' ')) AS BIGINT) AS chars
          FROM base
          UNION ALL
          SELECT doc_id, 0,
                 CAST(CAST(concat('0x', substr(md5(it || 'rep-v1'), 1, 15))
                      AS UBIGINT) AS BIGINT),
                 CAST(len(it) AS BIGINT)
          FROM (SELECT doc_id, unnest(lines) AS it FROM base)
          UNION ALL
          SELECT doc_id, 1,
                 CAST(CAST(concat('0x', substr(md5(it || 'rep-v1'), 1, 15))
                      AS UBIGINT) AS BIGINT),
                 CAST(len(it) AS BIGINT)
          FROM (SELECT doc_id, unnest(paras) AS it FROM base)
          UNION ALL
          SELECT doc_id, 2,
                 CAST(CAST(concat('0x', substr(md5(it || 'rep-v1'), 1, 15))
                      AS UBIGINT) AS BIGINT),
                 CAST(len(it) AS BIGINT)
          FROM (SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(words) - 1),
                              i -> array_to_string(words[i:i+1], ' '))) AS it
                FROM base)
          UNION ALL
          SELECT doc_id, 3,
                 CAST(CAST(concat('0x', substr(md5(it || 'rep-v1'), 1, 15))
                      AS UBIGINT) AS BIGINT),
                 CAST(len(it) AS BIGINT)
          FROM (SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(words) - 2),
                              i -> array_to_string(words[i:i+2], ' '))) AS it
                FROM base)
          UNION ALL
          SELECT doc_id, 4,
                 CAST(CAST(concat('0x', substr(md5(it || 'rep-v1'), 1, 15))
                      AS UBIGINT) AS BIGINT),
                 CAST(len(it) AS BIGINT)
          FROM (SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(words) - 3),
                              i -> array_to_string(words[i:i+3], ' '))) AS it
                FROM base)),
        g1 AS (
          SELECT doc_id, kind, h, count(*) AS cnt, max(chars) AS chars
          FROM items GROUP BY doc_id, kind, h),
        g2 AS (
          SELECT doc_id, kind,
                 SUM(cnt) AS n_items,
                 COUNT(*) AS n_distinct,
                 SUM(cnt * chars) AS tot_chars,
                 SUM(CASE WHEN cnt >= 2 THEN cnt * chars ELSE 0 END) AS dup_chars,
                 (max(struct_pack(cnt := cnt, mass := cnt * chars))).mass AS top_mass
          FROM g1 GROUP BY doc_id, kind),
        p AS (
          SELECT doc_id,
                 coalesce(MAX(CASE WHEN kind = -1 THEN tot_chars END), 0) AS nc,
                 coalesce(MAX(CASE WHEN kind = 1 THEN n_items END), 0) AS np,
                 coalesce(MAX(CASE WHEN kind = 1 THEN n_distinct END), 0) AS ndp,
                 coalesce(MAX(CASE WHEN kind = 0 THEN tot_chars END), 0) AS lc,
                 coalesce(MAX(CASE WHEN kind = 0 THEN dup_chars END), 0) AS ldc,
                 coalesce(MAX(CASE WHEN kind = 1 THEN tot_chars END), 0) AS pc,
                 coalesce(MAX(CASE WHEN kind = 1 THEN dup_chars END), 0) AS pdc,
                 coalesce(MAX(CASE WHEN kind = 2 THEN top_mass END), 0) AS t2,
                 coalesce(MAX(CASE WHEN kind = 3 THEN top_mass END), 0) AS t3,
                 coalesce(MAX(CASE WHEN kind = 4 THEN top_mass END), 0) AS t4
          FROM g2 GROUP BY doc_id),
        f AS (
          SELECT doc_id,
                 CASE WHEN np = 0 THEN 0.0
                      ELSE CAST(np - ndp AS DOUBLE) / CAST(np AS DOUBLE)
                 END AS frac_dup_paras,
                 CASE WHEN lc = 0 THEN 0.0
                      ELSE CAST(ldc AS DOUBLE) / CAST(lc AS DOUBLE)
                 END AS frac_chars_dup_lines,
                 CASE WHEN pc = 0 THEN 0.0
                      ELSE CAST(pdc AS DOUBLE) / CAST(pc AS DOUBLE)
                 END AS frac_chars_dup_paras,
                 least(CASE WHEN nc = 0 THEN 0.0
                            ELSE CAST(t2 AS DOUBLE) / CAST(nc AS DOUBLE)
                       END, 1.0) AS frac_chars_top_2gram,
                 least(CASE WHEN nc = 0 THEN 0.0
                            ELSE CAST(t3 AS DOUBLE) / CAST(nc AS DOUBLE)
                       END, 1.0) AS frac_chars_top_3gram,
                 least(CASE WHEN nc = 0 THEN 0.0
                            ELSE CAST(t4 AS DOUBLE) / CAST(nc AS DOUBLE)
                       END, 1.0) AS frac_chars_top_4gram
          FROM p)
        SELECT *,
               (frac_dup_paras <= 0.30
                AND frac_chars_dup_paras <= 0.20
                AND frac_chars_dup_lines <= 0.20
                AND frac_chars_top_2gram <= 0.20
                AND frac_chars_top_3gram <= 0.18
                AND frac_chars_top_4gram <= 0.16) AS repetition_pass
        FROM f ORDER BY doc_id
"""

# CCNet perplexity buckets (r6): the bigram-surprisal CTE verbatim, then
# discrete tercile cuts by integer indexing into the sorted per-source
# score list — the same ceil(n/3)/ceil(2n/3) positions, no interpolation.
ORACLES["perplexity_buckets_by_source"] = r"""
        WITH tok AS (
          SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '') AS w
          FROM documents),
        pairs0 AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                       i -> {'w1': w[i], 'w2': w[i+1]})) AS g
          FROM tok),
        pairs AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM pairs0),
        uni AS (SELECT unnest(w) AS u FROM tok),
        uc AS (SELECT u, count(*) AS c1 FROM uni GROUP BY u),
        bc AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
        vs AS (SELECT count(*) AS V FROM uc),
        per AS (
          SELECT p.doc_id,
                 -ln((c12 + CAST(1.0 AS DOUBLE)) / (c1 + V)) AS s
          FROM pairs p JOIN bc USING (w1, w2) JOIN uc ON p.w1 = uc.u CROSS JOIN vs),
        scored AS (
          SELECT doc_id,
                 round(CAST(SUM(CAST(round(s, 9) AS DECIMAL(18,9))) AS DOUBLE)
                       / count(*), 6) AS mean_surprisal
          FROM per GROUP BY doc_id),
        wg AS (
          SELECT d.doc_id, d.source, scored.mean_surprisal
          FROM documents d JOIN scored ON d.doc_id = scored.doc_id),
        cuts AS (
          SELECT source,
                 ss[(len(ss) + 2) // 3] AS c1,
                 ss[(len(ss) * 2 + 2) // 3] AS c2
          FROM (SELECT source, list_sort(list(mean_surprisal)) AS ss
                FROM wg GROUP BY source))
        SELECT wg.doc_id, wg.source, wg.mean_surprisal,
               CASE WHEN wg.mean_surprisal <= cuts.c1 THEN 'head'
                    WHEN wg.mean_surprisal <= cuts.c2 THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM wg JOIN cuts USING (source)
        ORDER BY doc_id
"""

# PCA fit verdict (r6): the quantization floor(x * 2^20) is exact in
# both engines (float32->double exact, power-of-two scale exact), so
# the integer arms replay bit-for-bit; the eigensolver booleans are
# Spark-asserted and expected TRUE (agg_approx_stats discipline).
ORACLES["pca_variance_report_embeddings"] = r"""
        WITH q AS (
          SELECT CAST(floor(CAST(e AS DOUBLE) * 1048576) AS BIGINT) AS qv
          FROM (SELECT unnest(embedding) AS e
                FROM embeddings WHERE embedding IS NOT NULL))
        SELECT CAST((SELECT count(*) FROM embeddings
                     WHERE embedding IS NOT NULL) AS BIGINT) AS n_vecs,
               CAST(8 AS INTEGER) AS k,
               CAST(SUM(qv) AS BIGINT) AS sum_q,
               CAST(SUM(qv * qv) AS BIGINT) AS sum_sq_q,
               TRUE AS orthonormal,
               TRUE AS evr_valid
        FROM q
"""

# PCA + exact-cosine rerank recall verdict (r6): the query-id set and
# the per-query result count are exact SQL arms; the recall boolean is
# Spark-asserted (expected TRUE — agg_approx_stats discipline).
ORACLES["ann_pca_rerank_recall_embeddings"] = r"""
        SELECT vec_id AS query_id,
               CAST(10 AS BIGINT) AS n_results,
               TRUE AS recall_ok
        FROM embeddings
        WHERE vec_id % 101 = 0 AND embedding IS NOT NULL
        ORDER BY query_id
"""


def _bpe_chain_ctes(n_merges: int = 8) -> list:
    """The BPE training CTE chain (r6): merge application is a literal
    string replace over \\x1f-delimited symbol streams — Spark and
    DuckDB implement identical left-to-right non-overlapping replace
    semantics, so a fixed chain of (pairs → best → replace) CTEs
    reproduces training bit-for-bit. Generated programmatically: one
    CTE triple per merge rank. The word rides the chain so the apply
    oracle can read the final segmentation per word."""
    sep = "chr(31)"
    ctes = [
        r"""wc AS (
          SELECT w AS word, count(*) AS cnt
          FROM (SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '')) AS w
                FROM documents WHERE trim(coalesce(text, '')) <> '')
          WHERE w <> '' AND NOT contains(w, chr(31))
          GROUP BY w)""",
        rf"""s0 AS (
          SELECT word,
                 regexp_replace(word, '(.)', {sep} || '\1' || {sep}, 'g') AS s,
                 cnt
          FROM wc)""",
    ]
    for r in range(1, n_merges + 1):
        prev = f"s{r - 1}"
        ctes.append(
            f"""p{r} AS (
          SELECT g.a AS a, g.b AS b, cnt FROM (
            SELECT unnest(list_transform(
                     generate_series(1, greatest(len(sy) - 1, 0)),
                     i -> {{'a': sy[i], 'b': sy[i+1]}})) AS g, cnt
            FROM (SELECT string_split(trim(s, {sep}), {sep} || {sep}) AS sy,
                         cnt
                  FROM {prev})))"""
        )
        ctes.append(
            f"""b{r} AS (
          SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS n
          FROM p{r} GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1)"""
        )
        ctes.append(
            f"""s{r} AS (
          SELECT word,
                 replace(s, {sep} || a || {sep} || {sep} || b || {sep},
                         {sep} || a || b || {sep}) AS s, cnt
          FROM {prev}, b{r})"""
        )
    return ctes


def _bpe_train_oracle(n_merges: int = 8) -> str:
    unions = "\n          UNION ALL ".join(
        f"""SELECT CAST({r} AS INTEGER) AS rank, a AS "left", b AS "right",
                 a || b AS merged, n AS n_occurrences FROM b{r}"""
        for r in range(1, n_merges + 1)
    )
    return (
        "        WITH "
        + ",\n        ".join(_bpe_chain_ctes(n_merges))
        + f"\n        SELECT * FROM ({unions})\n        ORDER BY rank"
    )


def _bpe_apply_oracle(n_merges: int = 8) -> str:
    """Train-then-apply (r6): the same chain, then per-word symbol
    counts re-attached to documents by word; unsegmentable words
    (separator byte) fall back to 1 symbol; empty/NULL-text docs emit
    0 — operand-for-operand the Spark bpe_apply plan."""
    sep = "chr(31)"
    tail = rf"""seg AS (
          SELECT word,
                 len(string_split(trim(s, {sep}), {sep} || {sep})) AS nsym
          FROM s{n_merges}),
        tok AS (
          SELECT doc_id, w AS word
          FROM (SELECT doc_id,
                       unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '')) AS w
                FROM documents WHERE trim(coalesce(text, '')) <> '')
          WHERE w <> ''),
        per AS (
          SELECT doc_id, count(*) AS n_words,
                 CAST(SUM(coalesce(nsym, 1)) AS BIGINT) AS n_bpe
          FROM tok LEFT JOIN seg USING (word) GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(per.n_words, 0) AS BIGINT) AS n_words,
               CAST(coalesce(per.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        ORDER BY d.doc_id"""
    return (
        "        WITH "
        + ",\n        ".join(_bpe_chain_ctes(n_merges))
        + ",\n        "
        + tail
    )


ORACLES["bpe_learned_merges"] = _bpe_train_oracle(8)
ORACLES["bpe_token_counts"] = _bpe_apply_oracle(8)

# r7: the first driver-graded STREAMING row. A static parquet source
# drained via Trigger.AvailableNow must equal batch semantics, so the
# oracle is the plain batch explode+count (tokenize = the shared
# _clean_split contract: trim → \s+ split → drop '' boundaries).
ORACLES["streaming_vocab_counts"] = r"""
        SELECT w AS token, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM (
          SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                        x -> x <> '')) AS w
          FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
        )
        GROUP BY w HAVING count(*) >= 3
        ORDER BY token
"""

# r7: compression-band report — the oracle recomputes the banding /
# keep-gate / per-(source, band) aggregation from the PINNED zlib
# literals (queries.COMPRESSION_FIXTURE; DEFLATE itself is not
# SQL-expressible, so the codec outputs are literal-pinned and pytest
# re-derives them from live zlib). Ratio convention matches
# compression_signals: n_bytes = 0 → ratio 0.0.
from lovdata_pipeline_spark.queries import COMPRESSION_FIXTURE as _CFIX

ORACLES["compression_band_report"] = (
    """
        WITH fix(doc_id, source, n_bytes, n_compressed) AS (VALUES
          """
    + ",\n          ".join(
        f"({i}, '{s}', {nb}, {nc})" for i, s, nb, nc in _CFIX
    )
    + """),
        sig AS (
          SELECT doc_id, source, n_bytes,
                 CASE WHEN n_bytes = 0 THEN 0.0
                      ELSE CAST(n_compressed AS DOUBLE) / n_bytes END AS ratio
          FROM fix)
        SELECT source,
               CAST(least(greatest(floor(ratio * 10), 0), 11) AS INTEGER) AS band,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN ratio >= 0.30 AND ratio <= 0.95
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
               round(min(ratio), 6) AS min_ratio,
               round(max(ratio), 6) AS max_ratio,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        FROM sig
        GROUP BY source, band
        ORDER BY source, band
"""
)

# r7: canonical dedup survivor by QUALITY — exact window replay of
# fingerprint (normalized-text md5), the composite quality score, and
# the (quality desc, doc_id asc) winner per fingerprint group.
ORACLES["dedup_keep_best_quality"] = f"""
        WITH f AS (
          SELECT doc_id,
                 md5(coalesce({_NORMALIZED_TEXT}, '')) AS fingerprint,
                 {_QUALITY_EXPRS}
          FROM documents),
        q AS (
          SELECT doc_id, fingerprint,
                 round(greatest(least(
                   1.0
                   - (CASE WHEN nw < 10 THEN 0.5 WHEN nw > 100000 THEN 0.5 ELSE 0.0 END)
                   - least(punct / nc * 2, 0.3)
                   - least(digits / nc * 2, 0.3)
                   - least(uppers / nc, 0.2)
                 , 1.0), 0.0), 6) AS quality
          FROM f),
        r AS (
          SELECT doc_id, fingerprint, quality,
                 row_number() OVER (PARTITION BY fingerprint
                                    ORDER BY quality DESC, doc_id) AS rk
          FROM q)
        SELECT doc_id, fingerprint, quality
        FROM r WHERE rk = 1 ORDER BY doc_id
"""

# r7: the persisted-index IVF query is result-identical to ann_topk_ivf
# (same portable seeds, probe choice, in-cell cosine) — the index is a
# LAYOUT (parquet partitioned by cell), not a different algorithm, so
# the oracle is reused verbatim.
ORACLES["ann_topk_ivf_index"] = ORACLES["ann_topk_ivf"]


def _clf_train_oracle(iterations: int = 3, n_buckets: int = 32,
                      lr: str = "0.125") -> str:
    """Exact SQL replay of textstats.train_text_classifier: the hashed
    feature build (bucket = hash60(md5(w ‖ seed)) % k, + bias bucket k),
    then per-iteration CTEs — per-doc integer logit numerator, sigmoid
    quantized to round(p·10^9) (positive domain: DuckDB's half-away ==
    Spark's HALF_UP), exact integer gradient numerators, and the
    floor-based quantized-weight update in the SAME double evaluation
    order as the driver loop."""
    wscale = "16777216.0"  # 2^24
    pscale = "1000000000"  # 10^9
    ctes = [
        f"""x AS (
          SELECT doc_id, y, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT doc_id, CAST(coalesce(lang = 'en', FALSE) AS BIGINT) AS y,
                   CAST(CAST(concat('0x', substr(md5(w || 'clf-v1'), 1, 15)) AS UBIGINT) AS BIGINT) % {n_buckets} AS b
            FROM (SELECT doc_id, lang,
                         unnest(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'), t -> t <> '')) AS w
                  FROM documents))
          GROUP BY doc_id, y, b
          UNION ALL
          SELECT doc_id, CAST(coalesce(lang = 'en', FALSE) AS BIGINT), {n_buckets}, 1 FROM documents)""",
        "nn AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM x)",
        f"w0(b, wq) AS (SELECT CAST(r.range AS INTEGER), CAST(0 AS BIGINT) FROM range({n_buckets + 1}) r)",
    ]
    for t in range(1, iterations + 1):
        p, c = t - 1, t
        ctes.append(
            f"""pd{c} AS (
          SELECT x.doc_id, x.y, SUM(w{p}.wq * x.cnt) AS num
          FROM x JOIN w{p} USING (b) GROUP BY x.doc_id, x.y)"""
        )
        ctes.append(
            f"""pq{c} AS (
          SELECT doc_id,
                 CAST(round({pscale}.0 / (1.0 + exp(-(CAST(num AS DOUBLE) / {wscale})))) AS BIGINT) AS pq
          FROM pd{c})"""
        )
        ctes.append(
            f"""g{c} AS (
          SELECT x.b, SUM((pq{c}.pq - x.y * {pscale}) * x.cnt) AS g
          FROM x JOIN pq{c} USING (doc_id) GROUP BY x.b)"""
        )
        ctes.append(
            f"""w{c} AS (
          SELECT w{p}.b,
                 w{p}.wq - CAST(floor({lr} * CAST(coalesce(g{c}.g, 0) AS DOUBLE) * {wscale} / (nn.nd * {pscale}.0)) AS BIGINT) AS wq
          FROM w{p} LEFT JOIN g{c} USING (b) CROSS JOIN nn)"""
        )
    return (
        "        WITH "
        + ",\n        ".join(ctes)
        + f"""
        SELECT b AS bucket, wq AS weight_q,
               CAST(wq AS DOUBLE) / {wscale} AS weight
        FROM w{iterations} ORDER BY bucket"""
    )


ORACLES["train_quality_classifier_documents"] = _clf_train_oracle(3, 32)

# r7: incremental minhash dedup — the exact cross-split Jaccard pairs
# (batch = doc_id % 5 == 0 vs history = the rest). Reuses the shared
# shingle/jaccard body; banding recall ≈ 1 at 16×2 / 0.8 makes the
# store-probed Spark result equal the exact set (the dedup_minhash_lsh
# argument, now across a persisted store boundary).
ORACLES["dedup_incremental_minhash"] = f"""
        WITH {_SHINGLE_BODY}
        SELECT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS new_id,
               CASE WHEN doc_a % 5 = 0 THEN doc_b ELSE doc_a END AS hist_id,
               jaccard
        FROM jac
        WHERE jv >= 0.8 AND ((doc_a % 5 = 0) <> (doc_b % 5 = 0))
        ORDER BY new_id, hist_id
"""

# r7b: sequential conversion funnel — each stage's min-ts is gated
# strictly after the user's previous stage (a click before the first
# view must not convert). Counts are exact integers; rates and the mean
# latency are double divisions over exact integer/DECIMAL inputs,
# rounded 6 dp, NULL on zero denominators — the registry discipline.
ORACLES["events_funnel_counts"] = """
        WITH tv AS (
          SELECT user_id, min(ts) AS t_view
          FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        tc AS (
          SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN tv USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > tv.t_view
          GROUP BY e.user_id
        ),
        tp AS (
          SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN tc USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > tc.t_click
          GROUP BY e.user_id
        ),
        f AS (
          SELECT tv.user_id, tv.t_view, tc.t_click, tp.t_purchase
          FROM tv LEFT JOIN tc USING (user_id) LEFT JOIN tp USING (user_id)
        ),
        a AS (
          SELECT count(*) AS n_view_users,
                 count(t_click) AS n_click_users,
                 count(t_purchase) AS n_purchase_users,
                 SUM(CAST(epoch(t_purchase) - epoch(t_view) AS DECIMAL(18,6)))
                   AS lat_sum
          FROM f
        )
        SELECT n_view_users, n_click_users, n_purchase_users,
               CASE WHEN n_view_users = 0 THEN NULL
                    ELSE round(CAST(n_click_users AS DOUBLE) / n_view_users, 6)
               END AS conv_view_click,
               CASE WHEN n_click_users = 0 THEN NULL
                    ELSE round(CAST(n_purchase_users AS DOUBLE) / n_click_users, 6)
               END AS conv_click_purchase,
               CASE WHEN n_view_users = 0 THEN NULL
                    ELSE round(CAST(n_purchase_users AS DOUBLE) / n_view_users, 6)
               END AS conv_view_purchase,
               CASE WHEN n_purchase_users = 0 THEN NULL
                    ELSE round(CAST(lat_sum AS DOUBLE) / n_purchase_users, 6)
               END AS mean_view_to_purchase_s
        FROM a
"""

# r7b: margin-based bitext mining — the same cosine/6-dp/id-tie
# discipline as the knn oracles; neighborhood sums in DECIMAL(18,6);
# the margin's operand order (sum/cnt + sum/cnt) / 2 then score/denom
# mirrors the Spark columns exactly. The Spark side's two-phase top-k
# and broadcast cross join are physical details.
ORACLES["bitext_mine_margin"] = f"""
        WITH langed AS (
          SELECT e.vec_id, e.embedding, d.lang
          FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        ),
        sa AS (
          SELECT vec_id AS src_id, embedding FROM langed
          WHERE lang = 'en'
            AND sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0
        ),
        ta AS (
          SELECT vec_id AS tgt_id, embedding FROM langed
          WHERE lang = 'zh'
            AND sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0
        ),
        sc AS (
          SELECT a.src_id, b.tgt_id, round({_COSINE}, 6) AS score
          FROM sa a CROSS JOIN ta b
        ),
        sk AS (
          SELECT src_id, SUM(CAST(score AS DECIMAL(18,6))) AS ssum,
                 count(*) AS scnt
          FROM (SELECT src_id, score, row_number() OVER (
                  PARTITION BY src_id ORDER BY score DESC, tgt_id) AS rk
                FROM sc)
          WHERE rk <= 4 GROUP BY src_id
        ),
        tk AS (
          SELECT tgt_id, SUM(CAST(score AS DECIMAL(18,6))) AS tsum,
                 count(*) AS tcnt
          FROM (SELECT tgt_id, score, row_number() OVER (
                  PARTITION BY tgt_id ORDER BY score DESC, src_id) AS rk
                FROM sc)
          WHERE rk <= 4 GROUP BY tgt_id
        ),
        m AS (
          SELECT sc.src_id, sc.tgt_id, sc.score,
                 (CAST(sk.ssum AS DOUBLE) / sk.scnt
                  + CAST(tk.tsum AS DOUBLE) / tk.tcnt) / 2.0 AS denom
          FROM sc JOIN sk USING (src_id) JOIN tk USING (tgt_id)
        ),
        mm AS (
          SELECT src_id, tgt_id, score, round(score / denom, 6) AS margin
          FROM m WHERE denom > 0
        ),
        r AS (
          SELECT src_id, tgt_id, score, margin,
                 CAST(row_number() OVER (
                   PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS INTEGER) AS rk
          FROM mm
        )
        SELECT src_id, tgt_id, score, margin
        FROM r WHERE rk = 1 AND margin >= 1.0
        ORDER BY src_id
"""

def _bitext_bucketed_sql() -> str:
    """Exact oracle for the 'approximate' SRP-pre-bucketed bitext mining
    (r9 — the _ann_lsh_sql move applied to the bitext scale path): the
    seed-42 planes are FIXED (ceil(log2(16)) = 4 planes over 64 dims —
    the identical draw sequence queries/_srp_bits makes), so bucket
    bits, the source side's own-plus-1-bit-flip probe set, the bucket
    equi-join, and the neighborhood/margin/forward-max machinery over
    the RESTRICTED pair set are all deterministic and SQL-expressible.
    Plane literals inline via repr (shortest round-trip); sign-of-dot
    is a sequential fold in both engines (the proven
    ann_topk_lsh_bucketed parity). Every target lives in exactly one
    bucket, so the probe join cannot duplicate a pair."""
    import numpy as np

    planes = np.random.RandomState(42).randn(4, 64)

    def arr(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    def bits(col):
        return " || ".join(
            f"(CASE WHEN list_dot_product({col}::DOUBLE[], {arr(planes[i])}) >= 0 "
            f"THEN '1' ELSE '0' END)"
            for i in range(4)
        )

    return f"""
        WITH langed AS (
          SELECT e.vec_id, e.embedding, d.lang
          FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        ),
        sa AS (
          SELECT vec_id AS src_id, embedding, {bits('embedding')} AS sig
          FROM langed
          WHERE lang = 'en'
            AND sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0
        ),
        ta AS (
          SELECT vec_id AS tgt_id, embedding, {bits('embedding')} AS sig
          FROM langed
          WHERE lang = 'zh'
            AND sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) > 0
        ),
        probes AS (
          SELECT src_id, embedding,
                 CASE WHEN i = 0 THEN sig
                      ELSE substr(sig, 1, i - 1)
                           || (CASE WHEN substr(sig, i, 1) = '1'
                                    THEN '0' ELSE '1' END)
                           || substr(sig, i + 1)
                 END AS psig
          FROM sa CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS i)
        ),
        sc AS (
          SELECT a.src_id, b.tgt_id, round({_COSINE}, 6) AS score
          FROM probes a JOIN ta b ON b.sig = a.psig
        ),
        sk AS (
          SELECT src_id, SUM(CAST(score AS DECIMAL(18,6))) AS ssum,
                 count(*) AS scnt
          FROM (SELECT src_id, score, row_number() OVER (
                  PARTITION BY src_id ORDER BY score DESC, tgt_id) AS rk
                FROM sc)
          WHERE rk <= 4 GROUP BY src_id
        ),
        tk AS (
          SELECT tgt_id, SUM(CAST(score AS DECIMAL(18,6))) AS tsum,
                 count(*) AS tcnt
          FROM (SELECT tgt_id, score, row_number() OVER (
                  PARTITION BY tgt_id ORDER BY score DESC, src_id) AS rk
                FROM sc)
          WHERE rk <= 4 GROUP BY tgt_id
        ),
        m AS (
          SELECT sc.src_id, sc.tgt_id, sc.score,
                 (CAST(sk.ssum AS DOUBLE) / sk.scnt
                  + CAST(tk.tsum AS DOUBLE) / tk.tcnt) / 2.0 AS denom
          FROM sc JOIN sk USING (src_id) JOIN tk USING (tgt_id)
        ),
        mm AS (
          SELECT src_id, tgt_id, score, round(score / denom, 6) AS margin
          FROM m WHERE denom > 0
        ),
        r AS (
          SELECT src_id, tgt_id, score, margin,
                 CAST(row_number() OVER (
                   PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS INTEGER) AS rk
          FROM mm
        )
        SELECT src_id, tgt_id, score, margin
        FROM r WHERE rk = 1 AND margin >= 1.0
        ORDER BY src_id
"""


try:  # same numpy gate as ann_topk_lsh_bucketed: without numpy the
    # entry is absent and the driver records its rows-only fallback.
    ORACLES["bitext_mine_margin_bucketed"] = _bitext_bucketed_sql()
except ImportError:  # pragma: no cover - numpy is present here
    pass


# r7b: exact-count stratified split — within-stratum md5 rank (id
# unique => order total), integer thresholds n*pct div 100. The Spark
# side's two-phase prefix-sum rank is a physical detail; the oracle's
# per-stratum window is the semantic definition.
ORACLES["stratified_split_exact"] = """
        WITH k AS (
          SELECT doc_id, source,
                 md5(CAST(doc_id AS VARCHAR) || 'split-v1') AS h
          FROM documents
        ),
        r AS (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY coalesce(source, '') ORDER BY h) - 1 AS rn,
                 count(*) OVER (
                   PARTITION BY coalesce(source, '')) AS n
          FROM k
        )
        SELECT doc_id, source,
               CASE WHEN rn < n * 80 // 100 THEN 'train'
                    WHEN rn < n * 90 // 100 THEN 'val'
                    ELSE 'test' END AS split
        FROM r ORDER BY doc_id
"""

# r7b: multi-signal quality blend — the gopher word/alpha/mean-len
# expressions (same SQL as the graded gopher oracle), the EN stopword
# fraction, and ln(1+n) size prior, each rounded 6 dp BEFORE the
# per-source min/max; normalization and the fixed-weight sum mirror
# the Spark operand order exactly; source-constant signals pin 0.5.
ORACLES["quality_blend_documents"] = rf"""
        WITH d AS (SELECT doc_id, source, coalesce(text, '') AS text FROM documents),
        w AS (
          SELECT doc_id, source,
                 CASE WHEN trim(text) = '' THEN []
                      ELSE list_filter(string_split_regex(trim(text), '\s+'), sw -> sw <> '') END AS words,
                 list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS lwords
          FROM d),
        m AS (
          SELECT doc_id, source, coalesce(source, '') AS grp,
                 round(CAST(len(list_filter(lwords,
                       x -> list_contains({_STOPWORDS_SQL["en"]}, x))) AS DOUBLE)
                       / greatest(len(lwords), 1), 6) AS s_stop,
                 round(CASE WHEN len(words) = 0 THEN 0.0
                       ELSE CAST(len(list_filter(words,
                              x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                            / len(words) END, 6) AS s_alpha,
                 round(-abs((CASE WHEN len(words) = 0 THEN 0.0
                       ELSE CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE)
                            / len(words) END) - 5.0), 6) AS s_len,
                 round(ln(1.0 + len(words)), 6) AS s_size
          FROM w),
        g AS (
          SELECT grp,
                 min(s_stop) AS mn1, max(s_stop) AS mx1,
                 min(s_alpha) AS mn2, max(s_alpha) AS mx2,
                 min(s_len) AS mn3, max(s_len) AS mx3,
                 min(s_size) AS mn4, max(s_size) AS mx4
          FROM m GROUP BY grp),
        b AS (
          -- integer micro-unit blend (r10): floor(x*1e6 + 0.5) replaces
          -- round(x, 6) — the weighted sum of 6-dp-quantized norms sits
          -- on the 2e-7 grid where exact half-way points make Spark's
          -- HALF_UP and DuckDB's double round() disagree (5/50k rows at
          -- sf1); floor on identical doubles is engine-independent and
          -- the weighted sum is an exact BIGINT
          SELECT m.doc_id, m.source,
                 4 * (CASE WHEN mx1 > mn1 THEN CAST(floor((s_stop - mn1) / (mx1 - mn1) * 1000000.0 + 0.5) AS BIGINT) ELSE 500000 END)
               + 2 * (CASE WHEN mx2 > mn2 THEN CAST(floor((s_alpha - mn2) / (mx2 - mn2) * 1000000.0 + 0.5) AS BIGINT) ELSE 500000 END)
               + 2 * (CASE WHEN mx3 > mn3 THEN CAST(floor((s_len - mn3) / (mx3 - mn3) * 1000000.0 + 0.5) AS BIGINT) ELSE 500000 END)
               + 2 * (CASE WHEN mx4 > mn4 THEN CAST(floor((s_size - mn4) / (mx4 - mn4) * 1000000.0 + 0.5) AS BIGINT) ELSE 500000 END)
                   AS blend_q
          FROM m JOIN g USING (grp))
        SELECT doc_id, source, blend_q / 10000000.0 AS blend_score,
               CASE WHEN blend_q >= 6600000 THEN 'high'
                    WHEN blend_q >= 3300000 THEN 'medium'
                    ELSE 'low' END AS quality_band
        FROM b ORDER BY doc_id
"""

# r7b: Kneser-Ney bigram surprisal — same pair explode and fixed-point
# accumulation as the graded bigram oracle; ctx/N1+ fan-outs and the
# distinct-bigram-type total B from the bigram-type frame; the
# interpolated probability's operand order mirrors the Spark columns.
ORACLES["text_kn_surprisal"] = r"""
        WITH tok AS (
          SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '') AS w
          FROM documents),
        pairs0 AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                       i -> {'w1': w[i], 'w2': w[i+1]})) AS g
          FROM tok),
        pairs AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM pairs0),
        bc AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
        cx AS (SELECT w1, SUM(c12) AS ctx, count(*) AS n1f FROM bc GROUP BY w1),
        nb AS (SELECT w2, count(*) AS n1b FROM bc GROUP BY w2),
        bt AS (SELECT count(*) AS B FROM bc),
        per AS (
          SELECT p.doc_id,
                 -ln((c12 - 0.75) / ctx + 0.75 * n1f / ctx * (CAST(n1b AS DOUBLE) / B)) AS s
          FROM pairs p JOIN bc USING (w1, w2) JOIN cx USING (w1)
               JOIN nb USING (w2) CROSS JOIN bt)
        SELECT doc_id,
               count(*) AS n_bigrams,
               round(CAST(SUM(CAST(round(s, 9) AS DECIMAL(18,9))) AS DOUBLE)
                     / count(*), 6) AS mean_kn_surprisal
        FROM per GROUP BY doc_id ORDER BY doc_id
"""

# r8: trigram Kneser–Ney — same tokenize + fixed-point accumulation as
# the graded bigram KN oracle, one order up: the model tables are the
# trigram-type frame's fan-outs (ctx12/n1f12 per prefix, n1mid distinct-
# w1 continuations per (w2,w3), ctx2/n1f2/n1uni/B2 from the mid table);
# the interpolated probability's operand order mirrors the Spark
# columns exactly, term by term.
ORACLES["text_kn_trigram_surprisal"] = r"""
        WITH tok AS (
          SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), sw -> sw <> '') AS w
          FROM documents),
        tris0 AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                                       i -> {'w1': w[i], 'w2': w[i+1], 'w3': w[i+2]})) AS g
          FROM tok),
        tris AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM tris0),
        tc AS (SELECT w1, w2, w3, count(*) AS c123 FROM tris GROUP BY w1, w2, w3),
        -- every fan-out is a window over the trigram-TYPE table (one
        -- row per distinct (w1,w2,w3), so COUNT(*) per (w2,w3) IS the
        -- distinct-w1 continuation count; COUNT(*) per w2 IS the
        -- Σ_w3 n1mid mass) — the 5-way join-chain formulation sent
        -- DuckDB's join-order optimizer into a multi-minute plan
        scored AS (
          SELECT w1, w2, w3, c123,
                 SUM(c123)  OVER (PARTITION BY w1, w2) AS ctx12,
                 COUNT(*)   OVER (PARTITION BY w1, w2) AS n1f12,
                 COUNT(*)   OVER (PARTITION BY w2, w3) AS n1mid,
                 COUNT(*)   OVER (PARTITION BY w2)     AS ctx2,
                 COUNT(DISTINCT w3) OVER (PARTITION BY w2) AS n1f2,
                 COUNT(DISTINCT w2) OVER (PARTITION BY w3) AS n1uni
          FROM tc),
        bt AS (SELECT count(*) AS B2 FROM (SELECT DISTINCT w2, w3 FROM tc)),
        per AS (
          SELECT t.doc_id,
                 -ln((c123 - 0.75) / ctx12
                     + 0.75 * n1f12 / ctx12
                       * ((n1mid - 0.75) / ctx2
                          + 0.75 * n1f2 / ctx2 * (CAST(n1uni AS DOUBLE) / B2))) AS s
          FROM tris t JOIN scored USING (w1, w2, w3) CROSS JOIN bt)
        SELECT doc_id,
               count(*) AS n_trigrams,
               round(CAST(SUM(CAST(round(s, 9) AS DECIMAL(18,9))) AS DOUBLE)
                     / count(*), 6) AS mean_kn3_surprisal
        FROM per GROUP BY doc_id ORDER BY doc_id
"""

# r7b: streaming session windows — gaps-and-islands with the
# session_window boundary rule (an event at EXACTLY last_ts+gap still
# merges — the boundary is inclusive, pinned by test; new session only
# when gap > 30 min, the same rule as batch sessionize), session_end =
# last event + gap. Complete-mode availableNow drain == batch.
ORACLES["streaming_session_counts"] = """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                        OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                      THEN 1 ELSE 0 END AS ns
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, ts,
                 SUM(ns) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM g
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, session_start
"""

# r9: the append-mode (production) session-window drain. The sentinel
# heartbeat pushes the watermark past every real session end, so the
# emitted append rows must equal the COMPLETE session table — the same
# gaps-and-islands replay as streaming_session_counts (inclusive
# boundary: new session only when gap > 1800 s; session_end = last
# event + gap). The sentinel user (−999) never reaches the output: its
# own session is the one the watermark hasn't passed.
ORACLES["streaming_session_append_counts"] = """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                        OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                      THEN 1 ELSE 0 END AS ns
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, ts,
                 SUM(ns) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM g
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, session_start
"""

# r7b: weekly retention cohorts — Monday-start week truncation in both
# engines; offsets are exact integer day-diffs div 7 (both weeks are
# truncated starts, so the division is always whole); retention rate
# divides by the cohort's own offset-0 cell.
ORACLES["events_retention_cohorts"] = """
        WITH f AS (
          SELECT user_id,
                 date_trunc('week', min(ts)) AS cohort_week
          FROM events GROUP BY user_id
        ),
        a AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS w
          FROM events
        ),
        c AS (
          SELECT cohort_week,
                 CAST(datediff('day', cohort_week, w) // 7 AS INTEGER)
                   AS week_offset,
                 count(*) AS n_active
          FROM a JOIN f USING (user_id)
          GROUP BY cohort_week, week_offset
        ),
        s AS (
          SELECT cohort_week, n_active AS cohort_size
          FROM c WHERE week_offset = 0
        )
        SELECT c.cohort_week, c.week_offset, c.n_active,
               round(CAST(c.n_active AS DOUBLE) / s.cohort_size, 6)
                 AS retention
        FROM c JOIN s USING (cohort_week)
        ORDER BY cohort_week, week_offset
"""

# r7c: per-source Zipf slope — integer frequencies, floor-quantized
# 6-dp log coordinates, exact int64 normal equations (bounds proven in
# operators/corpstats.py), one double division at the end.
ORACLES["zipf_slope_by_source"] = r"""
        WITH tok AS (
          SELECT source,
                 unnest(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\s+'), sw -> sw <> '')) AS term
          FROM documents),
        tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS freq
               FROM tok GROUP BY source, term),
        rkd AS (
          SELECT source, term, freq,
                 row_number() OVER (PARTITION BY source ORDER BY freq DESC, term) AS rk
          FROM tf),
        pts AS (
          SELECT source,
                 CAST(floor(ln(rk) * 1000000) AS BIGINT) AS x,
                 CAST(floor(ln(freq) * 1000000) AS BIGINT) AS y
          FROM rkd WHERE rk <= 100),
        a AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM pts GROUP BY source)
        SELECT source, n_terms,
               CASE WHEN (n_terms * sxx - sx * sx) > 0
                    THEN round(CAST(n_terms * sxy - sx * sy AS DOUBLE)
                               / CAST(n_terms * sxx - sx * sx AS DOUBLE), 6)
               END AS zipf_slope
        FROM a ORDER BY source
"""

# r7c: top-50 bigram collocations by PMI — exact integer counts, the
# single fixed double-expression tree ln((cb/Tb)/((c1/Tu)(c2/Tu)))
# mirrored operand-for-operand from operators/corpstats.py.
ORACLES["collocation_pmi_bigrams"] = r"""
        WITH t AS (
          SELECT list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\s+'), sw -> sw <> '') AS w
          FROM documents),
        uc AS (SELECT u AS term, CAST(count(*) AS BIGINT) AS cu
               FROM (SELECT unnest(w) AS u FROM t) GROUP BY u),
        bg AS (
          SELECT unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                       i -> {'w1': w[i], 'w2': w[i+1]})) AS g
          FROM t),
        bc AS (SELECT g.w1 AS w1, g.w2 AS w2, CAST(count(*) AS BIGINT) AS cb
               FROM bg GROUP BY 1, 2),
        tu AS (SELECT CAST(sum(cu) AS BIGINT) AS tu FROM uc),
        tb AS (SELECT CAST(sum(cb) AS BIGINT) AS tb FROM bc)
        SELECT b.w1, b.w2, b.cb AS n_pair,
               round(ln((CAST(b.cb AS DOUBLE) / tb.tb)
                        / ((CAST(u1.cu AS DOUBLE) / tu.tu)
                           * (CAST(u2.cu AS DOUBLE) / tu.tu))), 6) AS pmi
        FROM bc b
        JOIN uc u1 ON u1.term = b.w1
        JOIN uc u2 ON u2.term = b.w2
        CROSS JOIN tu CROSS JOIN tb
        WHERE b.cb >= 5
        ORDER BY pmi DESC, b.w1, b.w2
        LIMIT 50
"""

# r7c: PageRank over the exact 3-NN cosine graph, 3 damped power
# iterations unrolled as CTEs. All arithmetic is integer (micro-unit
# ranks, // contributions, (15·base + 85·S) // 100 mixing) so every
# rank matches operators/graph.py bit-for-bit.
ORACLES["pagerank_doc_graph"] = f"""
        WITH v AS (
          SELECT vec_id, embedding FROM embeddings
          WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
        sc AS (
          SELECT a.vec_id AS src, b.vec_id AS dst, round({_COSINE}, 6) AS score
          FROM v a JOIN v b ON a.vec_id <> b.vec_id),
        ed AS (
          SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rk
            FROM sc) WHERE rk <= 3),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS odeg FROM ed GROUP BY src),
        nodes AS (SELECT DISTINCT node FROM (
            SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        bs AS (SELECT 1000000000000 // n AS base FROM nn),
        ew AS (SELECT e.src, e.dst, d.odeg FROM ed e JOIN deg d USING (src)),
        r0 AS (SELECT node, base AS r FROM nodes CROSS JOIN bs),
        s1 AS (SELECT e.dst AS node, SUM(r.r // e.odeg) AS s
               FROM ew e JOIN r0 r ON r.node = e.src GROUP BY e.dst),
        r1 AS (SELECT nd.node, (15 * b.base + 85 * COALESCE(s.s, 0)) // 100 AS r
               FROM nodes nd CROSS JOIN bs b LEFT JOIN s1 s ON s.node = nd.node),
        s2 AS (SELECT e.dst AS node, SUM(r.r // e.odeg) AS s
               FROM ew e JOIN r1 r ON r.node = e.src GROUP BY e.dst),
        r2 AS (SELECT nd.node, (15 * b.base + 85 * COALESCE(s.s, 0)) // 100 AS r
               FROM nodes nd CROSS JOIN bs b LEFT JOIN s2 s ON s.node = nd.node),
        s3 AS (SELECT e.dst AS node, SUM(r.r // e.odeg) AS s
               FROM ew e JOIN r2 r ON r.node = e.src GROUP BY e.dst),
        r3 AS (SELECT nd.node, (15 * b.base + 85 * COALESCE(s.s, 0)) // 100 AS r
               FROM nodes nd CROSS JOIN bs b LEFT JOIN s3 s ON s.node = nd.node)
        SELECT node AS vec_id, CAST(r AS BIGINT) AS rank_q
        FROM r3 ORDER BY rank_q DESC, vec_id LIMIT 20
"""

# r7c: SCD2 change-history intervals over the event log — gaps-and-
# islands via two same-sort row_numbers, per-user lead over islands.
ORACLES["scd2_user_event_intervals"] = """
        WITH i AS (
          SELECT user_id, event_type, ts, event_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS grp
          FROM events),
        -- first_tie = event_id of the island's chronologically FIRST
        -- event in (ts, event_id) order (mirrors Spark's
        -- min_by(tie, struct(ts, tie))), NOT min(event_id) over the
        -- island — min() could inherit a smaller id from a later tied
        -- event and interleave islands wrongly in the lead() ordering.
        it AS (
          SELECT *, first_value(event_id) OVER (
                   PARTITION BY user_id, event_type, grp
                   ORDER BY ts, event_id) AS ft
          FROM i),
        isl AS (
          SELECT user_id, event_type, grp,
                 min(ts) AS valid_from,
                 min(ft) AS first_tie,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM it GROUP BY user_id, event_type, grp),
        iv AS (
          SELECT user_id, event_type, valid_from,
                 lead(valid_from) OVER (
                   PARTITION BY user_id ORDER BY valid_from, first_tie) AS valid_to,
                 first_tie, n_events
          FROM isl)
        SELECT user_id, event_type, valid_from, valid_to, first_tie, n_events,
               (valid_to IS NULL) AS is_current
        FROM iv ORDER BY user_id, valid_from, first_tie
"""

# r7c: sequential curation-gate attrition funnel. The gopher and
# quality-keep expressions are the standalone oracles' fragments
# verbatim (text_gopher_quality / curation_report_by_source), counted
# once under each cumulative gate.
ORACLES["filter_attrition_report"] = r"""
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'), sw -> sw <> '') AS words,
                 list_filter(list_transform(string_split_regex(coalesce(text, ''), '\r?\n'),
                                            x -> trim(x)), x -> x <> '') AS lines
          FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(len(words) AS BIGINT) AS nw,
                 CASE WHEN len(words) = 0 THEN 0.0
                      ELSE CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE)
                           / len(words) END AS mwl,
                 CASE WHEN len(words) = 0 THEN 0.0
                      ELSE CAST(len(list_filter(words,
                             x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                           / len(words) END AS fa,
                 CASE WHEN len(lines) = 0 THEN 0.0
                      ELSE CAST(len(list_filter(lines,
                             x -> regexp_matches(x, '^[-*•·]'))) AS DOUBLE)
                           / len(lines) END AS fb,
                 CASE WHEN len(lines) = 0 THEN 0.0
                      ELSE CAST(len(list_filter(lines,
                             x -> regexp_matches(x, '(\.\.\.|…)$'))) AS DOUBLE)
                           / len(lines) END AS fe,
                 CASE WHEN len(lines) = 0 THEN 0.0
                      ELSE CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                           / len(lines) END AS fd,
                 CAST(len(list_intersect(
                        list_distinct(list_transform(words, x -> lower(x))),
                        ['the','be','to','of','and','that','have','with']))
                      AS BIGINT) AS ns
          FROM w),
        g AS (
          SELECT doc_id, nw,
                 (nw >= 50 AND nw <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
                  AND fa >= 0.8 AND fb <= 0.9 AND fe <= 0.3 AND fd <= 0.3
                  AND ns >= 2) AS gopher_pass
          FROM m),
        qtok AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\s+'), sw -> sw <> '')) AS wd
          FROM documents),
        qk AS (
          SELECT doc_id,
                 SUM(CAST(CAST(concat('0x', substr(md5(wd || 'quality-v1'), 1, 15))
                               AS UBIGINT) % 10001 AS BIGINT) - 5000) > 0 AS keep
          FROM qtok GROUP BY doc_id),
        flags AS (
          SELECT g.doc_id, g.nw, g.gopher_pass,
                 coalesce(qk.keep, FALSE) AS keep
          FROM g LEFT JOIN qk ON qk.doc_id = g.doc_id),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS c0,
                 CAST(coalesce(sum(CASE WHEN nw > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS c1,
                 CAST(coalesce(sum(CASE WHEN nw >= 30 AND nw <= 100000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS c2,
                 CAST(coalesce(sum(CASE WHEN nw >= 30 AND nw <= 100000 AND keep THEN 1 ELSE 0 END), 0) AS BIGINT) AS c3,
                 CAST(coalesce(sum(CASE WHEN nw >= 30 AND nw <= 100000 AND keep AND gopher_pass THEN 1 ELSE 0 END), 0) AS BIGINT) AS c4
          FROM flags)
        SELECT stage_idx, stage, n_in, n_out,
               n_in - n_out AS n_dropped,
               round(CAST(n_out AS DOUBLE) / greatest(n_in, 1), 6) AS retention
        FROM (
          SELECT CAST(1 AS INTEGER) AS stage_idx, 'has_text' AS stage, c0 AS n_in, c1 AS n_out FROM c
          UNION ALL SELECT 2, 'length_band', c1, c2 FROM c
          UNION ALL SELECT 3, 'quality', c2, c3 FROM c
          UNION ALL SELECT 4, 'gopher', c3, c4 FROM c)
        ORDER BY stage_idx
"""

# r7c: streaming exact dedup drained AvailableNow must equal batch
# COUNT(DISTINCT) — the streaming side lands the deduped key set and
# counts rows, so any double-emitted key breaks the hash.
ORACLES["streaming_dedup_counts"] = """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
"""

# r8: the stream-stream interval join drain == the batch theta join —
# purchases joined to same-user clicks in the two hours before them,
# inclusive on both bounds (the Spark condition is r_ts <= ts AND
# r_ts >= ts - INTERVAL, mirrored exactly).
ORACLES["streaming_interval_join_counts"] = """
        SELECT l.user_id, count(*) AS n_pairs
        FROM events l JOIN events r
          ON r.user_id = l.user_id
         AND l.event_type = 'purchase' AND r.event_type = 'click'
         AND r.ts <= l.ts
         AND r.ts >= l.ts - INTERVAL 2 HOUR
        GROUP BY l.user_id
        ORDER BY l.user_id
"""

# r7d: count-min sketch replayed cell-for-cell — the bucket hash is the
# portable 60-bit md5 (the simhash/classifier convention), counts are
# integers, and the estimate is an integer MIN over d cells, so the
# sketch is approximate yet fully deterministic (the LSH/IVF oracle
# argument). w=16/d=2 deliberately collide the 31-token vocabulary so
# the graded overcounts are non-vacuous.
ORACLES["cms_token_estimates"] = r"""
        WITH tok AS (
          SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                        w -> w <> '')) AS tok
          FROM documents),
        truec AS (
          SELECT tok AS token, CAST(count(*) AS BIGINT) AS n_true
          FROM tok GROUP BY tok),
        top AS (
          SELECT token, n_true FROM truec
          ORDER BY n_true DESC, token LIMIT 20),
        rs AS (SELECT unnest([0, 1]) AS r),
        cells AS (
          SELECT rs.r,
                 CAST(CAST(concat('0x', substr(md5(CAST(rs.r AS VARCHAR) || ':cms-v1:' || t.tok), 1, 15))
                      AS UBIGINT) % 16 AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM tok t CROSS JOIN rs
          GROUP BY 1, 2),
        probes AS (
          SELECT t.token, t.n_true, rs.r,
                 CAST(CAST(concat('0x', substr(md5(CAST(rs.r AS VARCHAR) || ':cms-v1:' || t.token), 1, 15))
                      AS UBIGINT) % 16 AS BIGINT) AS bucket
          FROM top t CROSS JOIN rs)
        SELECT p.token,
               p.n_true,
               CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS n_est,
               CAST(min(coalesce(c.cnt, 0)) - p.n_true AS BIGINT) AS overcount
        FROM probes p LEFT JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
        GROUP BY p.token, p.n_true
        ORDER BY p.n_true DESC, p.token
"""

# r7d: portable HyperLogLog replayed register-for-register: bucket =
# low 5 hash bits, rho = 56 - msb(remainder) with msb computed by the
# same or-shift smear + bit_count integer chain Spark runs, the
# harmonic sum an exact BIGINT (each register term a power of two),
# and the estimate ONE double division (713.728 = alpha_32*m^2,
# precomputed so no engine re-derives it) with the linear-counting
# small-range branch on exact integer V — bit-identical before the
# 6-dp round.
# r12: Morton/z-order layout replayed bit-for-bit — integer quantize
# ((v-min)*65536 div range+1), the magic-mask spread chain on each
# dimension (masks in decimal: 16711935, 252645135, 858993459,
# 1431655765), interleave via odd-shift OR, zbucket = zvalue >> 26
# (64 equal-width curve ranges), per-bucket stats rectangles, and the
# centered-quarter-box candidate verdict (rect intersection).
ORACLES["zorder_box_prune_events"] = r"""
        WITH base AS (
          SELECT user_id AS x,
                 CAST(floor(value * 100) AS BIGINT) AS y
          FROM events),
        rng AS (
          SELECT MIN(x) AS xlo, MAX(x) AS xhi, MIN(y) AS ylo, MAX(y) AS yhi
          FROM base),
        q AS (
          SELECT ((b.x - r.xlo) * 65536) // (r.xhi - r.xlo + 1) AS qx,
                 ((b.y - r.ylo) * 65536) // (r.yhi - r.ylo + 1) AS qy
          FROM base b CROSS JOIN rng r),
        sx1 AS (SELECT qx, qy, (qx | (qx << 8)) & 16711935 AS sx FROM q),
        sx2 AS (SELECT qx, qy, (sx | (sx << 4)) & 252645135 AS sx FROM sx1),
        sx3 AS (SELECT qx, qy, (sx | (sx << 2)) & 858993459 AS sx FROM sx2),
        sx4 AS (SELECT qx, qy, (sx | (sx << 1)) & 1431655765 AS sx FROM sx3),
        sy1 AS (SELECT qx, qy, sx, (qy | (qy << 8)) & 16711935 AS sy FROM sx4),
        sy2 AS (SELECT qx, qy, sx, (sy | (sy << 4)) & 252645135 AS sy FROM sy1),
        sy3 AS (SELECT qx, qy, sx, (sy | (sy << 2)) & 858993459 AS sy FROM sy2),
        sy4 AS (SELECT qx, qy, sx, (sy | (sy << 1)) & 1431655765 AS sy FROM sy3),
        z AS (SELECT qx, qy, (sx | (sy << 1)) >> 26 AS zbucket FROM sy4),
        stats AS (
          SELECT zbucket,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 MIN(qx) AS minqx, MAX(qx) AS maxqx,
                 MIN(qy) AS minqy, MAX(qy) AS maxqy,
                 CAST(SUM(CASE WHEN qx >= 24576 AND qx <= 40959
                                AND qy >= 24576 AND qy <= 40959
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_in_box
          FROM z GROUP BY zbucket)
        SELECT zbucket, n_rows, minqx, maxqx, minqy, maxqy,
               (minqx <= 40959 AND maxqx >= 24576
                AND minqy <= 40959 AND maxqy >= 24576) AS candidate,
               n_rows_in_box
        FROM stats
        ORDER BY zbucket
"""

# r12: HDR log-histogram quantile sketch replayed bucket-for-bucket —
# integer cents via floor of one binary64 product, msb via the same
# or-shift smear chain as HLL, idx = (v >> b) + b*128 with
# b = greatest(0, msb-8), estimate = inclusive upper bound of the
# first bucket whose running count reaches ceil(n*p/100) (the pure
# integer form cum*100 >= total*p), exact values via the identical
# rank rule over the exact value histogram.
ORACLES["hdr_quantile_order_totals"] = r"""
        WITH cents AS (
          SELECT o_orderpriority AS pr,
                 CAST(floor(o_totalprice * 100) AS BIGINT) AS v
          FROM orders),
        s1 AS (SELECT pr, v, v | (v >> 1) AS x FROM cents),
        s2 AS (SELECT pr, v, x | (x >> 2) AS x FROM s1),
        s3 AS (SELECT pr, v, x | (x >> 4) AS x FROM s2),
        s4 AS (SELECT pr, v, x | (x >> 8) AS x FROM s3),
        s5 AS (SELECT pr, v, x | (x >> 16) AS x FROM s4),
        s6 AS (SELECT pr, v, x | (x >> 32) AS x FROM s5),
        bi AS (SELECT pr, v,
                      greatest(0, bit_count(x) - 8) AS b
               FROM s6),
        ix AS (SELECT pr, (v >> b) + b * 128 AS idx FROM bi),
        regs AS (SELECT pr, idx, CAST(count(*) AS BIGINT) AS cnt
                 FROM ix GROUP BY pr, idx),
        cum AS (SELECT pr, idx,
                       SUM(cnt) OVER (PARTITION BY pr ORDER BY idx) AS cum,
                       SUM(cnt) OVER (PARTITION BY pr) AS total
                FROM regs),
        dec AS (SELECT pr, cum, total,
                       CASE WHEN idx >= 256 THEN idx // 128 - 1 ELSE 0 END AS b2,
                       idx
                FROM cum),
        up AS (SELECT pr, cum, total,
                      ((idx - b2 * 128 + 1) << b2) - 1 AS upper
               FROM dec),
        est AS (SELECT pr, CAST(MAX(total) AS BIGINT) AS n,
                       MIN(CASE WHEN cum * 100 >= total * 50 THEN upper END) AS p50_est,
                       MIN(CASE WHEN cum * 100 >= total * 90 THEN upper END) AS p90_est,
                       MIN(CASE WHEN cum * 100 >= total * 99 THEN upper END) AS p99_est
                FROM up GROUP BY pr),
        eregs AS (SELECT pr, v, CAST(count(*) AS BIGINT) AS cnt
                  FROM cents GROUP BY pr, v),
        ecum AS (SELECT pr, v,
                        SUM(cnt) OVER (PARTITION BY pr ORDER BY v) AS cum,
                        SUM(cnt) OVER (PARTITION BY pr) AS total
                 FROM eregs),
        exact AS (SELECT pr,
                         MIN(CASE WHEN cum * 100 >= total * 50 THEN v END) AS p50_exact,
                         MIN(CASE WHEN cum * 100 >= total * 90 THEN v END) AS p90_exact,
                         MIN(CASE WHEN cum * 100 >= total * 99 THEN v END) AS p99_exact
                  FROM ecum GROUP BY pr)
        SELECT e.pr AS o_orderpriority, e.n,
               e.p50_est, e.p90_est, e.p99_est,
               x.p50_exact, x.p90_exact, x.p99_exact,
               round((e.p50_est - x.p50_exact) / CAST(x.p50_exact AS DOUBLE), 6) AS rel_err_p50,
               round((e.p90_est - x.p90_exact) / CAST(x.p90_exact AS DOUBLE), 6) AS rel_err_p90,
               round((e.p99_est - x.p99_exact) / CAST(x.p99_exact AS DOUBLE), 6) AS rel_err_p99
        FROM est e JOIN exact x ON x.pr = e.pr
        ORDER BY e.pr
"""

# r13: incremental z-order append replayed bit-for-bit — quantization
# ranges come from the INITIAL build subset (event_id % 3 <> 0, the
# sidecar pin), appended rows clamp to the pinned boundary value
# (LEAST/GREATEST) before the same quantize + magic-mask interleave,
# and the box filter runs in quantized space — so append+scan must
# equal this one-shot replay over ALL events exactly.
ORACLES["zorder_append_box_scan"] = r"""
        WITH base AS (
          SELECT event_id, user_id AS x,
                 CAST(floor(value * 100) AS BIGINT) AS y
          FROM events),
        rng AS (
          SELECT MIN(x) AS xlo, MAX(x) AS xhi, MIN(y) AS ylo, MAX(y) AS yhi
          FROM base WHERE event_id % 3 <> 0),
        q AS (
          SELECT b.event_id,
                 ((LEAST(r.xhi, GREATEST(r.xlo, b.x)) - r.xlo) * 65536)
                   // (r.xhi - r.xlo + 1) AS qx,
                 ((LEAST(r.yhi, GREATEST(r.ylo, b.y)) - r.ylo) * 65536)
                   // (r.yhi - r.ylo + 1) AS qy
          FROM base b CROSS JOIN rng r),
        sx1 AS (SELECT event_id, qx, qy, (qx | (qx << 8)) & 16711935 AS sx FROM q),
        sx2 AS (SELECT event_id, qx, qy, (sx | (sx << 4)) & 252645135 AS sx FROM sx1),
        sx3 AS (SELECT event_id, qx, qy, (sx | (sx << 2)) & 858993459 AS sx FROM sx2),
        sx4 AS (SELECT event_id, qx, qy, (sx | (sx << 1)) & 1431655765 AS sx FROM sx3),
        sy1 AS (SELECT event_id, qx, qy, sx, (qy | (qy << 8)) & 16711935 AS sy FROM sx4),
        sy2 AS (SELECT event_id, qx, qy, sx, (sy | (sy << 4)) & 252645135 AS sy FROM sy1),
        sy3 AS (SELECT event_id, qx, qy, sx, (sy | (sy << 2)) & 858993459 AS sy FROM sy2),
        sy4 AS (SELECT event_id, qx, qy, sx, (sy | (sy << 1)) & 1431655765 AS sy FROM sy3),
        z AS (SELECT event_id, qx, qy,
                     CAST((sx | (sy << 1)) >> 26 AS BIGINT) AS zbucket
              FROM sy4)
        SELECT event_id, qx, qy, zbucket
        FROM z
        WHERE qx >= 24576 AND qx <= 40959
          AND qy >= 24576 AND qy <= 40959
        ORDER BY event_id
"""

# r13: the persisted-store HDR merge graded against the full-corpus
# replay — day1 ∪ day2 registers ARE the full registers (count-sum),
# so the merged estimate must equal this one-shot replay bit-for-bit
# (same bucket math and integer rank rule as hdr_quantile_order_totals,
# estimates only).
ORACLES["hdr_store_merged_quantiles"] = r"""
        WITH cents AS (
          SELECT o_orderpriority AS pr,
                 CAST(floor(o_totalprice * 100) AS BIGINT) AS v
          FROM orders),
        s1 AS (SELECT pr, v, v | (v >> 1) AS x FROM cents),
        s2 AS (SELECT pr, v, x | (x >> 2) AS x FROM s1),
        s3 AS (SELECT pr, v, x | (x >> 4) AS x FROM s2),
        s4 AS (SELECT pr, v, x | (x >> 8) AS x FROM s3),
        s5 AS (SELECT pr, v, x | (x >> 16) AS x FROM s4),
        s6 AS (SELECT pr, v, x | (x >> 32) AS x FROM s5),
        bi AS (SELECT pr, v,
                      greatest(0, bit_count(x) - 8) AS b
               FROM s6),
        ix AS (SELECT pr, (v >> b) + b * 128 AS idx FROM bi),
        regs AS (SELECT pr, idx, CAST(count(*) AS BIGINT) AS cnt
                 FROM ix GROUP BY pr, idx),
        cum AS (SELECT pr, idx,
                       SUM(cnt) OVER (PARTITION BY pr ORDER BY idx) AS cum,
                       SUM(cnt) OVER (PARTITION BY pr) AS total
                FROM regs),
        dec AS (SELECT pr, cum, total,
                       CASE WHEN idx >= 256 THEN idx // 128 - 1 ELSE 0 END AS b2,
                       idx
                FROM cum),
        up AS (SELECT pr, cum, total,
                      ((idx - b2 * 128 + 1) << b2) - 1 AS upper
               FROM dec)
        SELECT pr AS o_orderpriority, CAST(MAX(total) AS BIGINT) AS n,
               MIN(CASE WHEN cum * 100 >= total * 50 THEN upper END) AS p50,
               MIN(CASE WHEN cum * 100 >= total * 90 THEN upper END) AS p90,
               MIN(CASE WHEN cum * 100 >= total * 99 THEN upper END) AS p99
        FROM up GROUP BY pr
        ORDER BY pr
"""

# r13: the bloom-prefilter join replayed bit-for-bit — filter words
# from the VIP keys (the bloom_token_membership replay chain over
# stringified custkeys, m=256/k=2), per-order min-over-probes
# membership, then the exact join marker: n_kept_bloom counts the
# deterministic prefilter survivors (true matches + replayable false
# positives), n_joined/sum_price_joined the lossless exact result.
ORACLES["bloom_prefilter_join_orders"] = r"""
        WITH vip AS (
          SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9900),
        vk AS (SELECT DISTINCT CAST(k AS VARCHAR) AS ks FROM vip),
        ksr AS (SELECT unnest(generate_series(0, 1)) AS r),
        pos AS (
          SELECT CAST(CAST(concat('0x', substr(md5(CAST(r AS VARCHAR) || ':bloom-v1:' || ks), 1, 15)) AS UBIGINT) AS BIGINT) % 256 AS p
          FROM vk CROSS JOIN ksr),
        filt AS (
          SELECT CAST(p // 63 AS INTEGER) AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)) AS bits
          FROM pos GROUP BY 1),
        op AS (
          SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
          FROM orders WHERE o_custkey IS NOT NULL),
        opw AS (
          SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice,
                 CAST(pp // 63 AS INTEGER) AS word_idx,
                 CAST(1 AS BIGINT) << CAST(pp % 63 AS INTEGER) AS mask
          FROM (
            SELECT op.*, CAST(CAST(concat('0x', substr(md5(CAST(r AS VARCHAR) || ':bloom-v1:' || CAST(o_custkey AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % 256 AS pp
            FROM op CROSS JOIN ksr)),
        hits AS (
          SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice,
                 min(CASE WHEN (coalesce(bits, 0) & mask) = mask THEN 1 ELSE 0 END) AS hit
          FROM opw LEFT JOIN filt USING (word_idx)
          GROUP BY 1, 2, 3, 4),
        kept AS (SELECT * FROM hits WHERE hit = 1),
        marked AS (
          SELECT kept.o_orderpriority, kept.o_totalprice,
                 (vip.k IS NOT NULL) AS matched
          FROM kept LEFT JOIN vip ON vip.k = kept.o_custkey)
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_kept_bloom,
               CAST(count(CASE WHEN matched THEN 1 END) AS BIGINT) AS n_joined,
               COALESCE(CAST(SUM(CASE WHEN matched
                   THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0.0)
                 AS sum_price_joined
        FROM marked
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
"""

# r13: the HLL pairwise set-algebra replay — the portable-HLL register
# chain (identical to hll_distinct_by_source), then per-pair bucket-MAX
# union registers, the same bias-corrected estimate for singles and
# unions, and inclusion-exclusion on the 6-dp-rounded estimates —
# with the exact per-pair distinct-token intersections as the grade.
ORACLES["hll_vocab_overlap_sources"] = r"""
        WITH tok AS (
          SELECT source,
                 unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                        w -> w <> '')) AS tok
          FROM documents),
        h AS (
          SELECT source,
                 CAST(CAST(concat('0x', substr(md5('hll-v1:' || tok), 1, 15)) AS UBIGINT) AS BIGINT) AS h
          FROM tok),
        rr AS (SELECT source, h & 31 AS bucket, h >> 5 AS rem FROM h),
        s1 AS (SELECT source, bucket, rem | (rem >> 1) AS x FROM rr),
        s2 AS (SELECT source, bucket, x | (x >> 2) AS x FROM s1),
        s3 AS (SELECT source, bucket, x | (x >> 4) AS x FROM s2),
        s4 AS (SELECT source, bucket, x | (x >> 8) AS x FROM s3),
        s5 AS (SELECT source, bucket, x | (x >> 16) AS x FROM s4),
        s6 AS (SELECT source, bucket, x | (x >> 32) AS x FROM s5),
        regs AS (
          SELECT source, bucket, MAX(56 - bit_count(x)) AS reg
          FROM s6 GROUP BY source, bucket),
        agg AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS nb,
                 CAST(sum(CAST(1 AS BIGINT) << (56 - reg)) AS BIGINT) AS s_present
          FROM regs GROUP BY source),
        e AS (
          SELECT source,
                 32 - nb AS v,
                 713.728e0 * 72057594037927936e0
                   / CAST(s_present + CAST(32 - nb AS BIGINT) * (CAST(1 AS BIGINT) << 56) AS DOUBLE) AS e_raw
          FROM agg),
        fin AS (
          SELECT source,
                 round(CASE WHEN e_raw <= 80.0e0 AND v > 0
                            THEN 32.0e0 * ln(32.0e0 / CAST(v AS DOUBLE))
                            ELSE e_raw END, 6) AS n_est
          FROM e),
        srcs AS (SELECT DISTINCT source FROM regs),
        pr AS (
          SELECT a.source AS source_a, b.source AS source_b
          FROM srcs a JOIN srcs b ON a.source < b.source),
        uregs AS (
          SELECT source_a, source_b, bucket, MAX(reg) AS reg FROM (
            SELECT p.source_a, p.source_b, r.bucket, r.reg
            FROM pr p JOIN regs r ON r.source = p.source_a
            UNION ALL
            SELECT p.source_a, p.source_b, r.bucket, r.reg
            FROM pr p JOIN regs r ON r.source = p.source_b)
          GROUP BY source_a, source_b, bucket),
        uagg AS (
          SELECT source_a, source_b,
                 CAST(count(*) AS BIGINT) AS nb,
                 CAST(sum(CAST(1 AS BIGINT) << (56 - reg)) AS BIGINT) AS s_present
          FROM uregs GROUP BY source_a, source_b),
        ue AS (
          SELECT source_a, source_b,
                 32 - nb AS v,
                 713.728e0 * 72057594037927936e0
                   / CAST(s_present + CAST(32 - nb AS BIGINT) * (CAST(1 AS BIGINT) << 56) AS DOUBLE) AS e_raw
          FROM uagg),
        ufin AS (
          SELECT source_a, source_b,
                 round(CASE WHEN e_raw <= 80.0e0 AND v > 0
                            THEN 32.0e0 * ln(32.0e0 / CAST(v AS DOUBLE))
                            ELSE e_raw END, 6) AS n_union
          FROM ue),
        dtok AS (SELECT DISTINCT source, tok FROM tok),
        xact AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 CAST(count(*) AS BIGINT) AS n_inter_exact
          FROM dtok a JOIN dtok b ON b.tok = a.tok AND a.source < b.source
          GROUP BY 1, 2)
        SELECT u.source_a, u.source_b,
               fa.n_est AS n_a, fb.n_est AS n_b, u.n_union,
               round(fa.n_est + fb.n_est - u.n_union, 6) AS n_inter,
               COALESCE(x.n_inter_exact, 0) AS n_inter_exact,
               CASE WHEN COALESCE(x.n_inter_exact, 0) > 0 THEN
                 round((round(fa.n_est + fb.n_est - u.n_union, 6) - x.n_inter_exact)
                       / CAST(x.n_inter_exact AS DOUBLE), 6)
               END AS rel_err
        FROM ufin u
        JOIN fin fa ON fa.source = u.source_a
        JOIN fin fb ON fb.source = u.source_b
        LEFT JOIN xact x ON x.source_a = u.source_a AND x.source_b = u.source_b
        ORDER BY u.source_a, u.source_b
"""

ORACLES["hll_distinct_by_source"] = r"""
        WITH tok AS (
          SELECT source,
                 unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                        w -> w <> '')) AS tok
          FROM documents),
        h AS (
          SELECT source,
                 CAST(CAST(concat('0x', substr(md5('hll-v1:' || tok), 1, 15)) AS UBIGINT) AS BIGINT) AS h
          FROM tok),
        rr AS (SELECT source, h & 31 AS bucket, h >> 5 AS rem FROM h),
        s1 AS (SELECT source, bucket, rem | (rem >> 1) AS x FROM rr),
        s2 AS (SELECT source, bucket, x | (x >> 2) AS x FROM s1),
        s3 AS (SELECT source, bucket, x | (x >> 4) AS x FROM s2),
        s4 AS (SELECT source, bucket, x | (x >> 8) AS x FROM s3),
        s5 AS (SELECT source, bucket, x | (x >> 16) AS x FROM s4),
        s6 AS (SELECT source, bucket, x | (x >> 32) AS x FROM s5),
        regs AS (
          SELECT source, bucket, MAX(56 - bit_count(x)) AS reg
          FROM s6 GROUP BY source, bucket),
        agg AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS nb,
                 CAST(sum(CAST(1 AS BIGINT) << (56 - reg)) AS BIGINT) AS s_present
          FROM regs GROUP BY source),
        e AS (
          SELECT source,
                 32 - nb AS v,
                 713.728e0 * 72057594037927936e0
                   / CAST(s_present + CAST(32 - nb AS BIGINT) * (CAST(1 AS BIGINT) << 56) AS DOUBLE) AS e_raw
          FROM agg),
        fin AS (
          SELECT source,
                 round(CASE WHEN e_raw <= 80.0e0 AND v > 0
                            THEN 32.0e0 * ln(32.0e0 / CAST(v AS DOUBLE))
                            ELSE e_raw END, 6) AS n_est
          FROM e),
        exact AS (
          SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
          FROM tok GROUP BY source)
        SELECT x.source, x.n_exact, f.n_est,
               round((f.n_est - x.n_exact) / CAST(x.n_exact AS DOUBLE), 6) AS rel_err
        FROM exact x JOIN fin f ON f.source = x.source
        ORDER BY x.source
"""

# r8: Bloom filter replayed word-for-word — positions from the portable
# salted 60-bit md5 hash (the CMS/HLL convention), bits packed into
# 63-bit BIGINT lanes (DuckDB's << raises on 1 << 63 where Spark's
# wraps, so the sign bit stays clear of the format), membership = min
# over the k mask tests. m=128 deliberately narrow: the graded rows
# include deterministic FALSE POSITIVES, not just trivial hits.
ORACLES["bloom_token_membership"] = r"""
        WITH words AS (
          SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                        w -> w <> '')) AS w
          FROM documents),
        vocab AS (SELECT DISTINCT w AS tok FROM words),
        ks AS (SELECT unnest(generate_series(0, 2)) AS r),
        pos AS (
          SELECT CAST(CAST(concat('0x', substr(md5(CAST(r AS VARCHAR) || ':bloom-v1:' || tok), 1, 15)) AS UBIGINT) AS BIGINT) % 128 AS p
          FROM vocab CROSS JOIN ks),
        filt AS (
          SELECT CAST(p // 63 AS INTEGER) AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)) AS bits
          FROM pos GROUP BY 1),
        top10 AS (
          SELECT w AS token FROM words GROUP BY w
          ORDER BY count(*) DESC, w LIMIT 10),
        absent AS (
          SELECT 'absent' || CAST(i AS VARCHAR) AS token
          FROM (SELECT unnest(generate_series(0, 9)) AS i)),
        probes AS (SELECT token FROM top10 UNION ALL SELECT token FROM absent),
        pw AS (
          SELECT token,
                 CAST(pp // 63 AS INTEGER) AS word_idx,
                 CAST(1 AS BIGINT) << CAST(pp % 63 AS INTEGER) AS mask
          FROM (
            SELECT token,
                   CAST(CAST(concat('0x', substr(md5(CAST(r AS VARCHAR) || ':bloom-v1:' || token), 1, 15)) AS UBIGINT) AS BIGINT) % 128 AS pp
            FROM probes CROSS JOIN ks)),
        hits AS (
          SELECT token,
                 min(CASE WHEN (coalesce(bits, 0) & mask) = mask THEN 1 ELSE 0 END) AS hit
          FROM pw LEFT JOIN filt USING (word_idx)
          GROUP BY token)
        SELECT h.token,
               h.hit = 1 AS in_filter,
               (v.tok IS NOT NULL) AS present_exact
        FROM hits h LEFT JOIN vocab v ON v.tok = h.token
        ORDER BY h.token
"""

# r8: the k-NN graph's IVF candidate path, replayed end-to-end — sphere
# normalization, portable md5-ordered centroid seeding over the
# normalized vectors, assignment = argmax dot (ties to the lower cell,
# numpy's stable argsort rule), probes = top-3 cells per source,
# candidates = ALL probed-cell members (the Spark per-cell
# top-(k+slack) cut keeps everything within a full 6-dp rounding
# bucket of the take-th score, so no candidate the rounded verdict
# could rank into the top-k is ever dropped), verdict = the standard 6-dp
# list_dot_product cosine + dst tie-break. Every dst lives in exactly
# one cell, so no candidate pair duplicates.
ORACLES["knn_edges_ivf_embeddings"] = """
        WITH nv AS (
          SELECT vec_id, embedding::DOUBLE[] AS ev,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
          FROM embeddings),
        good AS (
          SELECT vec_id, ev, nrm,
                 list_transform(ev, x -> x / nrm) AS uv
          FROM nv WHERE nrm > 0),
        c AS (
          SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
                 uv AS cv
          FROM good
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT 8),
        sims AS (
          SELECT g.vec_id, c.cell,
                 row_number() OVER (
                   PARTITION BY g.vec_id
                   -- 12-dp round mirrors the Spark side (r8 ADVICE):
                   -- numpy blocked vs DuckDB sequential summation can
                   -- differ ~1e-13, and only exact ties take the
                   -- lower-cell rule
                   ORDER BY round(list_dot_product(g.uv, c.cv), 12) DESC, c.cell
                 ) AS rn
          FROM good g CROSS JOIN c),
        assigned AS (SELECT vec_id, cell FROM sims WHERE rn = 1),
        probes AS (SELECT vec_id, cell FROM sims WHERE rn <= 3),
        cand AS (
          SELECT p.vec_id AS src, a.vec_id AS dst
          FROM probes p JOIN assigned a
            ON a.cell = p.cell AND a.vec_id <> p.vec_id),
        scored AS (
          SELECT cd.src, cd.dst,
                 round(list_dot_product(gs.ev, gd.ev) / (gs.nrm * gd.nrm), 6) AS score
          FROM cand cd
          JOIN good gs ON gs.vec_id = cd.src
          JOIN good gd ON gd.vec_id = cd.dst)
        SELECT src, dst, score, rk FROM (
          SELECT src, dst, score,
                 row_number() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rk
          FROM scored)
        WHERE rk <= 3
        ORDER BY src, rk
"""

# r8: the persisted-store cross-day merge. The oracle IS the full-corpus
# register replay (identical CTE chain to hll_distinct_by_source up to
# `fin`): register-wise MAX over the union of day stores must equal the
# registers of the whole corpus, so grading the merged estimate against
# the full-corpus estimate is exactly the mergeability contract.
ORACLES["hll_store_merged_counts"] = r"""
        WITH tok AS (
          SELECT source,
                 unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                        w -> w <> '')) AS tok
          FROM documents),
        h AS (
          SELECT source,
                 CAST(CAST(concat('0x', substr(md5('hll-v1:' || tok), 1, 15)) AS UBIGINT) AS BIGINT) AS h
          FROM tok),
        rr AS (SELECT source, h & 31 AS bucket, h >> 5 AS rem FROM h),
        s1 AS (SELECT source, bucket, rem | (rem >> 1) AS x FROM rr),
        s2 AS (SELECT source, bucket, x | (x >> 2) AS x FROM s1),
        s3 AS (SELECT source, bucket, x | (x >> 4) AS x FROM s2),
        s4 AS (SELECT source, bucket, x | (x >> 8) AS x FROM s3),
        s5 AS (SELECT source, bucket, x | (x >> 16) AS x FROM s4),
        s6 AS (SELECT source, bucket, x | (x >> 32) AS x FROM s5),
        regs AS (
          SELECT source, bucket, MAX(56 - bit_count(x)) AS reg
          FROM s6 GROUP BY source, bucket),
        agg AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS nb,
                 CAST(sum(CAST(1 AS BIGINT) << (56 - reg)) AS BIGINT) AS s_present
          FROM regs GROUP BY source),
        e AS (
          SELECT source,
                 32 - nb AS v,
                 713.728e0 * 72057594037927936e0
                   / CAST(s_present + CAST(32 - nb AS BIGINT) * (CAST(1 AS BIGINT) << 56) AS DOUBLE) AS e_raw
          FROM agg)
        SELECT source,
               round(CASE WHEN e_raw <= 80.0e0 AND v > 0
                          THEN 32.0e0 * ln(32.0e0 / CAST(v AS DOUBLE))
                          ELSE e_raw END, 6) AS n_est
        FROM e ORDER BY source
"""

# r7e: per-label centroid outliers — the centroid never becomes a mean
# (cosine is scale-invariant, so the quantized-integer SUM vector is
# scored directly); sums replay exactly, the sum vector casts to double
# (< 2^53 at any test scale), and the one float expression is the same
# list_dot_product cosine every ANN oracle uses.
ORACLES["embedding_outliers_by_label"] = r"""
        WITH v AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS vv
          FROM embeddings
          WHERE label IS NOT NULL AND embedding IS NOT NULL),
        vok AS (
          SELECT vec_id, label, vv, sqrt(list_dot_product(vv, vv)) AS n
          FROM v
          WHERE sqrt(list_dot_product(vv, vv)) > 0),
        q AS (
          SELECT label,
                 unnest(list_transform(range(1, len(vv) + 1),
                        i -> {'i': i, 'q': CAST(floor(vv[i] * 1048576) AS BIGINT)})) AS s
          FROM vok),
        sums AS (
          SELECT label, s.i AS i, CAST(SUM(s.q) AS BIGINT) AS q
          FROM q GROUP BY label, s.i),
        cent AS (
          SELECT label, list(CAST(q AS DOUBLE) ORDER BY i) AS cv
          FROM sums GROUP BY label),
        cn AS (
          SELECT label, cv, sqrt(list_dot_product(cv, cv)) AS cn
          FROM cent
          WHERE sqrt(list_dot_product(cv, cv)) > 0),
        scored AS (
          SELECT a.label, a.vec_id,
                 round(list_dot_product(a.vv, c.cv) / (a.n * c.cn), 6) + 0.0 AS cos_centroid  -- +0.0: signed-zero normalization (the embed-pipeline e0 class)
          FROM vok a JOIN cn c ON c.label = a.label),
        ranked AS (
          SELECT label, vec_id, cos_centroid,
                 CAST(row_number() OVER (PARTITION BY label
                       ORDER BY cos_centroid ASC, vec_id) AS INTEGER) AS rk
          FROM scored)
        SELECT label, vec_id, cos_centroid, rk
        FROM ranked WHERE rk <= 3
        ORDER BY label, rk
"""

# r7e: exact phrase search replayed as the same positional-postings
# join chain — postings filtered to the phrase's own terms, alignment
# via (doc, pos+offset) equi-joins, exact occurrence counts.
ORACLES["phrase_search_documents"] = r"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\s+'),
                             w -> w <> '') AS w
          FROM documents),
        pos AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(w) + 1),
                        i -> {'p': i, 't': w[i]})) AS s
          FROM tok),
        p AS (
          SELECT doc_id, s.p AS pos, s.t AS term
          FROM pos WHERE s.t IN ('row', 'column', 'sort')),
        m AS (
          SELECT a.doc_id
          FROM p a
          JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = 'column'
          JOIN p c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2 AND c.term = 'sort'
          WHERE a.term = 'row')
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
        FROM m GROUP BY doc_id
        ORDER BY n_matches DESC, doc_id
"""

# ---------------------------------------------------------------------------
# r12 (r11 VERDICT Next #3): SAMPLED sf1 oracles for the two registry
# entries whose FULL oracles are genuinely N² at 20k vectors (pagerank's
# all-pairs cosine graph ~400 GB of DuckDB pair intermediate;
# knn_edges_ivf's all-probed-member scoring ~100M 64-d pairs). Each gets
# a deterministic-subset verdict the sweep can hash-match at sf1:
#
# * sampling rule: ``src % 97 = 0`` — a fixed prime modulus over the
#   integer vec_id (≈1/97 of sources, ~206 of 20k at sf1). Deterministic,
#   engine-agnostic (plain integer arithmetic on both sides), and prime
#   so it cannot alias the generators' power-of-two / decimal strides.
# * knn_edges_ivf: seeding + assignment replay over ALL vectors (N×8
#   dot products — cheap), probing + candidate scoring only for sampled
#   sources (~206 × ~7.5k members = ~1.5M pairs). The Spark side runs
#   the FULL production query and filters its output to the sampled
#   sources — per-src top-k makes the restriction exact.
# * pagerank: rank is a global fixpoint, so sampling nodes cannot grade
#   it directly. Two deterministic stages compose instead:
#   (A) the exact 3-NN EDGE BUILD — the super-linear half — graded on
#       sampled sources against all candidates (~206 × 20k = 4.1M pairs);
#   (B) the rank fixpoint graded on the FULL edge set: Spark's edges
#       are materialized and the 3 damped integer iterations replayed
#       in SQL over them (linear in |E| = 3N). A passes + B passes ⇒
#       every stage of the registry row is SQL-verified at sf1.
# Consumed by tools/scaling.py run_correctness (label sf1 only).
# ---------------------------------------------------------------------------

SAMPLED_SF1_ORACLES: dict[str, dict[str, str]] = {}

SAMPLED_SF1_ORACLES["knn_edges_ivf_embeddings"] = {
    "rule": (
        "deterministic source sample src % 97 = 0 (~1/97 of sources); "
        "seeding/assignment replayed over ALL vectors, probing + "
        "candidate scoring only for sampled sources — the full oracle "
        "is ~100M pair scores at 20k vectors (the named r11 skip)"
    ),
    # the FULL oracle verbatim except `cand` keeps only sampled sources
    "sql": """
        WITH nv AS (
          SELECT vec_id, embedding::DOUBLE[] AS ev,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
          FROM embeddings),
        good AS (
          SELECT vec_id, ev, nrm,
                 list_transform(ev, x -> x / nrm) AS uv
          FROM nv WHERE nrm > 0),
        c AS (
          SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
                 uv AS cv
          FROM good
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT 8),
        sims AS (
          SELECT g.vec_id, c.cell,
                 row_number() OVER (
                   PARTITION BY g.vec_id
                   ORDER BY round(list_dot_product(g.uv, c.cv), 12) DESC, c.cell
                 ) AS rn
          FROM good g CROSS JOIN c),
        assigned AS (SELECT vec_id, cell FROM sims WHERE rn = 1),
        probes AS (SELECT vec_id, cell FROM sims WHERE rn <= 3),
        cand AS (
          SELECT p.vec_id AS src, a.vec_id AS dst
          FROM probes p JOIN assigned a
            ON a.cell = p.cell AND a.vec_id <> p.vec_id
          WHERE p.vec_id % 97 = 0),
        scored AS (
          SELECT cd.src, cd.dst,
                 round(list_dot_product(gs.ev, gd.ev) / (gs.nrm * gd.nrm), 6) AS score
          FROM cand cd
          JOIN good gs ON gs.vec_id = cd.src
          JOIN good gd ON gd.vec_id = cd.dst)
        SELECT src, dst, score, rk FROM (
          SELECT src, dst, score,
                 row_number() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rk
          FROM scored)
        WHERE rk <= 3
        ORDER BY src, rk
""",
}

SAMPLED_SF1_ORACLES["pagerank_doc_graph"] = {
    "rule": (
        "two deterministic stages: (A) exact 3-NN edges graded for "
        "sampled sources src % 97 = 0 against ALL candidates; (B) the "
        "3-iteration integer rank fixpoint replayed in SQL over the "
        "FULL Spark-built edge set (view spark_knn_edges) — the full "
        "oracle's all-pairs graph is ~400 GB at 20k vectors (the named "
        "r11 skip)"
    ),
    "sql_edges": f"""
        WITH v AS (
          SELECT vec_id, embedding FROM embeddings
          WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
        sc AS (
          SELECT a.vec_id AS src, b.vec_id AS dst, round({_COSINE}, 6) AS score
          FROM v a JOIN v b ON a.vec_id <> b.vec_id
          WHERE a.vec_id % 97 = 0)
        SELECT src, dst, score, rk FROM (
          SELECT src, dst, score,
                 row_number() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rk
          FROM sc) WHERE rk <= 3
        ORDER BY src, rk
""",
    # identical CTE chain to the full pagerank oracle from `deg` on,
    # with `ed` read from the materialized Spark edges instead of the
    # N² in-SQL build
    "sql_ranks": """
        WITH ed AS (SELECT src, dst FROM spark_knn_edges),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS odeg FROM ed GROUP BY src),
        nodes AS (SELECT DISTINCT node FROM (
            SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        bs AS (SELECT 1000000000000 // n AS base FROM nn),
        ew AS (SELECT e.src, e.dst, d.odeg FROM ed e JOIN deg d USING (src)),
        r0 AS (SELECT node, base AS r FROM nodes CROSS JOIN bs),
        s1 AS (SELECT e.dst AS node, SUM(r.r // e.odeg) AS s
               FROM ew e JOIN r0 r ON r.node = e.src GROUP BY e.dst),
        r1 AS (SELECT nd.node, (15 * b.base + 85 * COALESCE(s.s, 0)) // 100 AS r
               FROM nodes nd CROSS JOIN bs b LEFT JOIN s1 s ON s.node = nd.node),
        s2 AS (SELECT e.dst AS node, SUM(r.r // e.odeg) AS s
               FROM ew e JOIN r1 r ON r.node = e.src GROUP BY e.dst),
        r2 AS (SELECT nd.node, (15 * b.base + 85 * COALESCE(s.s, 0)) // 100 AS r
               FROM nodes nd CROSS JOIN bs b LEFT JOIN s2 s ON s.node = nd.node),
        s3 AS (SELECT e.dst AS node, SUM(r.r // e.odeg) AS s
               FROM ew e JOIN r2 r ON r.node = e.src GROUP BY e.dst),
        r3 AS (SELECT nd.node, (15 * b.base + 85 * COALESCE(s.s, 0)) // 100 AS r
               FROM nodes nd CROSS JOIN bs b LEFT JOIN s3 s ON s.node = nd.node)
        SELECT node AS vec_id, CAST(r AS BIGINT) AS rank_q
        FROM r3 ORDER BY rank_q DESC, vec_id LIMIT 20
""",
}
