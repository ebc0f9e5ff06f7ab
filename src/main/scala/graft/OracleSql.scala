package graft

/** DuckDB oracle SQL for each SQL-expressible query in [[SparkEntry.queries]].
  * The driver runs these at sf0.01 and hash-compares against the Spark
  * results (sorted rows, columns sorted by name) — so every aggregate /
  * computed column is aliased to the same name on both sides, and every
  * nondeterministic edge (float summation order, exact-percentile
  * interpolation) is rounded below the comparison grain on both sides.
  *
  * Cross-engine gotchas handled here:
  *  - DuckDB `CAST(double AS BIGINT)` rounds, Spark truncates → integral
  *    doubles go through floor() first on the DuckDB side;
  *  - DuckDB `sum(BIGINT)` returns HUGEINT → cast back to BIGINT;
  *  - `events.ts` is parquet TIMESTAMP(NANOS); Spark floor-truncates to µs
  *    (GraftSession.table), DuckDB side mirrors with CAST(ts AS TIMESTAMP);
  *  - DuckDB regexp_replace needs the 'g' flag to replace all (Spark always
  *    replaces all);
  *  - Java \p{Punct} = POSIX ASCII punct = RE2 [[:punct:]].
  *
  * EVERY query carries an oracle — none are rows-only. Engine-private
  * values (HLL/KMV estimates, reservoir/any-n samples: 64-bit multiply
  * hashing DuckDB's checked arithmetic cannot replay) are gated by their
  * CONTRACTS instead: error bounds vs exact counts, sample
  * size/distinctness/membership.
  *
  * Three classes of oracle:
  *  - exact value oracles (most queries);
  *  - exact oracles over REPLAYED hashing — the LSH/IVF ANN queries use
  *    engine-neutral randomness (a splitmix64 plane matrix computed
  *    driver-side and inlined below as literals; md5-ordered centroid
  *    sampling), so DuckDB re-runs the whole bucketed pipeline and the
  *    hashes agree bit-for-bit;
  *  - property oracles (q_approx_quant / q_mp_quantiles / q_simhash):
  *    the Spark side emits the operator's accuracy CONTRACT as booleans
  *    (rank-error bounds, Hamming-distance bounds) over inputs DuckDB pins
  *    independently; the oracle asserts the contract holds everywhere.
  */
object OracleSql {

  /** Unrolled replay of Bpe.learnMerges: the word vocabulary is encoded as
    * a double-separator symbol string ("␣␣c␣␣a␣␣t␣␣"), each round counts
    * weighted adjacent pairs from the split symbols, picks the
    * (cnt DESC, a, b) argmax, and applies the merge via a literal replace
    * of '␣a␣␣b␣' with '␣ab␣' — the doubled separators make consecutive
    * pair occurrences non-overlapping, so one replace pass is EXACTLY the
    * simultaneous left-to-right merge sweep the Scala side performs. */
  private def bpeLearnSql(rounds: Int): String = {
    // every CTE is MATERIALIZED: v_r is referenced by sy_{r+1}, v_{r+1}
    // and (via 4 scalar subqueries) p_r — inlined CTEs would re-execute
    // the whole chain per reference, ~5^rounds scans
    // the HAVING floor re-derives Bpe.minFreqFor (one occurrence per 20k
    // docs, floor 1 — exact at the gate SFs) from count(*), so a
    // derivation drift between the engines breaks the hash
    val v0 =
      """v0 AS MATERIALIZED (SELECT '  ' || array_to_string(
        |          list_transform(range(1, len(w) + 1), i -> w[i]), '  ') || '  ' AS s, f
        |  FROM (SELECT w, count(*) AS f FROM (
        |      SELECT unnest(regexp_extract_all(text,
        |        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS w FROM documents)
        |    GROUP BY 1
        |    HAVING count(*) >= (SELECT GREATEST(1, count(*) // 20000)
        |                        FROM documents)))""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""sy$r AS MATERIALIZED (SELECT list_filter(string_split(s, ' '), x -> x <> '') AS syms, f FROM v${r - 1}),
         |p$r AS MATERIALIZED (SELECT pr[1] AS a, pr[2] AS b, sum(f) AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(syms)),
         |             i -> [syms[i], syms[i + 1]])) AS pr, f
         |    FROM sy$r WHERE len(syms) >= 2)
         |  GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1),
         |v$r AS MATERIALIZED (SELECT replace(s,
         |    ' ' || (SELECT a FROM p$r) || '  ' || (SELECT b FROM p$r) || ' ',
         |    ' ' || (SELECT a FROM p$r) || (SELECT b FROM p$r) || ' ') AS s, f
         |  FROM v${r - 1})""".stripMargin
    }
    val union = (1 to rounds).map(r =>
      s"SELECT $r AS merge_rank, a AS pair_a, b AS pair_b, CAST(cnt AS BIGINT) AS pair_count FROM p$r")
      .mkString("\nUNION ALL\n")
    s"WITH $v0,\n${roundCtes.mkString(",\n")}\n$union"
  }

  /** Unrolled replay of Classifier.trainLogReg + scoreLogReg: the same
    * hashed unigram+bigram buckets as q_dsir, then `rounds` full-batch
    * gradient steps from zero init (round 1's sigmoid(0)=0.5 is written
    * literally so no empty weight table is needed), weights kept
    * full-precision across rounds; only the final probability is rounded. */
  private def logRegSql(buckets: Int, rounds: Int, lr: Double): String = {
    val head =
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         |         list_filter(string_split_regex(lower(text), '[^a-z]+'),
         |                     w -> w <> '') AS words
         |  FROM documents),
         |hc AS MATERIALIZED (
         |  SELECT doc_id, y,
         |         CAST(('0x' || substr(md5(ng),1,15)) AS BIGINT) % $buckets AS bucket,
         |         count(*) AS cnt
         |  FROM (SELECT doc_id, y,
         |          unnest(words || list_transform(range(1, len(words)),
         |                   i -> words[i] || ' ' || words[i+1])) AS ng
         |        FROM d) GROUP BY 1, 2, 3),
         |nn AS MATERIALIZED (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM hc),
         |docs1 AS MATERIALIZED (SELECT DISTINCT doc_id, y FROM hc),
         |e1 AS MATERIALIZED (SELECT doc_id, y, 0.5 - y AS err FROM docs1),
         |g1 AS MATERIALIZED (SELECT bucket, sum(err * cnt) AS g
         |  FROM hc JOIN e1 USING (doc_id) GROUP BY 1),
         |w1 AS MATERIALIZED (SELECT bucket, 0 - $lr * g / nn.n AS wt FROM g1, nn),
         |b1 AS MATERIALIZED (SELECT 0 - $lr * (SELECT sum(err) FROM e1) / nn.n AS b FROM nn)""".stripMargin
    val laterRounds = (2 to rounds).map { r =>
      s"""z$r AS MATERIALIZED (SELECT hc.doc_id, hc.y,
         |    (SELECT b FROM b${r - 1}) + sum(cnt * coalesce(wt, 0)) AS zz
         |  FROM hc LEFT JOIN w${r - 1} USING (bucket) GROUP BY 1, 2),
         |e$r AS MATERIALIZED (SELECT doc_id, y, 1.0/(1.0 + exp(-zz)) - y AS err FROM z$r),
         |g$r AS MATERIALIZED (SELECT bucket, sum(err * cnt) AS g
         |  FROM hc JOIN e$r USING (doc_id) GROUP BY 1),
         |w$r AS MATERIALIZED (SELECT g$r.bucket,
         |    coalesce(w${r - 1}.wt, 0) - $lr * g / nn.n AS wt
         |  FROM g$r LEFT JOIN w${r - 1} USING (bucket), nn),
         |b$r AS MATERIALIZED (SELECT (SELECT b FROM b${r - 1})
         |    - $lr * (SELECT sum(err) FROM e$r) / nn.n AS b FROM nn)""".stripMargin
    }
    val score =
      s"""SELECT doc_id, round(p, 6) AS quality_prob, p >= 0.5 AS predicted
         |FROM (SELECT hc.doc_id,
         |        1.0/(1.0 + exp(-((SELECT b FROM b$rounds)
         |          + sum(cnt * coalesce(wt, 0))))) AS p
         |      FROM hc LEFT JOIN w$rounds USING (bucket) GROUP BY 1)""".stripMargin
    (Seq(head) ++ laterRounds).mkString(",\n") + "\n" + score
  }

  private val cents = "CAST(floor(%s * 100 + 0.5) AS BIGINT)"
  private def c(e: String): String = cents.format(e)

  /** The LSH plane matrix as DuckDB list literals — the SAME doubles
    * Similarity.hyperplaneBucket embeds as Catalyst literals
    * (Double.toString round-trips exactly, so both engines hash against
    * bit-identical hyperplanes). */
  private def planeList(plane: Int, seed: Long, dim: Int = 64): String =
    (0 until dim).map(d => graft.operators.Similarity.planeComponent(plane, d, seed).toString)
      .mkString("[", ", ", "]")

  /** Sign-bit bucket id over `planes` hyperplanes — mirrors
    * Similarity.hyperplaneBucket (rounded sign test, bit p set when the
    * dot is non-negative). */
  private def bucketExpr(vec: String, planes: Int, seed: Long): String =
    (0 until planes).map { p =>
      s"(CASE WHEN round(list_dot_product($vec, ${planeList(p, seed)}), 9) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Count-scaled variant: plane p contributes its bit only when
    * `p < $pExpr` (a column from a kv CTE deriving the plane count from
    * count(*) with pure INTEGER arithmetic — no float log2 whose ulp at
    * exact powers of two could disagree with the Scala side). Literals
    * are generated for all `maxPlanes`; prefix-stability of
    * planeComponent makes the first p planes identical at every scale. */
  private def bucketExprScaled(vec: String, maxPlanes: Int, seed: Long,
                               pExpr: String): String =
    (0 until maxPlanes).map { p =>
      s"(CASE WHEN $p < $pExpr AND round(list_dot_product($vec, ${planeList(p, seed)}), 9) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  val all: Map[String, String] = Map(

    // ------------------------------------------------------------ element-wise
    "q_map_project" ->
      s"""SELECT l_orderkey, l_linenumber,
         |       ${c("l_extendedprice * (1 - l_discount)")} AS revenue_cents
         |FROM lineitem""".stripMargin,

    "q_filter" ->
      """SELECT * FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1996-12-31 00:00:00' AND l_quantity < 24""".stripMargin,

    "q_flatmap_wc" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word FROM documents
        |) WHERE length(word) > 0 GROUP BY word""".stripMargin,

    "q_partition" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       CASE WHEN l_quantity < 10 THEN 0 WHEN l_quantity < 30 THEN 1 ELSE 2 END AS bucket
        |FROM lineitem""".stripMargin,

    "q_regex_extract" ->
      """SELECT event_id, TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k
        |FROM events""".stripMargin,

    "q_tostring_kv" ->
      """SELECT event_id, event_type || ',' || CAST(user_id AS VARCHAR) AS kv FROM events""",

    "q_with_keys" ->
      """SELECT user_id AS key, event_id AS value FROM events""",

    // ------------------------------------------------------------ aggregations
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(floor(sum(l_quantity)) AS BIGINT) AS sum_qty,
         |       CAST(sum(${c("l_extendedprice")}) AS BIGINT) AS sum_base_cents,
         |       CAST(sum(${c("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS sum_disc_cents,
         |       CAST(sum(${c("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}) AS BIGINT) AS sum_charge_cents,
         |       round(avg(l_quantity), 4) AS avg_qty,
         |       round(avg(l_discount), 6) AS avg_disc,
         |       count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_count_global" -> "SELECT count(*) AS cnt FROM lineitem",

    "q_count_per_elem" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "q_minmax_per_key" ->
      s"""SELECT o_orderpriority, count(*) AS cnt,
         |       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
         |       CAST(sum(${c("o_totalprice")}) AS BIGINT) AS sum_cents,
         |       round(avg(o_totalprice), 4) AS avg_price
         |FROM orders GROUP BY 1""".stripMargin,

    "q_top_per_key" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders
        |) WHERE rn <= 3""".stripMargin,

    "q_latest_per_key" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "q_distinct" -> "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "q_distinct_rep" ->
      """SELECT c_mktsegment, c_custkey, c_name FROM (
        |  SELECT c_mktsegment, c_custkey, c_name,
        |         row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey ASC) AS rn
        |  FROM customer
        |) WHERE rn = 1""".stripMargin,

    "q_mean_per_key" ->
      """SELECT event_type, round(avg(value), 4) AS avg_value, count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,

    "q_quantile_exact" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY 1""".stripMargin,

    // estimator / sample CONTRACT oracles (see Queries scaladoc): DuckDB
    // pins the key set / sample size and asserts the property everywhere
    "q_approx_unique" ->
      "SELECT l_returnflag, true AS within_rsd FROM lineitem GROUP BY 1",

    "q_kmv_unique" ->
      "SELECT l_returnflag, true AS within_bound FROM lineitem GROUP BY 1",

    // CMS contract: est >= exact always; est <= exact + eps*N at the
    // configured confidence — pinned true per present event type
    "q_cms_freq" ->
      "SELECT event_type AS item, true AS within_eps FROM events GROUP BY 1",

    "q_sample_any" ->
      "SELECT CAST(10 AS BIGINT) AS n_sampled, true AS members_ok",

    "q_reservoir" ->
      """SELECT CAST(15 AS BIGINT) AS n_sampled, true AS distinct_ok,
        |       true AS members_ok""".stripMargin,

    "q_sample_residue" ->
      "SELECT event_id, user_id, event_type FROM events WHERE event_id % 10 = 0",

    "q_gbk_list" ->
      """SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS names
        |FROM nation GROUP BY 1""".stripMargin,

    "q_group_batches" ->
      """SELECT event_type, batch_id, count(*) AS batch_size FROM (
        |  SELECT event_type,
        |         CAST(floor((row_number() OVER (PARTITION BY event_type ORDER BY event_id ASC) - 1) / 100) AS BIGINT) AS batch_id
        |  FROM events
        |) GROUP BY 1, 2""".stripMargin,

    "q_sort_values" ->
      """SELECT l_orderkey,
        |       array_to_string(list(CAST(floor(l_quantity) AS BIGINT)
        |                            ORDER BY l_linenumber ASC, floor(l_quantity) ASC), ',') AS qtys
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_typed_meanmax" ->
      """SELECT event_type, round(avg(value), 4) AS avg_value, max(value) AS max_value
        |FROM events GROUP BY 1""".stripMargin,

    "q_stateful_batches" ->
      """WITH c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1)
        |SELECT event_type, CAST(100 AS INT) AS batch_size
        |FROM c, UNNEST(range(cnt // 100)) AS t(i)
        |UNION ALL
        |SELECT event_type, CAST(cnt % 100 AS INT) AS batch_size
        |FROM c WHERE cnt % 100 > 0""".stripMargin,

    "q_argmax" ->
      """SELECT event_type, event_id AS top_event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    // ------------------------------------------------------------ joins
    "q_join_inner" ->
      """SELECT o_orderkey, o_custkey AS custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey AS custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,

    "q_join_full" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |           FROM customer WHERE c_nationkey < 10 GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |           FROM supplier WHERE s_nationkey > 5 GROUP BY 1)
        |SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM c FULL JOIN s ON c.nationkey = s.nationkey""".stripMargin,

    "q_cogbk" ->
      """WITH n AS (SELECT n_nationkey AS nationkey,
        |                  array_to_string(list_sort(list(n_name)), ',') AS nation_names
        |           FROM nation GROUP BY 1),
        |     c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT COALESCE(n.nationkey, c.nationkey, s.nationkey) AS nationkey,
        |       COALESCE(nation_names, '') AS nation_names,
        |       COALESCE(n_cust, 0) AS n_cust,
        |       COALESCE(n_supp, 0) AS n_supp
        |FROM n FULL JOIN c ON n.nationkey = c.nationkey
        |       FULL JOIN s ON COALESCE(n.nationkey, c.nationkey) = s.nationkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey AS custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey AS custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,

    // bloom prefilter is EXACT (false positives removed by the semi-join),
    // so the oracle is the plain semi-join aggregate
    "q_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |       CAST(floor(sum(l_quantity)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,

    "q_broadcast_join" ->
      s"""SELECT p_brand,
         |       CAST(sum(${c("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_cents,
         |       count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1""".stripMargin,

    "q_flatten" ->
      "SELECT r_name AS name FROM region UNION ALL SELECT n_name AS name FROM nation",

    // Independent implementation: DuckDB's NATIVE ASOF LEFT JOIN replays the
    // union+window formulation — a genuinely different algorithm agreeing on
    // every row (incl. null rows for clicks before the user's first purchase).
    "q_asof_join" ->
      s"""WITH clicks AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
         |                FROM events WHERE event_type = 'click'),
         |purchases AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS asof_ts,
         |                     max(${c("value")}) AS purchase_cents
         |              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         |SELECT c.event_id, c.user_id, c.click_ts, p.asof_ts, p.purchase_cents
         |FROM clicks c ASOF LEFT JOIN purchases p
         |  ON c.user_id = p.user_id AND c.click_ts >= p.asof_ts""".stripMargin,

    // the time-sliced plan answers the same question as q_asof_join —
    // the oracle is the same native ASOF (result identity is the point)
    "q_asof_sliced" ->
      s"""WITH clicks AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
         |                FROM events WHERE event_type = 'click'),
         |purchases AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS asof_ts,
         |                     max(${c("value")}) AS purchase_cents
         |              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         |SELECT c.event_id, c.user_id, c.click_ts, p.asof_ts, p.purchase_cents
         |FROM clicks c ASOF LEFT JOIN purchases p
         |  ON c.user_id = p.user_id AND c.click_ts >= p.asof_ts""".stripMargin,

    // forward: DuckDB native ASOF with the mirrored (<=) condition
    "q_asof_forward" ->
      s"""WITH clicks AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
         |                FROM events WHERE event_type = 'click'),
         |purchases AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS asof_ts,
         |                     max(${c("value")}) AS purchase_cents
         |              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         |SELECT c.event_id, c.user_id, c.click_ts, p.asof_ts, p.purchase_cents
         |FROM clicks c ASOF LEFT JOIN purchases p
         |  ON c.user_id = p.user_id AND c.click_ts <= p.asof_ts""".stripMargin,

    // nearest: both native ASOF passes joined on the click id, identical
    // tie-to-backward pick on epoch-micros distances
    "q_asof_nearest" ->
      s"""WITH clicks AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
         |                FROM events WHERE event_type = 'click'),
         |purchases AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS asof_ts,
         |                     max(${c("value")}) AS purchase_cents
         |              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         |b AS (SELECT c.event_id, p.asof_ts AS b_ts, p.purchase_cents AS b_c
         |      FROM clicks c ASOF LEFT JOIN purchases p
         |        ON c.user_id = p.user_id AND c.click_ts >= p.asof_ts),
         |f AS (SELECT c.event_id, p.asof_ts AS f_ts, p.purchase_cents AS f_c
         |      FROM clicks c ASOF LEFT JOIN purchases p
         |        ON c.user_id = p.user_id AND c.click_ts <= p.asof_ts)
         |SELECT c.event_id, c.user_id, c.click_ts,
         |       CASE WHEN b_ts IS NULL THEN f_ts WHEN f_ts IS NULL THEN b_ts
         |            WHEN epoch_us(c.click_ts) - epoch_us(b_ts)
         |                 <= epoch_us(f_ts) - epoch_us(c.click_ts) THEN b_ts
         |            ELSE f_ts END AS asof_ts,
         |       CASE WHEN b_ts IS NULL THEN f_c WHEN f_ts IS NULL THEN b_c
         |            WHEN epoch_us(c.click_ts) - epoch_us(b_ts)
         |                 <= epoch_us(f_ts) - epoch_us(c.click_ts) THEN b_c
         |            ELSE f_c END AS purchase_cents
         |FROM clicks c JOIN b USING (event_id) JOIN f USING (event_id)""".stripMargin,

    // The oracle runs the PLAIN inequality join (fine at sf0.01); the Spark
    // side runs the bucketed equi-join plan — same result, scale-safe plan.
    "q_range_join" ->
      s"""WITH iv AS (SELECT event_id AS interval_id, epoch_us(CAST(ts AS TIMESTAMP)) AS lo,
         |                   epoch_us(CAST(ts AS TIMESTAMP)) + 14400000000 AS hi
         |            FROM events WHERE event_type = 'signup' AND event_id % 7 = 0),
         |pt AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS p, ${c("value")} AS cents
         |       FROM events WHERE event_type = 'click')
         |SELECT interval_id, count(*) AS n_clicks, CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM iv JOIN pt ON pt.p >= iv.lo AND pt.p < iv.hi
         |GROUP BY 1""".stripMargin,

    // Same plain inequality join; the Spark side writes the NAIVE join and
    // the RangeJoinRewrite optimizer rule rebuilds it into the bucketed plan
    "q_range_rewrite" ->
      s"""WITH iv AS (SELECT event_id AS interval_id, epoch_us(CAST(ts AS TIMESTAMP)) AS lo,
         |                   epoch_us(CAST(ts AS TIMESTAMP)) + 7200000000 AS hi
         |            FROM events WHERE event_type = 'signup' AND event_id % 5 = 0),
         |pt AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS p, ${c("value")} AS cents
         |       FROM events WHERE event_type = 'click')
         |SELECT interval_id, count(*) AS n_clicks, CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM iv JOIN pt ON pt.p >= iv.lo AND pt.p < iv.hi
         |GROUP BY 1""".stripMargin,

    // The TIMESTAMP-typed naive range join (the Spark side writes raw
    // `ts` comparisons, no epoch conversion; the rule threads epochMicros
    // itself) — DuckDB compares the timestamps directly
    "q_range_rewrite_ts" ->
      s"""WITH iv AS (SELECT event_id AS interval_id, CAST(ts AS TIMESTAMP) AS lo_ts,
         |                   CAST(ts AS TIMESTAMP) + INTERVAL 3 HOUR AS hi_ts
         |            FROM events WHERE event_type = 'signup' AND event_id % 3 = 0),
         |pt AS (SELECT CAST(ts AS TIMESTAMP) AS p_ts, ${c("value")} AS cents
         |       FROM events WHERE event_type = 'click')
         |SELECT interval_id, count(*) AS n_clicks, CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM iv JOIN pt ON pt.p_ts >= iv.lo_ts AND pt.p_ts < iv.hi_ts
         |GROUP BY 1""".stripMargin,

    // Bit-exact replay of the Morton interleave (bits=20) with plain
    // shift/mask SQL — Spark's codegen'd MortonCode vs DuckDB arithmetic.
    "q_zorder_key" -> {
      val terms = (0 until 20).flatMap { i =>
        Seq(s"(((user_id >> $i) & 1) << ${2 * i})",
            s"((((event_id % 1048576) >> $i) & 1) << ${2 * i + 1})")
      }
      s"SELECT event_id, CAST(${terms.mkString(" | ")} AS BIGINT) AS zval FROM events"
    },

    "q_interval_join" ->
      """WITH a AS (SELECT event_id AS a_id, epoch_us(CAST(ts AS TIMESTAMP)) AS a_lo,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) + 7200000000 AS a_hi
        |           FROM events WHERE event_type = 'signup' AND event_id % 11 = 0),
        |b AS (SELECT event_id AS b_id, epoch_us(CAST(ts AS TIMESTAMP)) AS b_lo,
        |             epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS b_hi
        |      FROM events WHERE event_type = 'error' AND event_id % 13 = 0)
        |SELECT a_id, count(*) AS n_overlaps, min(b_id) AS first_b
        |FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
        |GROUP BY 1""".stripMargin,

    // the Spark side writes the NAIVE overlap join; the optimizer rule
    // rebuilds it into the bucketed plan (q_range_rewrite's sibling)
    "q_overlap_rewrite" ->
      """WITH a AS (SELECT event_id AS a_id, epoch_us(CAST(ts AS TIMESTAMP)) AS a_lo,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) + 7200000000 AS a_hi
        |           FROM events WHERE event_type = 'signup' AND event_id % 9 = 0),
        |b AS (SELECT event_id AS b_id, epoch_us(CAST(ts AS TIMESTAMP)) AS b_lo,
        |             epoch_us(CAST(ts AS TIMESTAMP)) + 3600000000 AS b_hi
        |      FROM events WHERE event_type = 'error' AND event_id % 7 = 0)
        |SELECT a_id, count(*) AS n_overlaps, min(b_id) AS first_b
        |FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
        |GROUP BY 1""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier""".stripMargin,

    // ------------------------------------------------------------ windowing
    "q_window_fixed" ->
      s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart, event_type,
         |       count(*) AS n, CAST(sum(${c("value")}) AS BIGINT) AS sum_value_cents
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q_window_sliding" ->
      """SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) - k * INTERVAL '15 minutes' AS wstart,
        |       count(*) AS n
        |FROM events, (VALUES (0), (1), (2), (3)) AS t(k)
        |GROUP BY 1""".stripMargin,

    "q_window_session" ->
      """SELECT user_id, min(tsu) AS session_start, count(*) AS n_events FROM (
        |  SELECT user_id, tsu,
        |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM (
        |    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu,
        |           CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |                  OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w >= INTERVAL '30 minutes'
        |                THEN 1 ELSE 0 END AS new_sess
        |    FROM events
        |    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |  )
        |) GROUP BY user_id, sess""".stripMargin,

    "q_window_calendar" ->
      """SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wstart,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    // WeeklyTeamScore: weeks(1, Thursday) = the raw 7-epoch-day grid
    "q_weekly_team_score" ->
      s"""SELECT make_timestamp((d - d % 7) * 86400000000) AS wstart, event_type,
        |       CAST(sum(cents) AS BIGINT) AS score_cents, count(*) AS n
        |FROM (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d, event_type,
        |             ${c("value")} AS cents FROM events)
        |GROUP BY 1, 2""".stripMargin,

    // Thursday-anchored fortnights = the raw 14-epoch-day grid (1970-01-01
    // is a Thursday): pure integer arithmetic, no calendar/TZ functions
    "q_window_weekly" ->
      """SELECT make_timestamp((d - d % 14) * 86400000000) AS wstart,
        |       make_timestamp((d - d % 14 + 14) * 86400000000) AS wend,
        |       event_type, count(*) AS n
        |FROM (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d, event_type
        |      FROM events)
        |GROUP BY 1, 2, 3""".stripMargin,

    // TopWikipediaSessions: 1h-gap sessions per user (same >= gap break as
    // q_window_session), session end = last edit + gap, top-3 sessions per
    // day-of-session-end with pinned tie-break (n DESC, user, start)
    "q_top_sessions" ->
      """WITH g AS (
        |  SELECT user_id, tsu,
        |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM (
        |    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu,
        |           CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |                  OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w >= INTERVAL '1 hour'
        |                THEN 1 ELSE 0 END AS new_sess
        |    FROM events
        |    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |  )
        |),
        |sess AS (
        |  SELECT user_id, min(tsu) AS session_start,
        |         max(tsu) + INTERVAL '1 hour' AS session_end,
        |         count(*) AS n_edits
        |  FROM g GROUP BY user_id, sess
        |),
        |r AS (
        |  SELECT CAST(date_trunc('day', session_end) AS TIMESTAMP) AS sday,
        |         user_id, session_start, session_end, n_edits,
        |         row_number() OVER (
        |           PARTITION BY date_trunc('day', session_end)
        |           ORDER BY n_edits DESC, user_id, session_start) AS rn
        |  FROM sess
        |)
        |SELECT sday, user_id, session_start, session_end, n_edits
        |FROM r WHERE rn <= 3""".stripMargin,

    "q_tfidf" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\W+')) AS w
        |  FROM documents),
        |wc AS (SELECT doc_id, w, count(*) AS cnt FROM words
        |       WHERE length(w) > 0 GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(cnt) AS total FROM wc GROUP BY 1),
        |dfreq AS (SELECT w, count(*) AS dwith FROM wc GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents)
        |SELECT wc.doc_id AS doc_id, wc.w AS word,
        |       round((cnt / CAST(total AS DOUBLE)) *
        |             ln(CAST(nd AS DOUBLE) / dwith), 6) AS tfidf
        |FROM wc JOIN tot USING (doc_id) JOIN dfreq USING (w) CROSS JOIN n
        |WHERE wc.doc_id % 50 = 0""".stripMargin,

    "q_autocomplete" ->
      """WITH words AS (
        |  SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS w FROM documents),
        |counts AS (SELECT w, count(*) AS cnt FROM words
        |           WHERE length(w) > 0 GROUP BY 1),
        |pfx AS (SELECT substr(w, 1, CAST(i AS INT)) AS prefix, w, cnt
        |        FROM counts, UNNEST(range(1, length(w) + 1)) AS t(i)),
        |r AS (SELECT prefix, w, cnt,
        |             row_number() OVER (PARTITION BY prefix
        |                                ORDER BY cnt DESC, w DESC) AS rn
        |      FROM pfx)
        |SELECT prefix, w AS word, CAST(cnt AS BIGINT) AS cnt
        |FROM r WHERE rn <= 3""".stripMargin,

    // TrafficMaxLaneFlow: 4 lanes per reading x 4 overlapping sliding
    // windows; per (window, station) the max-flow lane with its payload,
    // ties pinned (lane_flow, lane_idx, event_id) DESC
    "q_traffic_max_lane" ->
      """WITH lanes AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |           - k.k * INTERVAL '15 minutes' AS wstart,
        |         user_id % 25 AS station, event_id, l.lane_idx,
        |         (event_id * l.lane_idx) % 997 AS lane_flow
        |  FROM events, (VALUES (0), (1), (2), (3)) AS k(k),
        |       (VALUES (1), (2), (3), (4)) AS l(lane_idx)),
        |r AS (
        |  SELECT wstart, station, lane_flow, lane_idx, event_id,
        |         row_number() OVER (PARTITION BY wstart, station
        |             ORDER BY lane_flow DESC, lane_idx DESC, event_id DESC) AS rn
        |  FROM lanes)
        |SELECT wstart, station, lane_flow AS lane_max_flow,
        |       'lane' || lane_idx AS lane, event_id
        |FROM r WHERE rn = 1""".stripMargin,

    // TrafficRoutes: per (window, route) avg speed + slowdownEvent =
    // slowdowns >= 2*speedups, where ups/downs compare consecutive
    // readings per station in (ts, event_id) order; equal speeds count
    // as slowdowns (reference: lastSpeed < speed ? speedup : slowdown)
    "q_traffic_routes" ->
      s"""WITH ev AS (
         |  SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
         |           - k.k * INTERVAL '15 minutes' AS wstart,
         |         event_type AS route, user_id % 20 AS station, event_id,
         |         CAST(ts AS TIMESTAMP) AS tsu, ${c("value")} AS speed
         |  FROM events, (VALUES (0), (1), (2), (3)) AS k(k)),
         |cmp AS (
         |  SELECT wstart, route, speed,
         |         lag(speed) OVER (PARTITION BY wstart, route, station
         |                          ORDER BY tsu, event_id) AS prev
         |  FROM ev)
         |SELECT wstart, route,
         |       round(sum(speed) / CAST(count(*) AS DOUBLE), 6) AS avg_speed,
         |       CAST(sum(CASE WHEN prev IS NOT NULL AND speed > prev
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS speedups,
         |       CAST(sum(CASE WHEN prev IS NOT NULL AND speed <= prev
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS slowdowns,
         |       sum(CASE WHEN prev IS NOT NULL AND speed <= prev THEN 1 ELSE 0 END)
         |         >= 2 * sum(CASE WHEN prev IS NOT NULL AND speed > prev
         |                         THEN 1 ELSE 0 END) AS slowdown_event
         |FROM cmp GROUP BY 1, 2""".stripMargin,

    // WindowedWordCount: deterministic AddTimestampFn replay — event time =
    // 2026-01-01T00:00Z + ((doc_id*7919) % 7200) seconds (1767225600 epoch
    // seconds base, 10-min-grid aligned), fixed 10-minute windows, word
    // counts per (window, word)
    "q_windowed_wc" ->
      """SELECT make_timestamp((1767225600000000
        |         + ((doc_id * 7919) % 7200) * 1000000)
        |         // 600000000 * 600000000) AS wstart,
        |       word, count(*) AS n
        |FROM (SELECT doc_id,
        |             unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY 1, 2""".stripMargin,

    // ------------------------------------------------------------ LLM-pipeline ops
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS rep_id, count(*) AS copies
        |FROM documents GROUP BY 1""".stripMargin,

    // Incremental dedup: corpus = doc_id < 400 (digest store only), batch =
    // doc_id >= 400; keep = unseen in corpus AND batch representative
    "q_dedup_incr" ->
      """WITH corpus AS (SELECT md5(text) AS content_hash, min(doc_id) AS corpus_rep
        |                FROM documents WHERE doc_id < 400 GROUP BY 1),
        |b AS (SELECT doc_id, md5(text) AS content_hash
        |      FROM documents WHERE doc_id >= 400),
        |br AS (SELECT content_hash, min(doc_id) AS batch_rep FROM b GROUP BY 1)
        |SELECT b.doc_id, b.content_hash, c.corpus_rep, br.batch_rep,
        |       (c.corpus_rep IS NULL AND b.doc_id = br.batch_rep) AS keep
        |FROM b LEFT JOIN corpus c USING (content_hash)
        |JOIN br USING (content_hash)""".stripMargin,

    "q_dedup_minhash" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS s
        |       FROM w, UNNEST(range(1, len(words) - 1)) AS t(i)
        |       WHERE len(words) >= 3),
        |sig AS (SELECT doc_id, b.band AS band, min(md5(b.band || ':' || s)) AS minhash
        |        FROM sh, (VALUES (0), (1), (2), (3)) AS b(band) GROUP BY 1, 2)
        |SELECT band, minhash,
        |       array_to_string(list_sort(list(doc_id)), ',') AS ids,
        |       count(*) AS bucket_size
        |FROM sig GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+1], ' ') AS s
        |       FROM w, UNNEST(range(1, len(words))) AS t(i)
        |       WHERE len(words) >= 2),
        |capped AS (SELECT * FROM sh QUALIFY count(*) OVER (PARTITION BY s) <= 200),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |          FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b, round(n_inter / (sa.sz + sb.sz - n_inter), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE n_inter / (sa.sz + sb.sz - n_inter) >= 0.8""".stripMargin,

    // Full BM25 replay: same tokenization, exact n/avgdl (dl is integer-
    // valued so any summation order agrees bit-for-bit), 9-dp-rounded idf
    // (ln differs across libms only in the last ulp), Lucene idf variant,
    // k1=1.2 b=0.75, 6-dp score, (score DESC, doc_id ASC) top-10.
    "q_bm25" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents),
        |d AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl FROM w),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
        |tf AS (SELECT doc_id, dl, t AS term, CAST(count(*) AS DOUBLE) AS tf
        |       FROM d, UNNEST(toks) AS u(t)
        |       WHERE t IN ('join', 'filter', 'dup')
        |       GROUP BY 1, 2, 3),
        |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |              round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)), 9)
        |                * tf.tf * 2.2
        |                / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl)) AS s
        |       FROM tf JOIN df USING (term) CROSS JOIN stats)
        |SELECT doc_id, round(sum(s), 6) AS score
        |FROM sc GROUP BY 1
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    // Batch form: same statistics, idf from a per-term aggregate (9-dp in
    // both engines), row_number top-5 per query with the (score DESC,
    // doc_id ASC) tiebreak of Similarity.topKByScore.
    "q_bm25_batch" ->
      """WITH q AS (SELECT CAST(query_id AS BIGINT) AS query_id, term FROM (VALUES
        |             (0, 'join'), (0, 'filter'), (0, 'dup'),
        |             (1, 'hash'), (1, 'scan'),
        |             (2, 'customer'), (2, 'slow'), (2, 'batch')) AS t(query_id, term)),
        |w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents),
        |d AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl FROM w),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
        |tf AS (SELECT doc_id, dl, t AS term, CAST(count(*) AS DOUBLE) AS tf
        |       FROM d, UNNEST(toks) AS u(t)
        |       WHERE t IN (SELECT DISTINCT term FROM q)
        |       GROUP BY 1, 2, 3),
        |idf AS (SELECT term, round(ln(1 + (stats.n - df + 0.5) / (df + 0.5)), 9) AS idf
        |        FROM (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        |              FROM tf GROUP BY 1) CROSS JOIN stats),
        |sc AS (SELECT q.query_id, tf.doc_id,
        |              round(CAST(sum(idf.idf * tf.tf * 2.2
        |                / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))) AS DOUBLE), 6) AS score
        |       FROM tf JOIN idf USING (term) JOIN q USING (term) CROSS JOIN stats
        |       GROUP BY 1, 2)
        |SELECT query_id, doc_id, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY score DESC, doc_id ASC) AS rn
        |  FROM sc
        |) WHERE rn <= 5""".stripMargin,

    // Hybrid RRF: replay BOTH side rankings (BM25-batch top-10 — same CTEs
    // as q_bm25_batch — and brute-force cosine top-10 for vec_id < 3),
    // rank each with the (score DESC, doc_id ASC) tiebreak, fuse with
    // 1/(60 + rank), top-5 fused per query
    "q_hybrid_rrf" ->
      """WITH q AS (SELECT CAST(query_id AS BIGINT) AS query_id, term FROM (VALUES
        |             (0, 'join'), (0, 'filter'), (0, 'dup'),
        |             (1, 'hash'), (1, 'scan'),
        |             (2, 'customer'), (2, 'slow'), (2, 'batch')) AS t(query_id, term)),
        |w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents),
        |d AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl FROM w),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
        |tf AS (SELECT doc_id, dl, t AS term, CAST(count(*) AS DOUBLE) AS tf
        |       FROM d, UNNEST(toks) AS u(t)
        |       WHERE t IN (SELECT DISTINCT term FROM q)
        |       GROUP BY 1, 2, 3),
        |idf AS (SELECT term, round(ln(1 + (stats.n - df + 0.5) / (df + 0.5)), 9) AS idf
        |        FROM (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        |              FROM tf GROUP BY 1) CROSS JOIN stats),
        |bm_sc AS (SELECT q.query_id, tf.doc_id,
        |              round(CAST(sum(idf.idf * tf.tf * 2.2
        |                / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))) AS DOUBLE), 6) AS score
        |       FROM tf JOIN idf USING (term) JOIN q USING (term) CROSS JOIN stats
        |       GROUP BY 1, 2),
        |bm_top AS (SELECT query_id, doc_id, score,
        |                  row_number() OVER (PARTITION BY query_id
        |                      ORDER BY score DESC, doc_id ASC) AS rnk
        |           FROM bm_sc QUALIFY rnk <= 10),
        |aq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
        |       FROM embeddings WHERE vec_id < 3),
        |ac AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
        |an_sc AS (SELECT query_id, doc_id,
        |                 round(list_dot_product(cvec, qvec)
        |                   / (sqrt(list_dot_product(cvec, cvec)) * sqrt(list_dot_product(qvec, qvec))),
        |                   6) AS score
        |          FROM ac, aq),
        |an_top AS (SELECT query_id, doc_id, score,
        |                  row_number() OVER (PARTITION BY query_id
        |                      ORDER BY score DESC, doc_id ASC) AS rnk
        |           FROM an_sc QUALIFY rnk <= 10),
        |fused AS (SELECT query_id, doc_id,
        |                 round(sum(1.0 / (60 + rnk)), 9) AS score
        |          FROM (SELECT query_id, doc_id, rnk FROM bm_top
        |                UNION ALL SELECT query_id, doc_id, rnk FROM an_top)
        |          GROUP BY 1, 2)
        |SELECT query_id, doc_id, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY score DESC, doc_id ASC) AS rn
        |  FROM fused
        |) WHERE rn <= 5""".stripMargin,

    // Same tokenization convention as the other shingle oracles (lower +
    // \s+ split with empty leading token preserved, 1-based inclusive
    // slices); DISTINCT per doc mirrors WordShingles' first-occurrence dedup.
    "q_span_dedup" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+7], ' ') AS s
        |       FROM w, UNNEST(range(1, len(words) - 6)) AS t(i)
        |       WHERE len(words) >= 8),
        |freq AS (SELECT s, count(*) AS ndocs FROM sh GROUP BY 1),
        |per AS (SELECT doc_id, count(*) AS n_spans,
        |               CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
        |        FROM sh JOIN freq USING (s) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
        |       coalesce(n_dup_spans, 0) AS n_dup_spans,
        |       round(coalesce(n_dup_spans, 0) / greatest(coalesce(n_spans, 0), 1), 6) AS dup_frac
        |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id""".stripMargin,

    "q_dedup_clusters" ->
      """WITH RECURSIVE
        |w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+1], ' ') AS s
        |       FROM w, UNNEST(range(1, len(words))) AS t(i)
        |       WHERE len(words) >= 2),
        |capped AS (SELECT * FROM sh QUALIFY count(*) OVER (PARTITION BY s) <= 200),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |          FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM inter
        |          JOIN sizes sa ON sa.doc_id = id_a
        |          JOIN sizes sb ON sb.doc_id = id_b
        |          WHERE n_inter / (sa.sz + sb.sz - n_inter) >= 0.8),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach AS (SELECT src, dst FROM edges
        |          UNION
        |          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        |SELECT src AS doc_id, min(dst) AS cluster_id
        |FROM (SELECT src, dst FROM reach UNION SELECT src, src FROM edges)
        |GROUP BY 1""".stripMargin,

    "q_embed_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
        |scored AS (
        |  SELECT query_id, corpus_id,
        |         round(list_dot_product(cvec, qvec)
        |               / (sqrt(list_dot_product(cvec, cvec)) * sqrt(list_dot_product(qvec, qvec))),
        |               6) + 0.0 AS score
        |  FROM c, q)
        |SELECT query_id, corpus_id, score FROM (
        |  SELECT query_id, corpus_id, score,
        |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id ASC) AS rn
        |  FROM scored
        |) WHERE rn <= 5""".stripMargin,

    // Property oracles: the Spark side emits the estimator's accuracy
    // contract as booleans (see Queries.qApproxQuantiles/qMpQuantiles);
    // DuckDB pins the key set and asserts the contract holds for every key.
    "q_approx_quant" ->
      """SELECT l_returnflag, true AS q25_ok, true AS q50_ok, true AS q75_ok, true AS q90_ok
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_mp_quantiles" ->
      """SELECT l_returnflag, true AS min_ok, true AS q25_ok, true AS q50_ok,
        |       true AS q75_ok, true AS max_ok
        |FROM lineitem GROUP BY 1""".stripMargin,

    // SimHash locality property: DuckDB independently computes the verified
    // near-dup pair set (bigram Jaccard >= 0.8, same CTE as q_ngram_jaccard)
    // and asserts every such pair is Hamming-close (the Spark side emits the
    // binomial-tail bound <= 24 per pair — mean + 5σ at the J = 0.8
    // admission floor, Queries.scala q_simhash).
    "q_simhash" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+1], ' ') AS s
        |       FROM w, UNNEST(range(1, len(words))) AS t(i)
        |       WHERE len(words) >= 2),
        |capped AS (SELECT * FROM sh QUALIFY count(*) OVER (PARTITION BY s) <= 200),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |          FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b, true AS hamming_close
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE n_inter / (sa.sz + sb.sz - n_inter) >= 0.8
        |  AND sa.sz >= 10 AND sb.sz >= 10""".stripMargin,

    // Full replay of the hyperplane-LSH near-dup pipeline: identical plane
    // matrix (literals above), identical rounded sign test, exact cosine
    // verification within buckets.
    // Full replay of SemDeDup's oracle path: md5-sampled seed centroids,
    // 9-dp rounded nearest-centroid assignment (same CTEs as q_ivf_ann),
    // within-cell pairs at rounded cosine >= 0.3, min-id dup_of verdict.
    "q_semdedup" ->
      """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |n AS (SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
        |kv AS (SELECT least(
        |         least(65536, greatest(1, CAST(ceil(c.n / 125.0) AS BIGINT))),
        |         (SELECT min(CAST(1 AS BIGINT) << i)
        |          FROM (SELECT unnest(range(0, 17)) AS i)
        |          WHERE (CAST(1 AS BIGINT) << i) * (CAST(1 AS BIGINT) << i) >= c.n)
        |       ) AS k
        |       FROM (SELECT count(*) AS n FROM n) c),
        |cent AS (SELECT cell, cvec, cnorm FROM (
        |    SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS cell,
        |           vec AS cvec, sqrt(list_dot_product(vec, vec)) AS cnorm
        |    FROM v), kv WHERE cell < kv.k),
        |asgn AS (SELECT n.id, n.vec, n.nrm, cent.cell,
        |                round(-list_dot_product(n.vec, cent.cvec) / (n.nrm * cent.cnorm), 9) AS negcos
        |         FROM n CROSS JOIN cent),
        |cellof AS (SELECT id, vec, nrm, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY negcos, cell) AS rn FROM asgn
        |  ) WHERE rn = 1),
        |dup AS (SELECT a.id AS id, min(b.id) AS dup_of
        |        FROM cellof a JOIN cellof b ON a.cell = b.cell AND b.id < a.id
        |        WHERE round(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm), 6) >= 0.3
        |        GROUP BY a.id)
        |SELECT c.id, CAST(c.cell AS INT) AS cell, dup_of, dup_of IS NULL AS keep
        |FROM cellof c LEFT JOIN dup ON dup.id = c.id""".stripMargin,

    "q_embed_neardup" ->
      s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         |kv AS (SELECT coalesce(min(p), 24) AS p
         |       FROM (SELECT unnest(range(6, 25)) AS p) ps,
         |            (SELECT count(*) AS n FROM v) c
         |       WHERE (CAST(1 AS BIGINT) << p) * 32 >= c.n),
         |b AS (SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm,
         |             ${bucketExprScaled("vec", 24, 42L, "kv.p")} AS bucket
         |      FROM v, kv)
         |SELECT a.id AS id_a, c.id AS id_b,
         |       round(list_dot_product(a.vec, c.vec) / (a.nrm * c.nrm), 6) AS cos
         |FROM b a JOIN b c ON a.bucket = c.bucket AND a.id < c.id
         |WHERE list_dot_product(a.vec, c.vec) / (a.nrm * c.nrm) >= 0.3""".stripMargin,

    // char-trigram self-LM replayed in full: same trigram grid, same
    // relative frequencies; ln noise absorbed by the 6dp round. The
    // POPULATION-DERIVED vocab cap (maxVocabFor: docs clamped to
    // [4096, 65536]) is re-derived here from count(*) and the top-N
    // selection + OOV floor replayed, so a derivation drift between the
    // engines breaks the hash — at test SFs the cap exceeds the actual
    // vocabulary (~400 trigrams), keeping values identical to the
    // uncapped model while gating the capped CODE PATH end to end
    "q_lm_score" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        |cap AS (SELECT LEAST(65536, GREATEST(4096, count(*))) AS mv FROM documents),
        |tri AS (SELECT doc_id, substr(t, CAST(i AS INT), 3) AS tri
        |        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        |              FROM d WHERE len(t) >= 3)),
        |m AS (SELECT tri, count(*) AS cnt FROM tri GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM m),
        |kept AS (SELECT tri, cnt FROM
        |           (SELECT tri, cnt,
        |                   row_number() OVER (ORDER BY cnt DESC, tri ASC) AS rn
        |            FROM m), cap
        |         WHERE rn <= mv),
        |lp AS (SELECT tri, ln(CAST(cnt AS DOUBLE) / total) AS logp FROM kept, tot)
        |SELECT doc_id,
        |       round(avg(COALESCE(logp, ln(1.0 / (SELECT total FROM tot)))), 6)
        |         AS lm_score,
        |       count(*) AS n_tri
        |FROM tri LEFT JOIN lp USING (tri) GROUP BY 1""".stripMargin,

    // context-window chunking replayed in full: same token grid, same
    // integer chunk-boundary arithmetic (stride 24, size 32)
    "q_chunk_docs" ->
      """WITH d AS (SELECT doc_id,
        |                  CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |                       ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |           FROM documents),
        |x AS (SELECT doc_id, t,
        |             -- COALESCE: greatest() NULL handling differs across DuckDB
        |             -- versions (skip vs propagate); pin the Spark behavior
        |             -- (a NULL text still yields one chunk) independent of it
        |             greatest(CAST(floor((COALESCE(len(t), 0) + 24 - 32 - 1) / 24.0) AS INT), 0) AS m
        |      FROM d),
        |s AS (SELECT doc_id, t, unnest(generate_series(0, m)) AS i FROM x)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |       CAST(len(list_slice(t, i*24 + 1, i*24 + 32)) AS INT) AS n_tok,
        |       array_to_string(list_slice(t, i*24 + 1, i*24 + 32), ' ') AS chunk_text
        |FROM s""".stripMargin,

    // int8 quantization replayed in full (floor(x+0.5) grid over
    // float-widened doubles); the reconstruction bound stays a contract
    // boolean (scale/2 by construction)
    "q_embed_quant" ->
      """WITH e AS (SELECT vec_id,
        |                  CAST(embedding AS DOUBLE[]) AS v,
        |                  CAST(list_min(embedding) AS DOUBLE) AS lo,
        |                  CAST(list_max(embedding) AS DOUBLE) AS hi
        |           FROM embeddings),
        |q AS (SELECT vec_id,
        |             list_transform(v, x -> CASE WHEN hi = lo THEN 0
        |               ELSE CAST(floor((x - lo) * 255 / (hi - lo) + 0.5) AS INT) - 128
        |               END) AS ql
        |      FROM e)
        |SELECT vec_id, CAST(COALESCE(list_sum(ql), 0) AS BIGINT) AS q_sum,
        |       CAST(list_min(ql) AS INT) AS q_min,
        |       CAST(list_max(ql) AS INT) AS q_max,
        |       CAST(len(ql) AS INT) AS dims,
        |       true AS recon_ok
        |FROM q""".stripMargin,

    // Full replay of quantized ANN: the int8 grid, per-vector sums, the
    // correction-term dot, norms, and the (score DESC, corpus_id ASC)
    // top-5 — every pre-scale term is an exact integer, the scale algebra
    // mirrors the Spark expression tree term for term
    "q_quant_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |                  CAST(list_min(embedding) AS DOUBLE) AS lo,
        |                  CAST(list_max(embedding) AS DOUBLE) AS hi
        |           FROM embeddings),
        |z AS (SELECT vec_id, lo, (hi - lo)/255.0 AS sc,
        |             list_transform(v, x -> CASE WHEN hi = lo THEN 0
        |               ELSE CAST(floor((x - lo) * 255 / (hi - lo) + 0.5) AS INT) - 128
        |               END) AS ql
        |      FROM e),
        |w AS (SELECT vec_id, sc, ql,
        |             128*sc + lo AS t,
        |             sc*CAST(list_sum(ql) AS DOUBLE) AS g,
        |             CAST(len(ql) AS DOUBLE) AS d
        |      FROM z),
        |n AS (SELECT vec_id, sc, ql, t, g, d,
        |             sqrt(sc*sc*list_dot_product(ql, ql) + g*t + g*t + d*t*t) AS nrm
        |      FROM w),
        |cand AS (SELECT c.vec_id AS corpus_id, qv.vec_id AS query_id,
        |                round((c.sc*qv.sc*list_dot_product(c.ql, qv.ql)
        |                       + c.g*qv.t + qv.g*c.t + c.d*c.t*qv.t)
        |                      / (c.nrm * qv.nrm), 6) + 0.0 AS score
        |         FROM n c, n qv WHERE qv.vec_id < 5)
        |SELECT query_id, corpus_id, score FROM (
        |  SELECT query_id, corpus_id, score,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY score DESC, corpus_id ASC) AS rn
        |  FROM cand) WHERE rn <= 5""".stripMargin,

    // Full replay of multi-table LSH ANN: per-table buckets (seeds 42, 43),
    // candidate union + dedup, exact cosine re-rank, top-5 per query with
    // the (score DESC, corpus_id ASC) tiebreak of Similarity.topKByScore.
    "q_lsh_ann" ->
      s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         |n AS (SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
         |b0 AS (SELECT id, vec, nrm, ${bucketExpr("vec", 6, 42L)} AS bucket FROM n),
         |b1 AS (SELECT id, vec, nrm, ${bucketExpr("vec", 6, 43L)} AS bucket FROM n),
         |cand AS (
         |  SELECT q.id AS query_id, c.id AS corpus_id,
         |         round(list_dot_product(c.vec, q.vec) / (c.nrm * q.nrm), 6) + 0.0 AS score
         |  FROM b0 c JOIN b0 q ON c.bucket = q.bucket AND q.id < 5
         |  UNION
         |  SELECT q.id AS query_id, c.id AS corpus_id,
         |         round(list_dot_product(c.vec, q.vec) / (c.nrm * q.nrm), 6) + 0.0 AS score
         |  FROM b1 c JOIN b1 q ON c.bucket = q.bucket AND q.id < 5)
         |SELECT query_id, corpus_id, score FROM (
         |  SELECT query_id, corpus_id, score,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY score DESC, corpus_id ASC) AS rn
         |  FROM cand
         |) WHERE rn <= 5""".stripMargin,

    // Full replay of IVF ANN: md5-ordered centroid sample (engine-neutral
    // hash), rounded nearest-centroid assignment, nprobe=4 probes, exact
    // cosine re-rank, top-5 — mirrors Similarity.ivfTopK step for step.
    "q_ivf_ann" ->
      """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |n AS (SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
        |cent AS (SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS cell,
        |                vec AS cvec, sqrt(list_dot_product(vec, vec)) AS cnorm
        |         FROM v ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 16),
        |asgn AS (SELECT n.id, n.vec, n.nrm, cent.cell,
        |                round(-list_dot_product(n.vec, cent.cvec) / (n.nrm * cent.cnorm), 9) AS negcos
        |         FROM n CROSS JOIN cent),
        |corpus_cell AS (SELECT id, vec, nrm, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY negcos, cell) AS rn FROM asgn
        |  ) WHERE rn = 1),
        |probe AS (SELECT id, vec, nrm, cell FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY negcos, cell) AS rn
        |    FROM asgn WHERE id < 5
        |  ) WHERE rn <= 4),
        |cand AS (SELECT p.id AS query_id, c.id AS corpus_id,
        |                round(list_dot_product(c.vec, p.vec) / (c.nrm * p.nrm), 6) + 0.0 AS score
        |         FROM corpus_cell c JOIN probe p ON c.cell = p.cell)
        |SELECT query_id, corpus_id, score FROM (
        |  SELECT query_id, corpus_id, score,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY score DESC, corpus_id ASC) AS rn
        |  FROM cand
        |) WHERE rn <= 5""".stripMargin,

    // Full replay of product-quantization ANN: md5-ordered codebook sample
    // sliced into 8 subspaces of 8 dims, 9-dp rounded per-subspace argmin
    // encode (||s||² dropped — constant per (row, subspace)), reconstruction
    // = codewords concatenated in subspace order, scored as ONE sequential
    // dot (same fp addition order as Similarity.pqTopK), top-5 with the
    // (score DESC, corpus_id ASC) tiebreak.
    "q_pq_ann" ->
      """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS c,
        |                vec AS cvec
        |         FROM v ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 16),
        |sub AS (SELECT c, j, cvec[j*8+1 : j*8+8] AS cs
        |        FROM cent, UNNEST(range(0, 8)) AS t(j)),
        |subn AS (SELECT c, j, cs, list_dot_product(cs, cs) AS c2 FROM sub),
        |enc AS (SELECT id, j, code FROM (
        |    SELECT v.id, s.j, s.c AS code,
        |           row_number() OVER (PARTITION BY v.id, s.j
        |               ORDER BY round(s.c2/2 - list_dot_product(v.vec[s.j*8+1 : s.j*8+8], s.cs), 9),
        |                        s.c) AS rn
        |    FROM v, subn s) WHERE rn = 1),
        |recon AS (SELECT e.id AS corpus_id, flatten(list(s.cs ORDER BY e.j)) AS xhat
        |          FROM enc e JOIN subn s ON s.j = e.j AND s.c = e.code
        |          GROUP BY e.id),
        |rn2 AS (SELECT corpus_id, xhat, sqrt(list_dot_product(xhat, xhat)) AS xn FROM recon),
        |q AS (SELECT id AS query_id, vec AS qv, sqrt(list_dot_product(vec, vec)) AS qnrm
        |      FROM v WHERE id < 5)
        |SELECT query_id, corpus_id, score FROM (
        |  SELECT q.query_id, r.corpus_id,
        |         round(list_dot_product(q.qv, r.xhat) / (q.qnrm * r.xn), 6) + 0.0 AS score,
        |         row_number() OVER (PARTITION BY q.query_id
        |             ORDER BY round(list_dot_product(q.qv, r.xhat) / (q.qnrm * r.xn), 6) DESC,
        |                      r.corpus_id ASC) AS rn
        |  FROM rn2 r CROSS JOIN q) WHERE rn <= 5""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id, length(text) AS n_chars,
        |       CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |       round(len(regexp_extract_all(text, '[[:punct:]]'))
        |             / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS punct_ratio,
        |       round(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |                             x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x)))
        |             / CAST(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1) AS DOUBLE), 6) AS stopword_ratio,
        |       round(length(regexp_replace(text, '\s+', '', 'g'))
        |             / CAST(greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1) AS DOUBLE), 6) AS mean_word_len
        |FROM documents""".stripMargin,

    "q_lang_id" ->
      """WITH w AS (SELECT doc_id, text, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
        |profiles(lang, profile) AS (VALUES
        |  ('de', ['der','die','und','das','ist','nicht','mit','ein','ich']),
        |  ('en', ['the','and','of','to','is','you','that','was','with']),
        |  ('es', ['el','de','que','la','los','una','por','con','para']),
        |  ('fr', ['le','la','et','les','des','est','une','dans','que'])),
        |scores AS (SELECT doc_id, lang,
        |                  len(list_filter(words, x -> list_contains(profile, x))) AS score
        |           FROM w, profiles
        |           UNION ALL
        |           SELECT doc_id, 'zh' AS lang,
        |                  len(list_filter(['的','是','了','我','在','他','这','不','有'],
        |                                  c -> contains(text, c))) AS score
        |           FROM w)
        |SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS pred_lang FROM (
        |  SELECT doc_id, lang, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
        |  FROM scores
        |) WHERE rn = 1""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |       CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS approx_tokens
        |FROM documents""".stripMargin,

    // Real-BPE contract: DuckDB independently recomputes n_docs and the
    // global pretoken-run / non-whitespace-char bounds; the sandwich and
    // strictness booleans are Spark-checked (merge loop isn't SQL), with
    // exact merge arithmetic law-tested in TextMultimodalSpec.
    "q_bpe_count" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))) AS BIGINT) AS sum_lower,
        |       CAST(sum(length(regexp_replace(text, '\s+', '', 'g'))) AS BIGINT) AS sum_upper,
        |       TRUE AS bpe_within_bounds,
        |       TRUE AS merges_fired
        |FROM documents""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |       md5(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', '', 'g'), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents""".stripMargin,

    // full replay of the decode stub: width/height derive from the first
    // two bytes of md5(payload) — engine-neutral by design (see
    // Multimodal.StubCodec.imageDims)
    "q_mm_decode" ->
      """WITH h AS (SELECT doc_id, md5(text) AS x,
        |                  octet_length(encode(text)) AS nb FROM documents),
        |d AS (SELECT doc_id, nb,
        |             (strpos('0123456789abcdef', substr(x, 1, 1)) - 1) * 16
        |               + (strpos('0123456789abcdef', substr(x, 2, 1)) - 1) AS b0,
        |             (strpos('0123456789abcdef', substr(x, 3, 1)) - 1) * 16
        |               + (strpos('0123456789abcdef', substr(x, 4, 1)) - 1) AS b1
        |      FROM h)
        |SELECT doc_id AS media_id, CAST(64 + b0 % 193 AS INT) AS width,
        |       CAST(64 + b1 % 193 AS INT) AS height, CAST(nb AS BIGINT) AS n_bytes,
        |       FALSE AS decoded
        |FROM d""".stripMargin,
        // decoded is FALSE for every fixture row because documents.text is
        // UTF-8 prose, never a parseable image — ImageIO rejects it and the
        // stub fallback (whose dims the md5 arithmetic above replays) runs.
        // Real-PNG decode is covered by MultimodalSpec, which writes PNG
        // bytes in-test and checks true dims.

    // Full replay of the audio-decode FALLBACK header (fixture text is never
    // parseable audio): md5-derived sample rate/channels, byte count as
    // frames, integer-division duration, NULL pcm stats, decoded = FALSE.
    "q_mm_audio" ->
      """WITH h AS (SELECT doc_id, md5(text) AS x,
        |                  octet_length(encode(text)) AS nb FROM documents),
        |d AS (SELECT doc_id, nb,
        |             (strpos('0123456789abcdef', substr(x, 1, 1)) - 1) * 16
        |               + (strpos('0123456789abcdef', substr(x, 2, 1)) - 1) AS b0,
        |             (strpos('0123456789abcdef', substr(x, 3, 1)) - 1) * 16
        |               + (strpos('0123456789abcdef', substr(x, 4, 1)) - 1) AS b1
        |      FROM h),
        |s AS (SELECT doc_id, nb, 8000 * (1 + b0 % 6) AS sr, 1 + b1 % 2 AS ch FROM d)
        |SELECT doc_id AS media_id, CAST(sr AS INT) AS sample_rate,
        |       CAST(ch AS INT) AS channels, CAST(nb AS BIGINT) AS n_frames,
        |       CAST(nb * 1000000 // sr AS BIGINT) AS duration_us,
        |       CAST(NULL AS DOUBLE) AS rms, CAST(NULL AS DOUBLE) AS peak,
        |       CAST(nb AS BIGINT) AS n_bytes, FALSE AS decoded
        |FROM s""".stripMargin,

    "q_mm_frames" ->
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        |b AS (SELECT doc_id, n, UNNEST(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS blk FROM d)
        |SELECT doc_id AS media_id, CAST(blk // 2 AS INT) AS frame_idx,
        |       CAST(least(256, n - blk * 256) AS INT) AS frame_bytes,
        |       CAST(NULL AS INT) AS frame_w, CAST(NULL AS INT) AS frame_h
        |FROM b WHERE blk % 2 = 0
        |UNION ALL
        |-- planted golden MJPEG AVI (media_id -1): 3 fixed 649-byte 8x8 JPEG
        |-- frames, everyK=2 samples frames 0 and 2; dims come from Spark's
        |-- REAL ImageIO decode, pinned here as fixture constants
        |SELECT media_id, frame_idx, frame_bytes, frame_w, frame_h
        |FROM (VALUES (CAST(-1 AS BIGINT), CAST(0 AS INT), CAST(649 AS INT), CAST(8 AS INT), CAST(8 AS INT)),
        |             (CAST(-1 AS BIGINT), CAST(1 AS INT), CAST(649 AS INT), CAST(8 AS INT), CAST(8 AS INT)))
        |  AS g(media_id, frame_idx, frame_bytes, frame_w, frame_h)""".stripMargin,

    "q_mm_features" ->
      """SELECT doc_id AS media_id,
        |       CAST(CASE WHEN length(text) > 0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS feat_l1,
        |       16 AS dim
        |FROM documents""".stripMargin,

    "q_json_parse" ->
      """WITH p AS (
        |  SELECT event_type,
        |         CASE WHEN json_valid(props)
        |              THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
        |  FROM events)
        |SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(count(DISTINCT k) AS BIGINT) AS distinct_payloads
        |FROM p GROUP BY 1""".stripMargin,

    // curation CONTRACT oracles (see Queries scaladoc): the per-stratum
    // sample size is exact — min(n, |stratum|) — and the thinning rate
    // check is a fixed property of the dataset the oracle pins true
    "q_stratified_sample" ->
      """SELECT lang, least(100, count(*)) AS n_sampled,
        |       true AS distinct_ok, true AS members_ok
        |FROM documents GROUP BY 1""".stripMargin,

    // det_kept: DuckDB independently recomputes the kept count for the
    // deterministic fraction-0.0/1.0 strata ('error' drops all, 'purchase'
    // keeps all); mid fractions are the -1 sentinel + Spark-checked band
    "q_stratified_thin" ->
      """SELECT event_type, true AS rate_ok,
        |       CAST(CASE event_type WHEN 'purchase' THEN count(*)
        |                            WHEN 'error' THEN 0
        |                            ELSE -1 END AS BIGINT) AS det_kept
        |FROM events GROUP BY 1""".stripMargin,

    // domain-mix: target_tok and full_epochs are pure corpus arithmetic —
    // integer weights over wsum=100 (exact in double, order-independent),
    // budget = 3/2 the observed token mass (integer division) — replayed
    // bit-for-bit; the achieved-mass 5σ band stays a Spark-checked boolean
    "q_domain_mix" ->
      """WITH nt AS (SELECT lang, CASE WHEN length(trim(text)) = 0 THEN 0
        |                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS t
        |            FROM documents),
        |tot AS (SELECT (CAST(sum(t) AS BIGINT) * 3) // 2 AS budget FROM nt),
        |m AS (SELECT lang, CAST(sum(t) AS BIGINT) AS mass FROM nt GROUP BY 1),
        |w(lang, wt) AS (VALUES ('en', 50.0), ('de', 20.0), ('fr', 15.0),
        |                       ('es', 10.0), ('zh', 5.0))
        |SELECT m.lang,
        |       CAST(floor(w.wt / 100.0 * tot.budget) AS BIGINT) AS target_tok,
        |       CAST(floor(CAST(floor(w.wt / 100.0 * tot.budget) AS BIGINT)
        |                  * 1.0 / m.mass) AS BIGINT) AS full_epochs,
        |       true AS mass_ok
        |FROM m JOIN w ON m.lang = w.lang CROSS JOIN tot""".stripMargin,

    // hash-split contract: three splits, 5σ rate bands + exact coverage
    "q_hash_split" ->
      """SELECT * FROM (VALUES ('test', true, true), ('train', true, true),
        |                      ('val', true, true))
        |       AS t(split, rate_ok, coverage_ok)""".stripMargin,

    // incremental MinHash-LSH: full relational replay — same min-md5 band
    // signatures as q_dedup_minhash, store from the %5<>0 corpus, verdict
    // joins for the %5=0 batch (shingle-less docs keep by the left joins)
    "q_minhash_incr" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS s
        |       FROM w, UNNEST(range(1, len(words) - 1)) AS t(i)
        |       WHERE len(words) >= 3),
        |sig AS (SELECT doc_id, b.band AS band, min(md5(b.band || ':' || s)) AS minhash
        |        FROM sh, (VALUES (0), (1), (2), (3)) AS b(band) GROUP BY 1, 2),
        |store AS (SELECT band, minhash, min(doc_id) AS corpus_rep
        |          FROM sig WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
        |bsig AS (SELECT * FROM sig WHERE doc_id % 5 = 0),
        |vs_corpus AS (SELECT bsig.doc_id AS doc_id, min(store.corpus_rep) AS corpus_cand
        |              FROM bsig JOIN store USING (band, minhash) GROUP BY 1),
        |breps AS (SELECT band, minhash, min(doc_id) AS bucket_rep FROM bsig GROUP BY 1, 2),
        |vs_batch AS (SELECT bsig.doc_id AS doc_id, min(breps.bucket_rep) AS batch_cand
        |             FROM bsig JOIN breps USING (band, minhash)
        |             WHERE breps.bucket_rep < bsig.doc_id GROUP BY 1)
        |SELECT d.doc_id, vc.corpus_cand, vb.batch_cand,
        |       (vc.corpus_cand IS NULL AND vb.batch_cand IS NULL) AS keep
        |FROM documents d
        |LEFT JOIN vs_corpus vc ON vc.doc_id = d.doc_id
        |LEFT JOIN vs_batch vb ON vb.doc_id = d.doc_id
        |WHERE d.doc_id % 5 = 0""".stripMargin,

    // incremental candidates + exact-Jaccard verification: full replay of
    // the whole candidates -> verify composition
    "q_incr_verified" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS s
        |       FROM w, UNNEST(range(1, len(words) - 1)) AS t(i)
        |       WHERE len(words) >= 3),
        |sig AS (SELECT doc_id, b.band AS band, min(md5(b.band || ':' || s)) AS minhash
        |        FROM sh, (VALUES (0), (1), (2), (3)) AS b(band) GROUP BY 1, 2),
        |store AS (SELECT band, minhash, min(doc_id) AS corpus_rep
        |          FROM sig WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
        |bsig AS (SELECT * FROM sig WHERE doc_id % 5 = 0),
        |vc AS (SELECT bsig.doc_id AS doc_id, min(store.corpus_rep) AS corpus_cand
        |       FROM bsig JOIN store USING (band, minhash) GROUP BY 1),
        |breps AS (SELECT band, minhash, min(doc_id) AS bucket_rep FROM bsig GROUP BY 1, 2),
        |vb AS (SELECT bsig.doc_id AS doc_id, min(breps.bucket_rep) AS batch_cand
        |       FROM bsig JOIN breps USING (band, minhash)
        |       WHERE breps.bucket_rep < bsig.doc_id GROUP BY 1),
        |pairs AS (SELECT DISTINCT doc_id, cand FROM (
        |            SELECT doc_id, corpus_cand AS cand FROM vc
        |            UNION ALL SELECT doc_id, batch_cand FROM vb)
        |          WHERE cand IS NOT NULL),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT p.doc_id, p.cand, count(*) AS i
        |          FROM pairs p
        |          JOIN sh sa ON sa.doc_id = p.doc_id
        |          JOIN sh sb ON sb.doc_id = p.cand AND sa.s = sb.s
        |          GROUP BY 1, 2)
        |SELECT p.doc_id, p.cand,
        |       round(coalesce(i.i, 0) * 1.0
        |             / (za.sz + zb.sz - coalesce(i.i, 0)), 6) AS jaccard,
        |       round(coalesce(i.i, 0) * 1.0
        |             / (za.sz + zb.sz - coalesce(i.i, 0)), 6) >= 0.8 AS verified
        |FROM pairs p
        |LEFT JOIN inter i ON i.doc_id = p.doc_id AND i.cand = p.cand
        |JOIN sizes za ON za.doc_id = p.doc_id
        |JOIN sizes zb ON zb.doc_id = p.cand""".stripMargin,

    // corpus report: GROUP BY ROLLUP replayed exactly at all three grains
    "q_corpus_report" ->
      """SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
        |       CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
        |       count(*) AS n_docs,
        |       CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |                ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT) AS sum_tok,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY ROLLUP(lang, source)""".stripMargin,

    // JL projection contract: dims, determinism, exact 2x homogeneity,
    // norm preservation — all Spark-checked booleans; n_vecs replayed
    "q_rand_proj" ->
      """SELECT count(*) AS n_vecs, true AS dim_ok, true AS det_ok,
        |       true AS scale2_ok, true AS mean_ok, true AS max_ok
        |FROM embeddings""".stripMargin,

    // outlier screen contract: threshold-cut separation per cell, global
    // flag rate, cosine-distance range; n_total replayed
    "q_embed_outliers" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total, true AS sep_ok,
        |       true AS rate_ok, true AS range_ok
        |FROM embeddings""".stripMargin,

    // Misra–Gries: word/freq are exact corpus arithmetic; the theorem
    // booleans (presence of every true heavy hitter, ≤ N/(cap+1)
    // undercount) hold under ANY processing order and are pinned true
    "q_heavy_hitters" ->
      """WITH w AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
        |           FROM documents),
        |tot AS (SELECT count(*) AS n FROM w),
        |cnt AS (SELECT word, count(*) AS freq FROM w GROUP BY 1)
        |SELECT word, freq, true AS present_ok, true AS err_ok
        |FROM cnt CROSS JOIN tot WHERE freq > n / 31.0""".stripMargin,

    // key-skew profile: full replay — exact counts, 6-dp shares/entropy,
    // (cnt DESC, key ASC) total-order top-10
    "q_key_skew" ->
      """WITH c AS (SELECT user_id AS key, count(*) AS cnt FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n, count(*) AS n_keys FROM c),
        |ent AS (SELECT round(-sum((cnt / n) * ln(cnt / n)), 6) + 0.0 AS entropy
        |        FROM c CROSS JOIN tot)
        |SELECT key, cnt, round(cnt / n, 6) AS share, n_keys, entropy
        |FROM c CROSS JOIN tot CROSS JOIN ent
        |ORDER BY cnt DESC, key LIMIT 10""".stripMargin,

    // distributed zipWithIndex: full replay via row_number over the same
    // total order
    "q_seq_ids" ->
      """SELECT doc_id, n_chars,
        |       row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS seq_id
        |FROM documents""".stripMargin,

    // packed training sequences: coverage/capacity/span contracts are
    // Spark-checked booleans (BPE token counts aren't SQL-replayable);
    // n_docs replays — every doc lands in exactly one span
    "q_train_sequences" ->
      """SELECT count(*) AS n_docs, true AS coverage_ok, true AS capacity_ok,
        |       true AS spans_contiguous_ok, true AS span_lens_ok
        |FROM documents""".stripMargin,

    // StreamingWordExtract transform chain: split on non-letters,
    // uppercase, one row per occurrence (multiset compare)
    "q_word_extract" ->
      """SELECT upper(w) AS word
        |FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS w
        |      FROM documents)
        |WHERE length(w) > 0""".stripMargin,

    // one-scan column profile: per-column replay (numeric min/max as
    // rounded doubles, strings as strings — engine-neutral renderings)
    "q_profile" ->
      """WITH m AS (SELECT count(*) AS n FROM customer)
        |SELECT 'c_custkey' AS "column", m.n AS n_rows,
        |       (SELECT count(*) FROM customer WHERE c_custkey IS NULL) AS n_nulls,
        |       (SELECT count(DISTINCT c_custkey) FROM customer) AS n_distinct,
        |       (SELECT round(CAST(min(c_custkey) AS DOUBLE), 6) FROM customer) AS min_num,
        |       (SELECT round(CAST(max(c_custkey) AS DOUBLE), 6) FROM customer) AS max_num,
        |       NULL AS min_str, NULL AS max_str FROM m
        |UNION ALL SELECT 'c_name', m.n,
        |       (SELECT count(*) FROM customer WHERE c_name IS NULL),
        |       (SELECT count(DISTINCT c_name) FROM customer),
        |       NULL, NULL,
        |       (SELECT min(c_name) FROM customer),
        |       (SELECT max(c_name) FROM customer) FROM m
        |UNION ALL SELECT 'c_nationkey', m.n,
        |       (SELECT count(*) FROM customer WHERE c_nationkey IS NULL),
        |       (SELECT count(DISTINCT c_nationkey) FROM customer),
        |       (SELECT round(CAST(min(c_nationkey) AS DOUBLE), 6) FROM customer),
        |       (SELECT round(CAST(max(c_nationkey) AS DOUBLE), 6) FROM customer),
        |       NULL, NULL FROM m
        |UNION ALL SELECT 'c_acctbal', m.n,
        |       (SELECT count(*) FROM customer WHERE c_acctbal IS NULL),
        |       (SELECT count(DISTINCT c_acctbal) FROM customer),
        |       (SELECT round(CAST(min(c_acctbal) AS DOUBLE), 6) FROM customer),
        |       (SELECT round(CAST(max(c_acctbal) AS DOUBLE), 6) FROM customer),
        |       NULL, NULL FROM m
        |UNION ALL SELECT 'c_mktsegment', m.n,
        |       (SELECT count(*) FROM customer WHERE c_mktsegment IS NULL),
        |       (SELECT count(DISTINCT c_mktsegment) FROM customer),
        |       NULL, NULL,
        |       (SELECT min(c_mktsegment) FROM customer),
        |       (SELECT max(c_mktsegment) FROM customer) FROM m""".stripMargin,

    // PSI drift: eps-floored shares, per-category contribution + total
    "q_drift_psi" ->
      """WITH a AS (SELECT lang AS category, count(*) AS c FROM documents
        |           WHERE doc_id % 2 = 0 GROUP BY 1),
        |b AS (SELECT lang AS category, count(*) AS c FROM documents
        |      WHERE doc_id % 2 <> 0 GROUP BY 1),
        |ta AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM a),
        |tb AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM b),
        |j AS (SELECT coalesce(a.category, b.category) AS category,
        |             greatest(coalesce(a.c / ta.t, 0.0), 1e-6) AS pa,
        |             greatest(coalesce(b.c / tb.t, 0.0), 1e-6) AS pb
        |      FROM a FULL OUTER JOIN b ON a.category = b.category
        |      CROSS JOIN ta CROSS JOIN tb),
        |contrib AS (SELECT category, round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |                   round((pa - pb) * ln(pa / pb), 6) + 0.0 AS psi FROM j)
        |SELECT category, p_a, p_b, psi,
        |       round(sum(psi) OVER (), 6) + 0.0 AS psi_total
        |FROM contrib""".stripMargin,

    // one-scan quality gate: every metric recomputed exactly in SQL
    "q_data_checks" ->
      """WITH m AS (SELECT
        |  CAST(count(event_id) - count(DISTINCT event_id) AS DOUBLE) AS unique_dups,
        |  round(CAST(count(user_id) AS DOUBLE) / count(*), 6) AS user_ratio,
        |  round(CAST(count(props) AS DOUBLE) / count(*), 6) AS props_ratio,
        |  CAST(sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
        |        ('click','view','purchase','error','signup') THEN 1 ELSE 0 END) AS DOUBLE)
        |    AS set_viol,
        |  CAST(sum(CASE WHEN value IS NOT NULL AND (value < -1e6 OR value > 1e6)
        |        THEN 1 ELSE 0 END) AS DOUBLE) AS range_viol,
        |  CAST(count(*) AS DOUBLE) AS n
        |FROM events)
        |SELECT 'unique' AS "check", 'event_id' AS "column", unique_dups AS metric,
        |       unique_dups = 0 AS ok FROM m
        |UNION ALL SELECT 'not_null', 'user_id', user_ratio, user_ratio >= 1.0 FROM m
        |UNION ALL SELECT 'not_null', 'props', props_ratio, props_ratio >= 0.5 FROM m
        |UNION ALL SELECT 'in_set', 'event_type', set_viol, set_viol = 0 FROM m
        |UNION ALL SELECT 'in_range', 'value', range_viol, range_viol = 0 FROM m
        |UNION ALL SELECT 'size_between', '*', n, n >= 1 FROM m""".stripMargin,

    // co-occurrence: full replay of dedup -> frequency cap -> pair join
    "q_cooccur" ->
      """WITH w AS (SELECT DISTINCT doc_id, w
        |           FROM (SELECT doc_id,
        |                        unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |                 FROM documents)
        |           WHERE length(w) > 0),
        |kept AS (SELECT w.* FROM w
        |         JOIN (SELECT w, count(*) AS f FROM w GROUP BY 1
        |               HAVING count(*) <= 100000) k ON w.w = k.w)
        |SELECT a.w AS word_a, b.w AS word_b, count(*) AS support
        |FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.w < b.w
        |GROUP BY 1, 2 HAVING count(*) >= 50""".stripMargin,

    // transition matrix: full replay of the lag pairs + row normalization
    "q_transitions" ->
      """WITH p AS (SELECT lag(event_type) OVER (PARTITION BY user_id
        |                    ORDER BY ts, event_id) AS prev,
        |                  event_type AS next
        |           FROM events),
        |c AS (SELECT prev, next, count(*) AS n FROM p
        |      WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev, CAST(sum(n) AS DOUBLE) AS tot FROM c GROUP BY 1)
        |SELECT c.prev, c.next, c.n, round(c.n / t.tot, 6) AS p
        |FROM c JOIN t ON c.prev = t.prev""".stripMargin,

    // cohort retention: full replay (date truncation, first-seen join,
    // distinct actives, 6-dp retention)
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |fs AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
        |sized AS (SELECT cohort_day, count(*) AS cohort_size FROM fs GROUP BY 1),
        |act AS (SELECT fs.cohort_day, e.day - fs.cohort_day AS day_offset,
        |               count(DISTINCT e.user_id) AS active_users
        |        FROM e JOIN fs ON e.user_id = fs.user_id GROUP BY 1, 2)
        |SELECT CAST(act.cohort_day AS VARCHAR) AS cohort_day,
        |       CAST(day_offset AS BIGINT) AS day_offset, active_users,
        |       cohort_size,
        |       round(active_users * 1.0 / cohort_size, 6) AS retention
        |FROM act JOIN sized ON act.cohort_day = sized.cohort_day""".stripMargin,

    // exact keyed percentiles: both engines interpolate linearly over
    // the sorted group — identical doubles at 6 dp
    "q_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.9), 6) AS p90,
        |       round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY 1""".stripMargin,

    // pivot: CASE-column replay (counts may be 0 — Spark emits 0 for
    // count over an empty pivot bucket)
    "q_pivot" ->
      """SELECT user_id % 10 AS user_decile,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup
        |FROM events GROUP BY 1""".stripMargin,

    // EWMA: the recurrence/bit-exactness contract is Spark-checked (the
    // sequential scan is not SQL-expressible row-by-row); n_rows replays
    "q_ewma" ->
      """SELECT count(*) AS n_rows, true AS recurrence_ok,
        |       true AS has_first_rows
        |FROM events""".stripMargin,

    // rolling z-score: identical trailing ROWS frame, 4-dp rounding
    "q_rolling_z" ->
      """SELECT event_id, user_id,
        |       CASE WHEN count(value) OVER w >= 5
        |                 AND stddev_samp(value) OVER w > 0
        |            THEN round((value - avg(value) OVER w)
        |                       / stddev_samp(value) OVER w, 4) + 0.0
        |       END AS z
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""".stripMargin,

    // gap-filled resample: slot assignment, deterministic last-obs,
    // per-key dense grid, IGNORE NULLS forward fill — all replayed
    "q_gap_fill" ->
      """WITH s AS (SELECT user_id AS key,
        |                  epoch_us(ts) // 21600000000 AS slot,
        |                  ts, event_id, round(value, 6) AS v
        |           FROM events),
        |obs AS (SELECT key, slot, v
        |        FROM s QUALIFY row_number() OVER (PARTITION BY key, slot
        |                  ORDER BY ts DESC, event_id DESC) = 1),
        |spans AS (SELECT key, min(slot) AS lo, max(slot) AS hi FROM s GROUP BY 1),
        |grid AS (SELECT key, unnest(range(lo, hi + 1)) AS slot FROM spans),
        |j AS (SELECT g.key, g.slot, o.v
        |      FROM grid g LEFT JOIN obs o ON g.key = o.key AND g.slot = o.slot),
        |f AS (SELECT key, slot, v,
        |             last_value(v IGNORE NULLS) OVER (PARTITION BY key
        |                 ORDER BY slot ROWS UNBOUNDED PRECEDING) AS value
        |      FROM j)
        |SELECT key AS user_id, make_timestamp(slot * 21600000000) AS slot_ts,
        |       round(value, 6) AS value,
        |       (v IS NULL AND value IS NOT NULL) AS filled
        |FROM f""".stripMargin,

    // per-row sessionization: full replay of lag-gap-flag + running sum
    "q_sessionize" ->
      """WITH l AS (SELECT user_id, ts, event_id,
        |                  lag(ts) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS prev
        |           FROM events),
        |f AS (SELECT *, CASE WHEN prev IS NULL
        |                       OR ts - prev > INTERVAL 30 MINUTE
        |                     THEN 1 ELSE 0 END AS ns FROM l),
        |s AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id
        |                              ROWS UNBOUNDED PRECEDING) - 1
        |                     AS BIGINT) AS session_idx
        |      FROM f)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(ts) AS start_ts, max(ts) AS end_ts
        |FROM s GROUP BY 1, 2""".stripMargin,

    // first-touch funnel: full replay of the three keyed stages
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |        AND e.ts <= v.v_ts + INTERVAL 1 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |        AND e.ts <= c.c_ts + INTERVAL 1 HOUR GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view_users,
        |       (SELECT count(*) FROM c) AS n_click_users,
        |       (SELECT count(*) FROM p) AS n_purchase_users,
        |       round((SELECT count(*) FROM c) * 1.0
        |             / (SELECT count(*) FROM v), 6) AS click_rate,
        |       round((SELECT count(*) FROM p) * 1.0
        |             / greatest((SELECT count(*) FROM c), 1), 6) AS purchase_rate""".stripMargin,

    // NFC: DuckDB nfc_normalize over the SAME decomposed planted suffix
    // (combining marks) -- real composition replay, not identity
    "q_text_nfc" ->
      ("SELECT doc_id, nfc_normalize(text || ' café naïve Ångström') AS nfc, " +
      "true AS changed FROM documents"),

    // BPE encode: roundtrip/count/id-range contracts are Spark-checked
    // booleans (the iterated merge fixpoint is not SQL-replayable);
    // n_docs replayed
    "q_bpe_encode" ->
      """SELECT count(*) AS n_docs, true AS roundtrip_ok,
        |       true AS count_ok, true AS ids_ok
        |FROM documents""".stripMargin,

    // TPC-H Q3/Q5 shapes: exact-cents revenue, total-order top-k
    "q_tpch_q3" ->
      """SELECT o_orderkey, o_orderdate,
        |       CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |                     AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2
        |ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |       CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 100 + 0.5)
        |                     AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,

    // KMV corpus Jaccard: the bottom-k estimator is md5-deterministic —
    // replay BOTH the estimate and the exact shingle-set Jaccard
    "q_corpus_jaccard" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS s
        |       FROM w, UNNEST(range(1, len(words) - 1)) AS t(i)
        |       WHERE len(words) >= 3),
        |ka AS (SELECT DISTINCT md5(s) AS h FROM sh WHERE doc_id % 2 = 0
        |       ORDER BY 1 LIMIT 256),
        |kb AS (SELECT DISTINCT md5(s) AS h FROM sh WHERE doc_id % 2 <> 0
        |       ORDER BY 1 LIMIT 256),
        |merged AS (SELECT coalesce(ka.h, kb.h) AS h,
        |                  (ka.h IS NOT NULL AND kb.h IS NOT NULL) AS in_both
        |           FROM ka FULL OUTER JOIN kb ON ka.h = kb.h
        |           ORDER BY 1 LIMIT 256),
        |est AS (SELECT round(sum(CASE WHEN in_both THEN 1 ELSE 0 END) * 1.0
        |                     / count(*), 6) AS j_est,
        |               count(*) AS k_used FROM merged),
        |sa AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
        |sb AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 <> 0),
        |ex AS (SELECT sum(CASE WHEN sa.s IS NOT NULL AND sb.s IS NOT NULL
        |                       THEN 1 ELSE 0 END) * 1.0 / count(*) AS j
        |       FROM sa FULL OUTER JOIN sb ON sa.s = sb.s)
        |SELECT est.j_est, est.k_used,
        |       (abs(est.j_est - ex.j) <= 0.2) AS err_ok
        |FROM est CROSS JOIN ex""".stripMargin,

    // increment pipeline: diff → added/changed → incremental exact dedup
    // against the old snapshot's digest store — full composed replay
    "q_increment_pipeline" ->
      """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id,
        |             CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
        |      FROM documents WHERE doc_id % 5 <> 0),
        |diff AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |                CASE WHEN o.doc_id IS NULL THEN 'added'
        |                     WHEN n.doc_id IS NULL THEN 'removed'
        |                     WHEN md5(o.text) <> md5(n.text) THEN 'changed'
        |                     ELSE 'unchanged' END AS status
        |         FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id),
        |store AS (SELECT md5(text) AS h, min(doc_id) AS corpus_rep
        |          FROM o GROUP BY 1),
        |w AS (SELECT n.doc_id, md5(n.text) AS h
        |      FROM n JOIN diff ON n.doc_id = diff.doc_id
        |      WHERE diff.status IN ('added', 'changed')),
        |reps AS (SELECT h, min(doc_id) AS batch_rep FROM w GROUP BY 1),
        |v AS (SELECT w.doc_id,
        |             (s.corpus_rep IS NULL AND w.doc_id = r.batch_rep) AS keep
        |      FROM w LEFT JOIN store s ON w.h = s.h
        |      JOIN reps r ON w.h = r.h)
        |SELECT diff.doc_id, diff.status, coalesce(v.keep, false) AS ingest
        |FROM diff LEFT JOIN v ON diff.doc_id = v.doc_id""".stripMargin,

    // snapshot diff: full replay of the digest-join classification
    "q_corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id,
        |             md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS h
        |      FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |       CASE WHEN o.doc_id IS NULL THEN 'added'
        |            WHEN n.doc_id IS NULL THEN 'removed'
        |            WHEN o.h <> n.h THEN 'changed'
        |            ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    // weighted-sample contract: exact size, distinct members, and the
    // token-share bias footprint (sample mean tokens > corpus mean)
    "q_weighted_sample" ->
      """SELECT CAST(50 AS BIGINT) AS n_sampled, true AS distinct_ok,
        |       true AS members_ok, true AS weight_biased""".stripMargin,

    // n_docs_total / sum_tok_total recomputed from the raw documents table
    // (Spark derives them from the pack output — coverage + token
    // accounting replay); per-group tightness stays Spark-checked (groups
    // are xxhash64-assigned, not SQL-replayable)
    "q_pack_tokens" ->
      """WITH t AS (SELECT CASE WHEN length(trim(text)) = 0 THEN 0
        |                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nt
        |           FROM documents)
        |SELECT UNNEST(range(8)) AS grp, true AS all_docs_ok,
        |       true AS cap_ok, true AS tight_ok,
        |       (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_docs_total,
        |       (SELECT CAST(sum(nt) AS BIGINT) FROM t) AS sum_tok_total""".stripMargin,

    // the deterministic pipeline stages (quality gate, md5 dedup) are
    // replayed exactly; the hash-seeded stages are contract booleans
    "q_curation_pipeline" ->
      """WITH f AS (
        |  SELECT doc_id, lang, text,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nt,
        |         round(len(regexp_extract_all(text, '[[:punct:]]'))
        |               / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS pr
        |  FROM documents),
        |k AS (SELECT doc_id, lang, text FROM f WHERE nt >= 20 AND pr <= 0.1),
        |r AS (SELECT min(doc_id) AS doc_id FROM k GROUP BY md5(text)),
        |s AS (SELECT k.lang FROM k JOIN r USING (doc_id))
        |SELECT c.lang, c.n_candidates, d.n_dedup,
        |       true AS rate_ok, true AS pack_ok
        |FROM (SELECT lang, count(*) AS n_candidates FROM k GROUP BY 1) c
        |JOIN (SELECT lang, count(*) AS n_dedup FROM s GROUP BY 1) d USING (lang)""".stripMargin,

    // GameStats.CalculateSpammyUsers: exact-cent per-user sums plus the
    // 2.5x-global-mean spam verdict in pure integer arithmetic
    // (total*n*10 > 25*S) — every total and flag fully replayed by DuckDB.
    "q_spammy_users" ->
      """WITH sums AS (
        |  SELECT user_id,
        |         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM events GROUP BY user_id),
        |g AS (SELECT SUM(total_cents) AS s, COUNT(*) AS n FROM sums)
        |SELECT user_id, total_cents,
        |       total_cents * n * 10 > 25 * s AS is_spammy
        |FROM sums, g""".stripMargin,

    // Corpus scrub: the same PII planting + the same Java∩RE2 regex chain,
    // replayed verbatim (markup, URL, email, IPv4, phone, whitespace).
    "q_text_clean" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |         text || ' Contact <b>admin</b> at user' || CAST(doc_id AS VARCHAR) ||
        |         '@example.com or https://ex.com/d/' || CAST(doc_id AS VARCHAR) ||
        |         ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
        |         '.7 tel +1555000' || CAST(doc_id AS VARCHAR) AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
        |    '<[^>]*>', ' ', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d{7,15}', '<PHONE>', 'g'),
        |    '\s+', ' ', 'g')) AS clean_text,
        |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, 'https?://[^\s]+')) AS BIGINT) AS n_urls
        |FROM raw""".stripMargin,

    // Gopher/C4 repetition signals, replayed with DuckDB list lambdas.
    "q_quality_rep" ->
      """WITH w AS (SELECT doc_id,
        |                  regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  round(1 - CAST(len(list_distinct(ws)) AS DOUBLE) / greatest(len(ws), 1), 6) AS dup_word_frac,
        |  round(CAST(list_max(list_transform(list_distinct(ws),
        |          w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE)
        |        / greatest(len(ws), 1), 6) AS top_word_frac
        |FROM w""".stripMargin,

    // Decontamination: same 3-gram shingle definition as q_dedup_minhash's
    // replay; benchmark = doc_id < 20, overlap count per flagged doc.
    "q_decontaminate" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS words FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS s
        |       FROM w, UNNEST(range(1, len(words) - 1)) AS t(i)
        |       WHERE len(words) >= 3),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20)
        |SELECT c.doc_id, CAST(count(DISTINCT c.s) AS BIGINT) AS n_overlap
        |FROM sh c JOIN bench b USING (s)
        |WHERE c.doc_id >= 20
        |GROUP BY 1""".stripMargin,

    // BigQueryTornadoes: indicator filter -> count per day-of-month
    "q_tornadoes" ->
      """SELECT CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
        |       count(*) AS tornado_count
        |FROM events WHERE event_type = 'error'
        |GROUP BY 1""".stripMargin,

    // CombinePerKeyExamples: length>=9 words -> sorted distinct source list
    "q_large_word_plays" ->
      """WITH pairs AS (
        |  SELECT DISTINCT word, source FROM (
        |    SELECT source,
        |           unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
        |    FROM documents)
        |  WHERE length(word) >= 6)
        |SELECT word, string_agg(source, ',' ORDER BY source) AS all_plays
        |FROM pairs GROUP BY word""".stripMargin,

    // DistinctExample: distinct text lines
    "q_distinct_lines" -> "SELECT DISTINCT text FROM documents",

    // FilterExamples: single-day slice below the global mean; the mean is
    // exact-cents-sum / count so the double boundary agrees bit-for-bit
    "q_filter_below_mean" ->
      """SELECT CAST(EXTRACT(year FROM ts) AS INTEGER) AS year,
        |       CAST(EXTRACT(month FROM ts) AS INTEGER) AS month,
        |       CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
        |       CAST(floor(value * 100 + 0.5) AS BIGINT) AS mean_temp_cents
        |FROM events
        |WHERE EXTRACT(day FROM ts) = 7
        |  AND CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS DOUBLE) <
        |      (SELECT CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        |              / count(*) FROM events)""".stripMargin,

    // JoinExamples: fact x one-row-per-key dim, formatted output line
    "q_join_examples" ->
      """SELECT 'Country code: ' || c_nationkey || ', Country name: ' || n_name
        |       || ', Event info: ' || c_name AS result
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,

    // MaxPerKeyExamples: max reading per day-of-month
    "q_max_per_day" ->
      """SELECT CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
        |       max(value) AS max_mean_temp
        |FROM events GROUP BY 1""".stripMargin,

    // tf.Example wire round-trip is the identity on the projected columns
    "q_tfexample" ->
      "SELECT doc_id, text, lang, n_chars FROM documents",

    // BPE merge learning, all 6 rounds unrolled (see bpeLearnSql)
    "q_bpe_learn" -> bpeLearnSql(6),

    // quality classifier: 3 GD rounds + scoring replayed (see logRegSql)
    "q_quality_clf" -> logRegSql(512, 3, 0.5),

    // deterministic training shuffle: exact replay of the seeded layout
    "q_shuffle_shards" ->
      """SELECT doc_id,
        |       CAST(CAST(('0x' || substr(md5('shuf:42:' || CAST(doc_id AS VARCHAR)),1,15))
        |                 AS BIGINT) % 8 AS INTEGER) AS shard,
        |       CAST(('0x' || substr(md5('shuf:42:' || CAST(doc_id AS VARCHAR)),1,15))
        |            AS BIGINT) AS sort_key
        |FROM documents""".stripMargin,

    // CCNet perplexity terciles: the q_lm_score replay + exact-percentile
    // thresholds (quantile_cont ↔ Spark percentile, both 6-dp rounded)
    "q_ccnet_buckets" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        |tri AS (SELECT doc_id, substr(t, CAST(i AS INT), 3) AS tri
        |        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        |              FROM d WHERE len(t) >= 3)),
        |m AS (SELECT tri, count(*) AS cnt FROM tri GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM m),
        |lp AS (SELECT tri, ln(CAST(cnt AS DOUBLE) / total) AS logp FROM m, tot),
        |sc AS (SELECT doc_id, round(avg(logp), 6) AS lm_score
        |       FROM tri JOIN lp USING (tri) GROUP BY 1),
        |thr AS (SELECT round(quantile_cont(lm_score, 1.0/3.0), 6) AS t1,
        |               round(quantile_cont(lm_score, 2.0/3.0), 6) AS t2 FROM sc)
        |SELECT doc_id, lm_score,
        |       CASE WHEN lm_score <= t1 THEN 'tail'
        |            WHEN lm_score <= t2 THEN 'middle'
        |            ELSE 'head' END AS ppl_bucket
        |FROM sc, thr""".stripMargin,

    // incremental SemDeDup: corpus (first 400 ids of every 1e9 id-block —
    // identity below 2000, so driver SFs match the old `< 400` exactly)
    // clusters via md5 seeds, batch assigned to the SAME cells, verdicts
    // within-cell against store + smaller-id batch rows; least() ignores
    // NULLs in both engines. kv is the r15 BALANCED derivation (occupancy
    // capped at the integer power-of-two sqrt) — same as q_semdedup.
    "q_semdedup_incr" ->
      """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |n AS (SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
        |corp AS (SELECT * FROM n WHERE id % 1000000000 < 400),
        |bat AS (SELECT * FROM n WHERE id % 1000000000 >= 400),
        |kv AS (SELECT least(
        |         least(65536, greatest(1, CAST(ceil(c.n / 256.0) AS BIGINT))),
        |         (SELECT min(CAST(1 AS BIGINT) << i)
        |          FROM (SELECT unnest(range(0, 17)) AS i)
        |          WHERE (CAST(1 AS BIGINT) << i) * (CAST(1 AS BIGINT) << i) >= c.n)
        |       ) AS k
        |       FROM (SELECT count(*) AS n FROM n) c),
        |cent AS (SELECT cell, cvec, cnorm FROM (
        |    SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS cell,
        |           vec AS cvec, sqrt(list_dot_product(vec, vec)) AS cnorm
        |    FROM corp), kv WHERE cell < kv.k),
        |sa AS (SELECT id, vec, nrm, cell FROM (
        |    SELECT corp.id, corp.vec, corp.nrm, cent.cell,
        |           row_number() OVER (PARTITION BY corp.id ORDER BY
        |             round(-list_dot_product(corp.vec, cent.cvec) / (corp.nrm * cent.cnorm), 9),
        |             cent.cell) AS rn
        |    FROM corp CROSS JOIN cent) WHERE rn = 1),
        |ba AS (SELECT id, vec, nrm, cell FROM (
        |    SELECT bat.id, bat.vec, bat.nrm, cent.cell,
        |           row_number() OVER (PARTITION BY bat.id ORDER BY
        |             round(-list_dot_product(bat.vec, cent.cvec) / (bat.nrm * cent.cnorm), 9),
        |             cent.cell) AS rn
        |    FROM bat CROSS JOIN cent) WHERE rn = 1),
        |cd AS (SELECT a.id, min(c.id) AS corpus_dup
        |       FROM ba a JOIN sa c ON a.cell = c.cell
        |       WHERE round(list_dot_product(a.vec, c.vec) / (a.nrm * c.nrm), 6) >= 0.3
        |       GROUP BY 1),
        |bd AS (SELECT a.id, min(b2.id) AS batch_dup
        |       FROM ba a JOIN ba b2 ON a.cell = b2.cell AND b2.id < a.id
        |       WHERE round(list_dot_product(a.vec, b2.vec) / (a.nrm * b2.nrm), 6) >= 0.3
        |       GROUP BY 1)
        |SELECT ba.id AS vec_id, CAST(ba.cell AS INT) AS cell,
        |       least(cd.corpus_dup, bd.batch_dup) AS dup_of,
        |       cd.corpus_dup IS NULL AND bd.batch_dup IS NULL AS keep
        |FROM ba LEFT JOIN cd ON cd.id = ba.id
        |        LEFT JOIN bd ON bd.id = ba.id""".stripMargin,

    // spherical k-means, ONE Lloyd round replayed in full: md5 seeds →
    // 9-dp argmin assignment → per-cell spherical mean (sum of x/nrm,
    // renormalized; empty/zero cells keep the seed) → re-assignment
    "q_kmeans" ->
      """WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |n AS (SELECT id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
        |cent0 AS (SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS cell,
        |                 vec AS cvec, sqrt(list_dot_product(vec, vec)) AS cnorm
        |          FROM v ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 8),
        |a0 AS (SELECT id, cell, vec, nrm FROM (
        |    SELECT n.id, n.vec, n.nrm, cent0.cell,
        |           row_number() OVER (PARTITION BY n.id ORDER BY
        |             round(-list_dot_product(n.vec, cent0.cvec) / (n.nrm * cent0.cnorm), 9),
        |             cent0.cell) AS rn
        |    FROM n CROSS JOIN cent0) WHERE rn = 1),
        |sums AS (SELECT cell, pos, sum(x / nrm) AS s FROM (
        |    SELECT cell, nrm, unnest(vec) AS x,
        |           unnest(range(1, len(vec) + 1)) AS pos
        |    FROM a0 WHERE nrm > 0) GROUP BY 1, 2),
        |newc AS (SELECT cell, list(s ORDER BY pos) AS mvec, sqrt(sum(s * s)) AS mnorm
        |         FROM sums GROUP BY cell),
        |cent1 AS (SELECT c0.cell,
        |                 CASE WHEN nc.cell IS NULL OR nc.mnorm = 0 THEN c0.cvec
        |                      ELSE list_transform(nc.mvec, x -> x / nc.mnorm) END AS cvec
        |          FROM cent0 c0 LEFT JOIN newc nc ON c0.cell = nc.cell),
        |cent1n AS (SELECT cell, cvec, sqrt(list_dot_product(cvec, cvec)) AS cnorm FROM cent1),
        |a1 AS (SELECT id, cell FROM (
        |    SELECT n.id, cent1n.cell,
        |           row_number() OVER (PARTITION BY n.id ORDER BY
        |             round(-list_dot_product(n.vec, cent1n.cvec) / (n.nrm * cent1n.cnorm), 9),
        |             cent1n.cell) AS rn
        |    FROM n CROSS JOIN cent1n) WHERE rn = 1),
        |sizes AS (SELECT cell, count(*) AS cell_size FROM a1 GROUP BY 1)
        |SELECT a1.id AS vec_id, CAST(a1.cell AS INT) AS cell, sizes.cell_size
        |FROM a1 JOIN sizes ON a1.cell = sizes.cell""".stripMargin,

    // DSIR importance resampling: full replay — hashed unigram+bigram
    // buckets (engine-neutral md5 60-bit hash), smoothed target/raw
    // multinomials, 6-dp-rounded log-weights, seeded Gumbel top-50.
    // The bucket count is POPULATION-DERIVED (Dsir.bucketsFor: one bucket
    // per 16 docs, clamped to [512, 65536] — integer ceil-division), so
    // it is re-derived here from count(*): exactly 512 at test SFs
    // (bit-identical to the old constant), growing at sf1+; a derivation
    // drift between the engines breaks every hash below
    "q_dsir" ->
      """WITH bk AS (
        |  SELECT LEAST(65536, GREATEST(512, (count(*) + 15) // 16)) AS b
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, lang = 'en' AS is_target,
        |         list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                     w -> w <> '') AS words
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, is_target,
        |         unnest(words || list_transform(range(1, len(words)),
        |                  i -> words[i] || ' ' || words[i+1])) AS ng
        |  FROM d),
        |hc AS (
        |  -- grouped by DISTINCT ngram, not by bucket: mirrors the Spark
        |  -- kernel (WordNgramCounts emits one row per distinct per-doc
        |  -- ngram; hash-colliding ngrams stay separate rows), so the
        |  -- sum(cnt * dlogp) below adds the same multiset of terms in
        |  -- both engines instead of a bucket-pre-summed association that
        |  -- differs in last-ulp FP
        |  SELECT doc_id, is_target,
        |         CAST(('0x' || substr(md5(ng),1,15)) AS BIGINT) % b AS bucket,
        |         count(*) AS cnt
        |  FROM ng, bk GROUP BY doc_id, is_target, ng, b),
        |model AS (
        |  SELECT bucket, sum(cnt) AS q_cnt,
        |         sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS t_cnt
        |  FROM hc GROUP BY 1),
        |tot AS (SELECT sum(q_cnt) AS qt, sum(t_cnt) AS tt FROM model),
        |dl AS (SELECT bucket,
        |              ln((t_cnt + 1.0)/(tt + 1.0 * b)) -
        |              ln((q_cnt + 1.0)/(qt + 1.0 * b)) AS dlogp
        |       FROM model, tot, bk),
        |w AS (
        |  SELECT hc.doc_id, round(sum(cnt * dlogp), 6) + 0.0 AS dsir_logw
        |  FROM hc JOIN dl USING (bucket) WHERE NOT is_target GROUP BY 1),
        |k AS (
        |  SELECT doc_id, dsir_logw,
        |         dsir_logw - ln(-ln(
        |           (CAST(('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)),1,15))
        |                 AS BIGINT) + 0.5) / 1152921504606846976.0)) AS gk
        |  FROM w)
        |SELECT doc_id, dsir_logw, round(gk, 6) + 0.0 AS gumbel_key
        |FROM k ORDER BY gk DESC, doc_id LIMIT 50""".stripMargin
  )
}
