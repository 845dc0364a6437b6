package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.run.Validation
import graft.table.TableChecks
import graft.text.TextOps
import graft.ann.Ann

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with DuckDB-equivalent oracle SQL where the operator is
  * SQL-expressible. Column names are aligned between Spark and SQL (the
  * driver's compare hashes by sorted column name). */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Spec used by the orders validation queries (bounds, enum, pattern,
    * required — SURVEY §2.1). */
  private val ordersSpec = """{
    "properties": {
      "o_orderkey":      {"type": "integer", "minimum": 1},
      "o_orderstatus":   {"type": "string", "enum": ["O", "F"]},
      "o_totalprice":    {"type": "number", "exclusiveMinimum": 0, "maximum": 200000},
      "o_orderpriority": {"type": "string", "pattern": "^[1-5]-[A-Z]+$"}
    },
    "required": ["o_custkey"]
  }"""

  private val lineitemSpec = """{
    "properties": {
      "l_quantity":   {"minimum": 1, "maximum": 50, "multipleOf": 1},
      "l_discount":   {"minimum": 0, "maximum": 0.1},
      "l_tax":        {"minimum": 0, "maximum": 0.08},
      "l_returnflag": {"enum": ["A", "N", "R"]},
      "l_linestatus": {"enum": ["O"]}
    }
  }"""

  /** Flagship: full constraint suite over orders → violation rows. */
  def entry(spark: SparkSession): DataFrame = {
    val orders = t(spark, "/root/testdata/sf0.001", "orders")
    Validation.compile(ordersSpec, orders.schema)
      .violations(orders, Seq("o_orderkey"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- iter_errors analog: violation rows (keyword + schema path) ------
    "q_validate_orders" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      Validation.compile(ordersSpec, orders.schema)
        .violations(orders, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("keyword"), col("schema_path"))
        .orderBy(col("o_orderkey"), col("schema_path"))
    }),

    // -- per-check violation counts (one agg pass) -----------------------
    "q_check_stats_lineitem" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Validation.compile(lineitemSpec, li.schema)
        .checkStats(li)
        .select(col("keyword"), col("schema_path"), col("violations"))
        .orderBy(col("schema_path"), col("keyword"))
    }),

    // -- whole-table verdict (evaluate().flag() analog) ------------------
    "q_verdict_orders" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val plan = Validation.compile(ordersSpec, orders.schema)
      orders.agg(
        count(lit(1)).as("n_rows"),
        sum(when(!plan.isValidCol, 1L).otherwise(0L)).as("n_invalid"))
    }),

    // -- per-column stats: null fraction, min/max (SURVEY §2.6) ----------
    "q_stats_orders" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      TableChecks.columnStats(orders,
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
        .select(col("column").as("col_name"), col("count").as("n_rows"),
          col("nulls").as("n_nulls"), round(col("null_frac"), 6).as("null_frac"),
          col("min").as("min_val"), col("max").as("max_val"))
        .orderBy("col_name")
    }),

    // -- uniqueness violations via salted two-phase agg ------------------
    "q_unique_events_user" -> ((s, dir) => {
      TableChecks.uniquenessViolations(t(s, dir, "events"), Seq("user_id"))
        .orderBy("user_id")
    }),

    // -- referential integrity via anti join -----------------------------
    "q_ref_customers_no_events" -> ((s, dir) => {
      TableChecks.referentialViolations(
          t(s, dir, "customer"), Seq("c_custkey"),
          t(s, dir, "events"), Seq("user_id"), broadcastDim = false)
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // -- fixed-bucket histogram (drift input) ----------------------------
    "q_hist_totalprice" -> ((s, dir) => {
      TableChecks.histogram(t(s, dir, "orders"), "o_totalprice", 0d, 600000d, 12)
        .orderBy("bucket")
    }),

    // -- distribution drift: PSI + KS between two cohorts (ONE scan: the
    //    per-cohort histograms come from a single grouped aggregation) ----
    "q_drift_price_by_status" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val rows = TableChecks.histogramBy(
          orders.where(col("o_orderstatus").isin("O", "F")),
          "o_totalprice", 0d, 600000d, 12, "o_orderstatus")
        .collect()
      def hist(status: String) = rows
        .filter(_.getString(1) == status)
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val cur = hist("O"); val base = hist("F")
      val p = TableChecks.psi(cur, base); val k = TableChecks.ks(cur, base)
      val bd = BigDecimal(p).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val kd = BigDecimal(k).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      s.createDataFrame(java.util.List.of(org.apache.spark.sql.Row(bd.toDouble, kd.toDouble)),
        StructType(Seq(StructField("psi", DoubleType, false), StructField("ks", DoubleType, false))))
    }),

    // -- NESTED keyword families through the driver's hard signal
    //    (VERDICT_r02 item 3): struct + array columns built inline from
    //    lineitem, validated with properties/required/items/contains/
    //    uniqueItems/min-maxItems/minLength/enum/const over nested paths;
    //    the DuckDB oracle mirrors the per-check counts on the flat
    //    columns. Reference semantics: keywords/items.rs, contains.rs,
    //    unique_items.rs.
    "q_validate_nested" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val nested = li.select(
        struct(
          col("l_quantity").as("qty"),
          array(col("l_returnflag"), col("l_linestatus")).as("flags"),
          array(col("l_discount"), col("l_tax")).as("rates")).as("item"))
      val spec = """{
        "properties": {
          "item": {
            "type": "object",
            "required": ["qty"],
            "properties": {
              "qty": {"type": "number", "minimum": 1, "maximum": 50},
              "flags": {
                "type": "array", "minItems": 2, "maxItems": 2, "uniqueItems": true,
                "items": {"type": "string", "minLength": 1, "maxLength": 1,
                          "enum": ["A", "N", "R", "O", "F"]},
                "contains": {"const": "O"}
              },
              "rates": {
                "type": "array", "uniqueItems": true,
                "items": {"minimum": 0, "maximum": 0.06}
              }
            }
          }
        }
      }"""
      Validation.compile(spec, nested.schema)
        .checkStats(nested)
        .select(col("keyword"), col("schema_path"), col("violations"))
        .orderBy(col("schema_path"), col("keyword"))
    }),

    // -- COMBINATOR families (allOf/anyOf/oneOf/not/if-then-else/$ref)
    //    through the driver's hard signal (VERDICT_r02 item 3); oracle
    //    mirrors each combinator's truth table in SQL, including the
    //    missing-property (NULL) case where both oneOf branches pass.
    "q_validate_combinators" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val spec = """{
        "$defs": {
          "highPriority": {"properties": {"o_orderpriority": {"pattern": "^[1-2]-"}}},
          "open": {"properties": {"o_orderstatus": {"const": "O"}}}
        },
        "allOf": [
          {"properties": {"o_totalprice": {"minimum": 0}}},
          {"anyOf": [
            {"$ref": "#/$defs/highPriority"},
            {"properties": {"o_totalprice": {"maximum": 150000}}}]},
          {"properties": {"o_orderpriority": {"minLength": 7, "maxLength": 12}}}
        ],
        "oneOf": [
          {"properties": {"o_totalprice": {"maximum": 100000}}},
          {"properties": {"o_totalprice": {"minimum": 50000}}}
        ],
        "not": {"properties": {"o_orderstatus": {"const": "P"}}},
        "if": {"$ref": "#/$defs/open"},
        "then": {"properties": {"o_totalprice": {"exclusiveMinimum": 20000}}},
        "else": {"properties": {"o_orderpriority": {"minLength": 3}}}
      }"""
      Validation.compile(spec, orders.schema)
        .checkStats(orders)
        .select(col("keyword"), col("schema_path"), col("violations"))
        .orderBy(col("schema_path"), col("keyword"))
    }),

    // -- FORMAT family through the driver's hard signal (VERDICT_r03 #3):
    //    email/uuid/date/ipv4 strings derived DETERMINISTICALLY from events
    //    (identical derivation in the oracle SQL, with planted invalids —
    //    bad TLD-less emails, broken uuid separator, month 13/14 and
    //    Feb-30/31 calendar dates, octets > 255 and leading zeros), then
    //    validated by the real `format` path (Formats.scala predicates).
    "q_validate_formats" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val m = md5(col("event_id").cast(StringType).cast("binary"))
      def seg(from: Int, len: Int) = substring(m, from, len)
      val uuidOk = concat_ws("-", seg(1, 8), seg(9, 4), seg(13, 4), seg(17, 4), seg(21, 12))
      val uuidBad = concat(seg(1, 8), lit("_"), seg(9, 4), lit("-"), seg(13, 4),
        lit("-"), seg(17, 4), lit("-"), seg(21, 12))
      val derived = ev.select(
        concat(lit("u"), col("user_id").cast(StringType),
          when(col("event_id") % 7 === 0, lit("@@ex")).otherwise(lit("@ex")),
          lit(".com")).as("email"),
        when(col("event_id") % 5 === 0, uuidBad).otherwise(uuidOk).as("uuid"),
        concat(lit("2024-"), lpad((col("event_id") % 14 + 1).cast(StringType), 2, "0"),
          lit("-"), lpad((col("event_id") % 5 + 27).cast(StringType), 2, "0")).as("date"),
        when(col("event_id") % 9 === 0, lit("01.2.3.4"))
          .otherwise(concat((col("event_id") % 300).cast(StringType), lit("."),
            (col("user_id") % 256).cast(StringType), lit(".0.1"))).as("ip"))
      val spec = """{
        "properties": {
          "email": {"type": "string", "format": "email"},
          "uuid":  {"type": "string", "format": "uuid"},
          "date":  {"type": "string", "format": "date"},
          "ip":    {"type": "string", "format": "ipv4"}
        }
      }"""
      Validation.compile(spec, derived.schema)
        .checkStats(derived)
        .where(col("keyword") === "format")
        .select(col("keyword"), col("schema_path"), col("violations"))
        .orderBy(col("schema_path"))
    }),

    // -- text: token counting ---------------------------------------------
    // n_tokens cast to long: DuckDB len() yields BIGINT and the driver's
    // hash does not normalize int32 vs int64 (CORRECTNESS_r01 dtype red)
    "q_docs_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).cast(LongType).as("n_tokens"),
        TextOps.subwordCountApprox(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    }),

    // -- text: quality scoring -------------------------------------------
    // -- quality: token-repetition ratio (Gopher-style degenerate-text flag)
    "q_docs_repetition" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.repetitionRatio(col("text")).as("rep_ratio"))
        .orderBy("doc_id")
    }),

    "q_docs_quality" -> ((s, dir) => {
      val f = TextOps.qualityFeatures(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        f.getField("chars_per_token").as("chars_per_token"),
        f.getField("punct_ratio").as("punct_ratio"),
        f.getField("stopword_ratio").as("stopword_ratio"),
        TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // -- text: language-ID heuristic -------------------------------------
    "q_docs_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(TextOps.langId(col("text")).as("lang_pred"))
        .groupBy("lang_pred").agg(count(lit(1)).as("cnt"))
        .orderBy("lang_pred")
    }),

    // -- text: document fingerprinting -----------------------------------
    "q_docs_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // -- dedup: exact (hash-groupBy) --------------------------------------
    "q_docs_dedup_exact" -> ((s, dir) => {
      TextOps.exactDupGroups(t(s, dir, "documents"), "text")
        .orderBy("fingerprint")
    }),

    // -- dedup: exact n-gram Jaccard via inverted-index join --------------
    "q_docs_ngram_jaccard" -> ((s, dir) => {
      TextOps.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.12)
        .orderBy("id_a", "id_b")
    }),

    // -- dedup: pair list -> duplicate GROUPS via connected components ---
    // (alternating large-star/small-star; oracle = recursive-CTE closure)
    "q_docs_dup_components" -> ((s, dir) => {
      graft.text.Components.jaccardDupGroups(t(s, dir, "documents"),
          "doc_id", "text", n = 3, threshold = 0.12)
        .select(col("id").cast(LongType).as("id"),
          col("component").cast(LongType).as("component"),
          col("group_size"))
        .orderBy("id")
    }),

    // -- sampling: deterministic hash split (reproducible train/val) -----
    "q_docs_split" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
          graft.text.Sampling.splitAssign(col("doc_id"), 950, "split1").as("split"))
        .orderBy("doc_id")
    }),

    // -- sampling: per-group quota (stratified downsample, hash order) ---
    "q_events_quota_sample" -> ((s, dir) => {
      graft.text.Sampling.sampleQuotaPerGroup(t(s, dir, "events"),
          "event_type", "event_id", quota = 20, salt = "q1")
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id")
    }),

    // -- dedup end-to-end: corpus minus non-canonical near-duplicates ----
    "q_docs_dedup_corpus" -> ((s, dir) => {
      graft.text.Components.dedupCorpus(t(s, dir, "documents"),
          "doc_id", "text", n = 3, threshold = 0.12)
        .select(col("doc_id").cast(LongType).as("doc_id"))
        .orderBy("doc_id")
    }),

    // -- dedup: MinHash + LSH (banded), as a DETERMINISTIC CHECK: LSH
    //    candidates are verified with exact Jaccard inside minhashNearDups,
    //    so precision is guaranteed and values are exact — the query emits
    //    the comparison against the exact inverted-index pairs (which have
    //    their own oracle, q_docs_ngram_jaccard). n_exact is independently
    //    recomputed by the DuckDB oracle; the invariant columns must be
    //    0/0/true (VERDICT_r02 item 4: no_oracle → hard verdict).
    "q_docs_minhash_lsh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lsh = TextOps.minhashNearDups(docs, "doc_id", "text",
          n = 3, k = 64, rowsPerBand = 4, threshold = 0.12)
        .select(col("id_a"), col("id_b"), col("jaccard").as("j_lsh"))
      val exact = TextOps.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.12)
        .select(col("id_a"), col("id_b"), col("jaccard").as("j_exact"))
      exact.join(lsh, Seq("id_a", "id_b"), "full_outer").agg(
        coalesce(sum(when(col("j_exact").isNotNull, 1L).otherwise(0L)), lit(0L)).as("n_exact"),
        coalesce(sum(when(col("j_exact").isNull, 1L).otherwise(0L)), lit(0L)).as("precision_violations"),
        coalesce(sum(when(col("j_lsh").isNotNull && col("j_exact").isNotNull &&
          col("j_lsh") =!= col("j_exact"), 1L).otherwise(0L)), lit(0L)).as("value_mismatches"),
        coalesce(sum(when(col("j_lsh").isNotNull && col("j_exact").isNotNull, 1d).otherwise(0d)) /
          sum(when(col("j_exact").isNotNull, 1d).otherwise(0d)) >= 0.9, lit(true)).as("recall_ok"))
    }),

    // -- dedup: SimHash near-dups as a DETERMINISTIC CHECK. The pigeonhole
    //    banding (4 chunks, hamming<=3 ⇒ some chunk equal) guarantees FULL
    //    recall wrt "simhash hamming <= maxHamming", and candidates are
    //    verified with exact hamming — so banded output must EQUAL the
    //    brute-force all-pairs set. DuckDB cannot compute xxhash-based
    //    simhash, so the query emits the set-equality verdict (both
    //    directions) + the hamming-bound invariant.
    "q_docs_simhash" -> ((s, dir) => {
      val withH = t(s, dir, "documents")
        .select(col("doc_id").as("id"), TextOps.simhash(col("text")).as("h"))
      // (r06: spreading the brute-join stream side was A/B'd twice —
      // no measurable win at this scale; the hamming loop is too cheap)
      val a = withH.alias("a"); val b = withH.alias("b")
      val brute = a.join(b, col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          TextOps.hamming64(col("a.h"), col("b.h")).as("ham_exact"))
        .where(col("ham_exact") <= 3)
      val banded = TextOps.simhashNearDups(t(s, dir, "documents"), "doc_id", "text",
          maxHamming = 3, nChunks = 4)
        .select(col("id_a"), col("id_b"), col("hamming").as("ham_banded"))
      brute.join(banded, Seq("id_a", "id_b"), "full_outer").agg(
        coalesce(sum(when(col("ham_exact").isNull, 1L).otherwise(0L)), lit(0L)).as("extra_pairs"),
        coalesce(sum(when(col("ham_banded").isNull, 1L).otherwise(0L)), lit(0L)).as("missing_pairs"),
        coalesce(sum(when(col("ham_banded").isNotNull && col("ham_exact").isNotNull &&
          col("ham_banded") =!= col("ham_exact"), 1L).otherwise(0L)), lit(0L)).as("hamming_mismatches"))
    }),

    // -- similarity search: brute-force cosine top-k ----------------------
    "q_ann_top5" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      Ann.topKCosine(emb.where(col("vec_id") =!= 0), "embedding", "vec_id", q, 5)
    }),

    // -- similarity search: IVF (inverted-file) top-k. Full probe is
    //    provably exhaustive, so it shares the brute-force oracle; at scale
    //    nProbe << nLists prunes list_id partitions ----------------------
    "q_ann_ivf_top5" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val rest = emb.where(col("vec_id") =!= 0)
      val cents = Ann.ivfTrain(rest, "vec_id", "embedding", nLists = 8, iters = 3)
      Ann.ivfTopK(Ann.ivfAssign(rest, "vec_id", "embedding", cents),
        "vec_id", "embedding", cents, q, 5, nProbe = 8)
    }),

    // -- similarity search: LSH-bucketed ANN top-k as a DETERMINISTIC
    //    CHECK against brute force (which has its own oracle, q_ann_top5):
    //    survivors' cosines are exact, so any overlap must value-match;
    //    recall@5 of the multi-probe prefilter is deterministic for the
    //    fixed seed and asserted >= 4/5.
    "q_ann_lsh_top5" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val rest = emb.where(col("vec_id") =!= 0)
      val lsh = Ann.topKCosineLsh(rest, "embedding", "vec_id",
          q, k = 5, dim = 64, bits = 8, probeHamming = 3)
        .select(col("id"), col("cos").as("cos_lsh"))
      val exact = Ann.topKCosine(rest, "embedding", "vec_id", q, 5)
        .select(col("id"), col("cos").as("cos_exact"))
      exact.join(lsh, Seq("id"), "full_outer").agg(
        coalesce(sum(when(col("cos_lsh").isNotNull, 1L).otherwise(0L)), lit(0L)).as("n_returned"),
        coalesce(sum(when(col("cos_lsh").isNotNull && col("cos_exact").isNotNull &&
          col("cos_lsh") =!= col("cos_exact"), 1L).otherwise(0L)), lit(0L)).as("value_mismatches"),
        (coalesce(sum(when(col("cos_lsh").isNotNull && col("cos_exact").isNotNull, 1L)
          .otherwise(0L)), lit(0L)) >= 4L).as("recall_at_5_ok"))
    }),

    // -- dedup: embedding-cosine near-dup, exact all-pairs (oracle path) --
    "q_emb_near_dup_exact" -> ((s, dir) => {
      Ann.cosineNearDupsExact(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
        .orderBy("id_a", "id_b")
    }),

    // -- dedup: embedding-cosine near-dup via sign-LSH buckets as a
    //    DETERMINISTIC CHECK against the exact all-pairs query (its own
    //    oracle: q_emb_near_dup_exact). Bits/bands are DERIVED from
    //    (threshold=0.4, targetRecall=0.95) via the S-curve — the r02
    //    explicit bits=8 setup had ~10% recall at this threshold
    //    (VERDICT_r02 "What's wrong" #3). Survivor cosines are exact, so
    //    overlap pairs must value-match; recall asserted >= 0.9.
    "q_emb_near_dup_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val lsh = Ann.cosineNearDups(emb, "vec_id", "embedding",
          dim = 64, threshold = 0.4, targetRecall = 0.95)
        .select(col("id_a"), col("id_b"), col("cos").as("cos_lsh"))
      val exact = Ann.cosineNearDupsExact(emb, "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b"), col("cos").as("cos_exact"))
      exact.join(lsh, Seq("id_a", "id_b"), "full_outer").agg(
        coalesce(sum(when(col("cos_exact").isNotNull, 1L).otherwise(0L)), lit(0L)).as("n_exact"),
        coalesce(sum(when(col("cos_exact").isNull, 1L).otherwise(0L)), lit(0L)).as("precision_violations"),
        coalesce(sum(when(col("cos_lsh").isNotNull && col("cos_exact").isNotNull &&
          col("cos_lsh") =!= col("cos_exact"), 1L).otherwise(0L)), lit(0L)).as("value_mismatches"),
        coalesce(sum(when(col("cos_lsh").isNotNull && col("cos_exact").isNotNull, 1d).otherwise(0d)) /
          sum(when(col("cos_exact").isNotNull, 1d).otherwise(0d)) >= 0.9, lit(true)).as("recall_ok"))
    }),

    // -- classic OLAP: aggregation with exact decimal sums ----------------
    // sums computed exactly in decimal, emitted as double: Spark's sum
    // widens to decimal(28,2)/(34,4) while DuckDB widens to (38,*), and the
    // driver's hash does not normalize decimal precision (CORRECTNESS_r01
    // dtype red). decimal→double is IEEE round-to-nearest on both engines.
    "q_agg_lineitem_pricing" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_base_price"),
          sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(BigDecimal(1)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast(DecimalType(24, 4))).cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // -- classic OLAP: broadcast-joined rollup -----------------------------
    "q_join_revenue_by_segment" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    // -- window functions: first event per user ----------------------------
    "q_window_first_event" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy("user_id")
    }),

    // -- exact quantiles (sort-based; approx sketch variant is rows-only) --
    "q_quantiles_lineitem" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.agg(
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("l_extendedprice"), lit(0.95)), 4).as("p95"),
        round(percentile(col("l_extendedprice"), lit(0.99)), 4).as("p99"))
    }),

    // -- mergeable quantile sketch as a DETERMINISTIC CHECK: the GK-family
    //    sketch guarantees rank(v) within eps*n of q*n (eps = 1/accuracy),
    //    so each sketched value is verified against its exact rank bounds
    //    in one extra scan — a hard verdict on an approximate operator
    //    (VERDICT_r02 item 4). Driver-side assembly is 6 bounded rows.
    "q_quantiles_sketch" -> ((s, dir) => {
      val qs = Seq(0.5, 0.95, 0.99)
      val sketchCols = Seq("l_extendedprice", "l_quantity")
      val acc = 10000
      val eps = 1.0 / acc
      val li = t(s, dir, "lineitem")
      val sk = TableChecks.quantileSketch(li, sketchCols, qs, acc).collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val aggs = sketchCols.flatMap { c =>
        count(col(c)).as(s"n__$c") +:
          qs.indices.flatMap { i =>
            Seq(sum(when(col(c) <= sk(c)(i), 1L).otherwise(0L)).as(s"le__${c}__$i"),
                sum(when(col(c) < sk(c)(i), 1L).otherwise(0L)).as(s"lt__${c}__$i"))
          }
      }
      val row = li.agg(aggs.head, aggs.tail: _*).collect()(0)
      val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
      for { c <- sketchCols; (q, i) <- qs.zipWithIndex } {
        val n = row.getAs[Long](s"n__$c").toDouble
        val le = row.getAs[Long](s"le__${c}__$i")
        val lt = row.getAs[Long](s"lt__${c}__$i")
        val ok = le >= math.floor((q - eps) * n) && (lt + 1) <= math.ceil((q + eps) * n)
        out.add(org.apache.spark.sql.Row(c, q, ok))
      }
      s.createDataFrame(out, StructType(Seq(
          StructField("col_name", StringType, false),
          StructField("q", DoubleType, false),
          StructField("rank_ok", BooleanType, false))))
        .orderBy("col_name", "q")
    }),

    // -- contentSchema: nested validation of string-encoded JSON ----------
    "q_events_content_schema" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val spec = """{"properties":{"props":{
        "contentMediaType": "application/json",
        "contentSchema": {"type": "object", "required": ["k"],
                          "properties": {"k": {"type": "integer", "minimum": 50}}}}}}"""
      val plan = Validation.compile(spec, ev.schema)
      ev.agg(count(lit(1)).as("n_rows"),
        sum(when(!plan.isValidCol, 1L).otherwise(0L)).as("n_invalid"))
    }),

    // -- contentMediaType application/json + field extraction -------------
    "q_events_props_json" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.agg(
        sum(when(try_parse_json(col("props")).isNull, 1L).otherwise(0L)).as("n_bad_json"),
        sum(when(get_json_object(col("props"), "$.k").cast(IntegerType) >= 50, 1L)
          .otherwise(0L)).as("n_k_high"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_validate_orders" -> """
      SELECT o_orderkey, 'minimum' AS keyword, '/properties/o_orderkey/minimum' AS schema_path
        FROM orders WHERE o_orderkey IS NOT NULL AND NOT (o_orderkey >= 1)
      UNION ALL
      SELECT o_orderkey, 'enum', '/properties/o_orderstatus/enum'
        FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F')
      UNION ALL
      SELECT o_orderkey, 'exclusiveMinimum', '/properties/o_totalprice/exclusiveMinimum'
        FROM orders WHERE o_totalprice IS NOT NULL AND NOT (o_totalprice > 0)
      UNION ALL
      SELECT o_orderkey, 'maximum', '/properties/o_totalprice/maximum'
        FROM orders WHERE o_totalprice IS NOT NULL AND NOT (o_totalprice <= 200000)
      UNION ALL
      SELECT o_orderkey, 'pattern', '/properties/o_orderpriority/pattern'
        FROM orders WHERE o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$')
      UNION ALL
      SELECT o_orderkey, 'required', '/required'
        FROM orders WHERE o_custkey IS NULL
      ORDER BY o_orderkey, schema_path""",

    "q_check_stats_lineitem" -> """
      SELECT * FROM (
        SELECT 'minimum' AS keyword, '/properties/l_quantity/minimum' AS schema_path,
               count(*) FILTER (WHERE l_quantity < 1) AS violations FROM lineitem
        UNION ALL SELECT 'maximum', '/properties/l_quantity/maximum',
               count(*) FILTER (WHERE l_quantity > 50) FROM lineitem
        UNION ALL SELECT 'multipleOf', '/properties/l_quantity/multipleOf',
               count(*) FILTER (WHERE l_quantity <> floor(l_quantity)) FROM lineitem
        UNION ALL SELECT 'minimum', '/properties/l_discount/minimum',
               count(*) FILTER (WHERE l_discount < 0) FROM lineitem
        UNION ALL SELECT 'maximum', '/properties/l_discount/maximum',
               count(*) FILTER (WHERE l_discount > 0.1) FROM lineitem
        UNION ALL SELECT 'minimum', '/properties/l_tax/minimum',
               count(*) FILTER (WHERE l_tax < 0) FROM lineitem
        UNION ALL SELECT 'maximum', '/properties/l_tax/maximum',
               count(*) FILTER (WHERE l_tax > 0.08) FROM lineitem
        UNION ALL SELECT 'enum', '/properties/l_returnflag/enum',
               count(*) FILTER (WHERE l_returnflag IS NULL OR l_returnflag NOT IN ('A','N','R')) FROM lineitem
        UNION ALL SELECT 'enum', '/properties/l_linestatus/enum',
               count(*) FILTER (WHERE l_linestatus IS NULL OR l_linestatus NOT IN ('O')) FROM lineitem
      ) ORDER BY schema_path, keyword""",

    "q_validate_nested" -> """
      SELECT * FROM (
        SELECT 'contains' AS keyword, '/properties/item/properties/flags/contains' AS schema_path,
               count(*) FILTER (WHERE NOT (coalesce(l_returnflag = 'O', false)
                                        OR coalesce(l_linestatus = 'O', false))) AS violations
        FROM lineitem
        UNION ALL SELECT 'items', '/properties/item/properties/flags/items',
               count(*) FILTER (WHERE
                    (l_returnflag IS NOT NULL AND (length(l_returnflag) <> 1
                       OR l_returnflag NOT IN ('A','N','R','O','F')))
                 OR (l_linestatus IS NOT NULL AND (length(l_linestatus) <> 1
                       OR l_linestatus NOT IN ('A','N','R','O','F')))) FROM lineitem
        UNION ALL SELECT 'maxItems', '/properties/item/properties/flags/maxItems',
               count(*) FILTER (WHERE false) FROM lineitem
        UNION ALL SELECT 'minItems', '/properties/item/properties/flags/minItems',
               count(*) FILTER (WHERE false) FROM lineitem
        UNION ALL SELECT 'type', '/properties/item/properties/flags/type',
               count(*) FILTER (WHERE false) FROM lineitem
        UNION ALL SELECT 'uniqueItems', '/properties/item/properties/flags/uniqueItems',
               count(*) FILTER (WHERE l_returnflag = l_linestatus) FROM lineitem
        UNION ALL SELECT 'maximum', '/properties/item/properties/qty/maximum',
               count(*) FILTER (WHERE l_quantity IS NOT NULL AND l_quantity > 50) FROM lineitem
        UNION ALL SELECT 'minimum', '/properties/item/properties/qty/minimum',
               count(*) FILTER (WHERE l_quantity IS NOT NULL AND l_quantity < 1) FROM lineitem
        UNION ALL SELECT 'type', '/properties/item/properties/qty/type',
               count(*) FILTER (WHERE false) FROM lineitem
        UNION ALL SELECT 'items', '/properties/item/properties/rates/items',
               count(*) FILTER (WHERE
                    (l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.06))
                 OR (l_tax IS NOT NULL AND (l_tax < 0 OR l_tax > 0.06))) FROM lineitem
        UNION ALL SELECT 'type', '/properties/item/properties/rates/type',
               count(*) FILTER (WHERE false) FROM lineitem
        UNION ALL SELECT 'uniqueItems', '/properties/item/properties/rates/uniqueItems',
               count(*) FILTER (WHERE l_discount = l_tax) FROM lineitem
        UNION ALL SELECT 'required', '/properties/item/required',
               count(*) FILTER (WHERE l_quantity IS NULL) FROM lineitem
        UNION ALL SELECT 'type', '/properties/item/type',
               count(*) FILTER (WHERE false) FROM lineitem
      ) ORDER BY schema_path, keyword""",

    "q_validate_formats" -> """
      WITH d AS (
        SELECT
          'u' || user_id::VARCHAR ||
            (CASE WHEN event_id % 7 = 0 THEN '@@ex' ELSE '@ex' END) || '.com' AS email,
          (CASE WHEN event_id % 5 = 0
            THEN substr(md5(event_id::VARCHAR),1,8) || '_' || substr(md5(event_id::VARCHAR),9,4)
                 || '-' || substr(md5(event_id::VARCHAR),13,4) || '-' || substr(md5(event_id::VARCHAR),17,4)
                 || '-' || substr(md5(event_id::VARCHAR),21,12)
            ELSE substr(md5(event_id::VARCHAR),1,8) || '-' || substr(md5(event_id::VARCHAR),9,4)
                 || '-' || substr(md5(event_id::VARCHAR),13,4) || '-' || substr(md5(event_id::VARCHAR),17,4)
                 || '-' || substr(md5(event_id::VARCHAR),21,12) END) AS uu,
          '2024-' || lpad((event_id % 14 + 1)::VARCHAR, 2, '0')
                  || '-' || lpad((event_id % 5 + 27)::VARCHAR, 2, '0') AS dt,
          (CASE WHEN event_id % 9 = 0 THEN '01.2.3.4'
            ELSE (event_id % 300)::VARCHAR || '.' || (user_id % 256)::VARCHAR || '.0.1' END) AS ip
        FROM events)
      SELECT * FROM (
        SELECT 'format' AS keyword, '/properties/date/format' AS schema_path,
               count(*) FILTER (WHERE NOT (length(dt) = 10
                 AND regexp_matches(dt, '^[0-9]{4}-[0-9]{2}-[0-9]{2}$')
                 AND try_cast(dt AS DATE) IS NOT NULL))::BIGINT AS violations
        FROM d
        UNION ALL SELECT 'format', '/properties/email/format',
               count(*) FILTER (WHERE NOT regexp_matches(email,
                 '^[A-Za-z0-9.!#$%&''*+/=?^_`{|}~-]+@[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?(\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$'))::BIGINT
        FROM d
        UNION ALL SELECT 'format', '/properties/ip/format',
               count(*) FILTER (WHERE NOT (length(ip) BETWEEN 7 AND 15
                 AND regexp_matches(ip, '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$')))::BIGINT
        FROM d
        UNION ALL SELECT 'format', '/properties/uuid/format',
               count(*) FILTER (WHERE NOT (length(uu) = 36
                 AND regexp_matches(uu, '^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$')))::BIGINT
        FROM d)
      ORDER BY schema_path""",

    "q_validate_combinators" -> """
      SELECT * FROM (
        SELECT 'minimum' AS keyword, '/allOf/0/properties/o_totalprice/minimum' AS schema_path,
               count(*) FILTER (WHERE o_totalprice IS NOT NULL AND o_totalprice < 0) AS violations
        FROM orders
        UNION ALL SELECT 'anyOf', '/allOf/1/anyOf',
               count(*) FILTER (WHERE
                    (o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-2]-'))
                AND (o_totalprice IS NOT NULL AND o_totalprice > 150000)) FROM orders
        UNION ALL SELECT 'maxLength', '/allOf/2/properties/o_orderpriority/maxLength',
               count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                 AND length(o_orderpriority) > 12) FROM orders
        UNION ALL SELECT 'minLength', '/allOf/2/properties/o_orderpriority/minLength',
               count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                 AND length(o_orderpriority) < 7) FROM orders
        UNION ALL SELECT 'if', '/if',
               count(*) FILTER (WHERE CASE WHEN o_orderstatus IS NULL OR o_orderstatus = 'O'
                    THEN o_totalprice IS NOT NULL AND NOT (o_totalprice > 20000)
                    ELSE o_orderpriority IS NOT NULL AND length(o_orderpriority) < 3 END) FROM orders
        UNION ALL SELECT 'not', '/not',
               count(*) FILTER (WHERE o_orderstatus IS NULL OR o_orderstatus = 'P') FROM orders
        UNION ALL SELECT 'oneOf', '/oneOf',
               count(*) FILTER (WHERE
                    (CASE WHEN o_totalprice IS NULL OR o_totalprice <= 100000 THEN 1 ELSE 0 END
                   + CASE WHEN o_totalprice IS NULL OR o_totalprice >= 50000 THEN 1 ELSE 0 END) <> 1)
        FROM orders
      ) ORDER BY schema_path, keyword""",

    "q_verdict_orders" -> """
      SELECT count(*) AS n_rows,
             count(*) FILTER (WHERE
                  (o_orderkey IS NULL OR o_orderkey < 1)
               OR (o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F'))
               OR (o_totalprice IS NULL OR NOT (o_totalprice > 0) OR o_totalprice > 200000)
               OR (o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$'))
               OR o_custkey IS NULL) AS n_invalid
      FROM orders""",

    "q_stats_orders" -> """
      SELECT * FROM (
        SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
               count(*) - count(o_orderkey) AS n_nulls,
               round((count(*) - count(o_orderkey)) / count(*)::DOUBLE, 6) AS null_frac,
               min(o_orderkey)::VARCHAR AS min_val, max(o_orderkey)::VARCHAR AS max_val FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
               round((count(*) - count(o_custkey)) / count(*)::DOUBLE, 6),
               min(o_custkey)::VARCHAR, max(o_custkey)::VARCHAR FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
               round((count(*) - count(o_orderstatus)) / count(*)::DOUBLE, 6),
               min(o_orderstatus), max(o_orderstatus) FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
               round((count(*) - count(o_totalprice)) / count(*)::DOUBLE, 6),
               min(o_totalprice)::VARCHAR, max(o_totalprice)::VARCHAR FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
               round((count(*) - count(o_orderpriority)) / count(*)::DOUBLE, 6),
               min(o_orderpriority), max(o_orderpriority) FROM orders
      ) ORDER BY col_name""",

    "q_unique_events_user" -> """
      SELECT user_id, count(*) AS cnt FROM events
      GROUP BY user_id HAVING count(*) > 1 ORDER BY user_id""",

    "q_ref_customers_no_events" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
      ORDER BY c_custkey""",

    "q_hist_totalprice" -> """
      SELECT bucket, count(*) AS cnt FROM (
        SELECT CASE WHEN o_totalprice < 0 THEN -1
                    WHEN o_totalprice >= 600000 THEN 12
                    ELSE floor(o_totalprice / 50000)::BIGINT END AS bucket
        FROM orders WHERE o_totalprice IS NOT NULL)
      GROUP BY bucket ORDER BY bucket""",

    "q_drift_price_by_status" -> """
      WITH buckets AS (
        SELECT CASE WHEN o_totalprice < 0 THEN -1
                    WHEN o_totalprice >= 600000 THEN 12
                    ELSE floor(o_totalprice / 50000)::BIGINT END AS bucket,
               o_orderstatus AS st
        FROM orders WHERE o_totalprice IS NOT NULL AND o_orderstatus IN ('O','F')),
      h AS (
        SELECT bucket,
               count(*) FILTER (WHERE st = 'O') AS c,
               count(*) FILTER (WHERE st = 'F') AS b
        FROM buckets GROUP BY bucket),
      tot AS (SELECT sum(c) AS ct, sum(b) AS bt FROM h),
      pq AS (
        SELECT bucket,
               greatest(c / ct::DOUBLE, 1e-6) AS p,
               greatest(b / bt::DOUBLE, 1e-6) AS q,
               c / ct::DOUBLE AS pr, b / bt::DOUBLE AS qr
        FROM h, tot),
      cdf AS (
        SELECT sum(pr) OVER (ORDER BY bucket) AS cp,
               sum(qr) OVER (ORDER BY bucket) AS cq
        FROM pq)
      SELECT (SELECT round(sum((p - q) * ln(p / q)), 4) FROM pq) AS psi,
             (SELECT round(max(abs(cp - cq)), 4) FROM cdf) AS ks""",

    "q_docs_tokens" -> """
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                  ELSE list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                       t -> ceil(length(t) / 4.0)::BIGINT)) END::BIGINT AS n_subwords
      FROM documents ORDER BY doc_id""",

    "q_docs_repetition" -> """
      WITH w AS (
        SELECT doc_id,
               CASE WHEN text IS NULL OR trim(text) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\s+') END AS tk
        FROM documents)
      SELECT doc_id,
             CASE WHEN len(tk) = 0 THEN 0.0
                  ELSE round(1.0 - len(list_distinct(tk))::DOUBLE / len(tk), 4) END AS rep_ratio
      FROM w ORDER BY doc_id""",

    "q_docs_quality" -> """
      WITH f AS (
        SELECT doc_id,
               length(text) AS nc,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS nt,
               length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS alnum,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
                         t -> t IN ('the','a','an','and','or','of','to','in','is','it',
                                    'that','for','on','with','as','was','at','by','be'))) END AS stop
        FROM documents),
      r AS (
        SELECT doc_id,
               round(CASE WHEN nt > 0 THEN nc / nt::DOUBLE ELSE 0 END, 4) AS chars_per_token,
               round(CASE WHEN nc > 0 THEN (nc - alnum) / nc::DOUBLE ELSE 0 END, 4) AS punct_ratio,
               round(CASE WHEN nt > 0 THEN stop / nt::DOUBLE ELSE 0 END, 4) AS stopword_ratio,
               nt FROM f)
      SELECT doc_id, chars_per_token, punct_ratio, stopword_ratio,
             round(least(nt / 20.0, 1.0) * 0.5
                 + greatest(0.0, 1.0 - punct_ratio * 4) * 0.3
                 + least(stopword_ratio * 5, 1.0) * 0.2, 4) AS quality
      FROM r ORDER BY doc_id""",

    "q_docs_langid" -> """
      WITH toks AS (
        SELECT CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\s+') END AS w
        FROM documents),
      hits AS (
        SELECT len(list_filter(w, t -> t IN ('the','and','of','to','is','in','that','it','was','for'))) AS en,
               len(list_filter(w, t -> t IN ('der','die','das','und','ist','nicht','mit','ein','zu','den'))) AS de,
               len(list_filter(w, t -> t IN ('el','la','que','de','los','las','una','por','con','para'))) AS es,
               len(list_filter(w, t -> t IN ('le','la','les','et','des','est','une','dans','pour','que'))) AS fr
        FROM toks),
      pred AS (
        SELECT CASE WHEN greatest(en, de, es, fr) = 0 THEN 'und'
                    WHEN fr = greatest(en, de, es, fr) THEN 'fr'
                    WHEN es = greatest(en, de, es, fr) THEN 'es'
                    WHEN en = greatest(en, de, es, fr) THEN 'en'
                    ELSE 'de' END AS lang_pred
        FROM hits)
      SELECT lang_pred, count(*) AS cnt FROM pred GROUP BY lang_pred ORDER BY lang_pred""",

    "q_docs_fingerprint" -> """
      SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      FROM documents ORDER BY doc_id""",

    "q_docs_dedup_exact" -> """
      SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint,
             count(*) AS cnt
      FROM documents GROUP BY fingerprint HAVING count(*) > 1 ORDER BY fingerprint""",

    "q_docs_ngram_jaccard" -> """
      WITH t AS (
        SELECT doc_id,
               string_split_regex(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
        FROM documents),
      s AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS sh
        FROM t WHERE len(w) >= 3),
      inv AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS g FROM s),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
               count(*) AS common
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)
      SELECT id_a, id_b, round(common / (sz_a + sz_b - common)::DOUBLE, 4) AS jaccard
      FROM pairs
      WHERE common / (sz_a + sz_b - common)::DOUBLE >= 0.12
      ORDER BY id_a, id_b""",

    "q_docs_split" -> """
      SELECT doc_id,
             CASE WHEN ('0x' || substring(md5('split1' || doc_id::VARCHAR), 1, 8))::BIGINT
                       % 1000 < 950
                  THEN 'train' ELSE 'val' END AS split
      FROM documents ORDER BY doc_id""",

    "q_events_quota_sample" -> """
      SELECT event_id, event_type FROM (
        SELECT event_id, event_type,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY ('0x' || substring(md5('q1' || event_id::VARCHAR), 1, 8))::BIGINT
                          % 1000000000, event_id) AS rk
        FROM events) WHERE rk <= 20
      ORDER BY event_id""",

    "q_docs_dedup_corpus" -> """
      WITH RECURSIVE t AS (
        SELECT doc_id,
               string_split_regex(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
        FROM documents),
      s AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS sh
        FROM t WHERE len(w) >= 3),
      inv AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS g FROM s),
      p AS (
        SELECT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                 count(*) AS common
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        WHERE common / (sz_a + sz_b - common)::DOUBLE >= 0.12),
      edges AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
      reach AS (
        SELECT u AS src, v AS dst FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst),
      comp AS (
        SELECT src AS id, least(src, min(dst)) AS component FROM reach GROUP BY src)
      SELECT d.doc_id FROM documents d
      WHERE d.doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
      ORDER BY d.doc_id""",

    "q_docs_dup_components" -> """
      WITH RECURSIVE t AS (
        SELECT doc_id,
               string_split_regex(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
        FROM documents),
      s AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS sh
        FROM t WHERE len(w) >= 3),
      inv AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS g FROM s),
      p AS (
        SELECT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                 count(*) AS common
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        WHERE common / (sz_a + sz_b - common)::DOUBLE >= 0.12),
      edges AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
      reach AS (
        SELECT u AS src, v AS dst FROM edges
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst),
      comp AS (
        SELECT src AS id, least(src, min(dst)) AS component FROM reach GROUP BY src)
      SELECT c.id, c.component, g.group_size
      FROM comp c JOIN (
        SELECT component, count(*) AS group_size FROM comp GROUP BY 1) g
        ON c.component = g.component
      ORDER BY c.id""",

    "q_ann_ivf_top5" -> """
      SELECT e2.vec_id AS id,
             round(list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[])
               / (sqrt(list_dot_product(e1.embedding::DOUBLE[], e1.embedding::DOUBLE[]))
                * sqrt(list_dot_product(e2.embedding::DOUBLE[], e2.embedding::DOUBLE[]))), 4) AS cos
      FROM embeddings e1, embeddings e2
      WHERE e1.vec_id = 0 AND e2.vec_id <> 0
      ORDER BY cos DESC, id LIMIT 5""",

    "q_ann_top5" -> """
      SELECT e2.vec_id AS id,
             round(list_dot_product(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[])
               / (sqrt(list_dot_product(e1.embedding::DOUBLE[], e1.embedding::DOUBLE[]))
                * sqrt(list_dot_product(e2.embedding::DOUBLE[], e2.embedding::DOUBLE[]))), 4) AS cos
      FROM embeddings e1, embeddings e2
      WHERE e1.vec_id = 0 AND e2.vec_id <> 0
      ORDER BY cos DESC, id LIMIT 5""",

    // The LSH/sketch checks emit deterministic invariant verdicts; the
    // oracle independently recomputes the data-derived counts (n_exact)
    // and asserts the invariants (precision/value/recall/rank bounds).
    "q_docs_minhash_lsh" -> """
      WITH t AS (
        SELECT doc_id,
               string_split_regex(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS w
        FROM documents),
      s AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS sh
        FROM t WHERE len(w) >= 3),
      inv AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS g FROM s),
      p AS (
        SELECT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                 count(*) AS common
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        WHERE common / (sz_a + sz_b - common)::DOUBLE >= 0.12)
      SELECT (SELECT count(*) FROM p) AS n_exact,
             0::BIGINT AS precision_violations,
             0::BIGINT AS value_mismatches,
             true AS recall_ok""",

    "q_docs_simhash" -> """
      SELECT 0::BIGINT AS extra_pairs, 0::BIGINT AS missing_pairs,
             0::BIGINT AS hamming_mismatches""",

    "q_ann_lsh_top5" -> """
      SELECT 5::BIGINT AS n_returned, 0::BIGINT AS value_mismatches,
             true AS recall_at_5_ok""",

    "q_emb_near_dup_lsh" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4)
      SELECT (SELECT count(*) FROM p) AS n_exact,
             0::BIGINT AS precision_violations,
             0::BIGINT AS value_mismatches,
             true AS recall_ok""",

    "q_quantiles_sketch" -> """
      SELECT * FROM (VALUES
        ('l_extendedprice', 0.5::DOUBLE, true), ('l_extendedprice', 0.95::DOUBLE, true),
        ('l_extendedprice', 0.99::DOUBLE, true),
        ('l_quantity', 0.5::DOUBLE, true), ('l_quantity', 0.95::DOUBLE, true),
        ('l_quantity', 0.99::DOUBLE, true)) AS t(col_name, q, rank_ok)
      ORDER BY col_name, q""",

    "q_emb_near_dup_exact" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
      ORDER BY id_a, id_b""",

    "q_agg_lineitem_pricing" -> """
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
             sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
             sum((l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2)))::DECIMAL(24,4))::DOUBLE AS sum_disc_price,
             count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q_join_revenue_by_segment" -> """
      SELECT c_mktsegment,
             sum(o_totalprice::DECIMAL(18,2)) AS revenue,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_window_first_event" -> """
      SELECT user_id, event_id, event_type FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events)
      WHERE rn = 1 ORDER BY user_id""",

    "q_quantiles_lineitem" -> """
      SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
             round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      FROM lineitem""",

    "q_events_content_schema" -> """
      SELECT count(*) AS n_rows,
             count(*) FILTER (WHERE props IS NOT NULL AND (
                  try_cast(props AS JSON) IS NULL
               OR json_extract(props, '$.k') IS NULL
               OR json_type(json_extract(props, '$.k')) NOT IN ('BIGINT', 'UBIGINT')
               OR try_cast(json_extract_string(props, '$.k') AS BIGINT) < 50)) AS n_invalid
      FROM events""",

    "q_events_props_json" -> """
      SELECT count(*) FILTER (WHERE try_cast(props AS JSON) IS NULL) AS n_bad_json,
             count(*) FILTER (WHERE try_cast(json_extract_string(props, '$.k') AS INTEGER) >= 50) AS n_k_high
      FROM events""",
  )
}
