package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-field record support — the reference's core ER shape: a record has
 * several text fields, each with its own signature config, blocking keys are
 * OR-unioned across fields, and the final pair score is a config-weighted
 * combination of per-field similarities.
 *
 * Reference mapping:
 *  - field config dict + validation: field_config_parser.py:29-150 (S4/P1);
 *    `source` below = the reference's `key` remap (n configs over one
 *    source column);
 *  - OR-blocking union across fields: record pooling, models.py:177-198 (P12);
 *  - weighted pair score: the attention-weighted record pool analog —
 *    deterministic config weights instead of learned attention;
 *  - "empty must not match empty" (models.py:253-256): an empty field scores
 *    0 against anything, while its weight stays in the denominator.
 *
 * EXACT by construction: weighted-average >= t implies max per-field
 * Jaccard >= t, so the union of per-field prefix-filter joins (SetSimJoin)
 * at threshold t is a COMPLETE candidate set — no LSH recall caveat. All
 * shuffles are equi-joins; scales like SetSimJoin.
 */
object MultiField {

  /** One field's signature config. `source` is the input column (defaults to
    * the field name — override to define several configs over one column).
    * `maxStrLen` / `vocabSize` are derived stats bound by [[bindStats]]
    * (the reference's stats pass, field_config_parser.py:75-118) — None
    * until bound, exactly like the reference's `max_str_len: None` configs
    * (tests/test_data_utils_helpers.py:31-47). */
  final case class FieldSpec(
      field: String,
      source: String,
      sigType: String, // "syntactic" (char shingles) | "semantic" (word tokens)
      weight: Double,
      shingleK: Int = 5,
      maxStrLen: Option[Long] = None,
      vocabSize: Option[Long] = None)

  val sigTypes: Set[String] = Set("syntactic", "semantic")

  /**
   * Parse + validate a field-config JSON object (reference
   * field_config_parser.py error semantics):
   * {"title": {"sig_type": "syntactic", "weight": 2.0},
   *  "title_tokens": {"source": "title", "sig_type": "semantic"}}
   */
  def parseConfigs(json: String): Seq[FieldSpec] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(json) match {
      case JObject(fields) => fields
      case _ => throw new IllegalArgumentException(
        "field config must be a JSON object of field -> config")
    }
    if (parsed.isEmpty)
      throw new IllegalArgumentException("field config dict is empty")
    val specs = parsed.map {
      case (field, JObject(cfg)) =>
        val m = cfg.toMap
        if (m.isEmpty) throw new IllegalArgumentException(
          s"""Please set the value of "$field" in the field config dict""")
        val sigType = m.get("sig_type") match {
          case Some(JString(s)) => s
          case None => "syntactic"
          case Some(other) => throw new IllegalArgumentException(
            s"""field "$field": sig_type must be a string, got $other""")
        }
        if (!sigTypes.contains(sigType)) throw new IllegalArgumentException(
          s"""field "$field": unknown sig_type "$sigType" (available: ${sigTypes.mkString(", ")})""")
        val weight = m.get("weight") match {
          case Some(JDouble(w)) => w
          case Some(JInt(w)) => w.toDouble
          case None => 1.0
          case Some(other) => throw new IllegalArgumentException(
            s"""field "$field": weight must be a number, got $other""")
        }
        if (weight <= 0) throw new IllegalArgumentException(
          s"""field "$field": weight must be > 0, got $weight""")
        val source = m.get("source") match {
          case Some(JString(s)) => s
          case None => field
          case Some(other) => throw new IllegalArgumentException(
            s"""field "$field": source must be a string, got $other""")
        }
        val k = m.get("shingle_k") match {
          case Some(JInt(v)) => v.toInt
          case None => 5
          case Some(other) => throw new IllegalArgumentException(
            s"""field "$field": shingle_k must be an int, got $other""")
        }
        if (k < 1) throw new IllegalArgumentException(
          s"""field "$field": shingle_k must be >= 1, got $k""")
        // explicit max_str_len wins over the computed stats pass, and an
        // explicit null means "compute it" — the reference's config shape
        // ({"max_str_len": None}, tests/test_data_utils_helpers.py:47)
        val msl = m.get("max_str_len") match {
          case Some(JInt(v)) => Some(v.toLong)
          case None | Some(JNull) => None
          case Some(other) => throw new IllegalArgumentException(
            s"""field "$field": max_str_len must be an int or null, got $other""")
        }
        FieldSpec(field, source, sigType, weight, k, maxStrLen = msl)
      case (field, JNull) => throw new IllegalArgumentException(
        s"""Please set the value of "$field" in the field config dict""")
      case (field, other) => throw new IllegalArgumentException(
        s"""field "$field": config must be an object, got $other""")
    }
    val dup = specs.groupBy(_.field).collectFirst { case (f, ss) if ss.size > 1 => f }
    dup.foreach(f => throw new IllegalArgumentException(s"""duplicate field "$f""""))
    specs
  }

  /**
   * The reference's pre-execution STATS PASS bound into the configs
   * (field_config_parser.py:75-118 driving utils.py:179-208): every
   * syntactic (STRING-like) field without an explicit max_str_len gets the
   * corpus maximum normalized length rounded up to even (utils.py:193-198);
   * every semantic (vocab-typed) field gets its vocabulary size
   * (compute_vocab_counter, utils.py:203-208). A `source` column missing
   * from the records raises with the reference's error shape
   * ("Cannot compute ... Please make sure that field=... is a key...").
   * All fields' stats are computed in ONE aggregation job.
   */
  def bindStats(records: DataFrame, specs: Seq[FieldSpec],
      idCol: String = "id"): Seq[FieldSpec] = {
    specs.foreach { sp =>
      if (!records.columns.contains(sp.source))
        throw new IllegalArgumentException(
          s"Cannot compute stats for field=${sp.source}. Please make sure " +
          s"""that field=${sp.field} is a key in every record of the input """ +
          "or define source in the field config")
    }
    def norm(sp: FieldSpec) =
      trim(regexp_replace(lower(col(sp.source)), "\\s+", " "))

    // job 1 — all unbound max lengths in one aggregation (STRING-like
    // fields only, mirroring field_config_parser.py:99 — semantic fields
    // never get a max_str_len)
    val lenUnbound = specs.filter(s => s.maxStrLen.isEmpty && s.sigType != "semantic")
    val lens: Map[String, Long] =
      if (lenUnbound.isEmpty) Map.empty
      else {
        val aggs = lenUnbound.map { sp =>
          val raw = coalesce(max(length(norm(sp))), lit(0)).cast("long")
          // even-rounding (utils.py:193-198)
          (raw + pmod(raw, lit(2L))).as(s"len_${sp.field}")
        }
        val row = records.agg(aggs.head, aggs.tail: _*).head()
        lenUnbound.zipWithIndex.map { case (sp, i) => sp.field -> row.getLong(i) }.toMap
      }

    // job 2 — all unbound vocab sizes from one tagged token union
    // (compute_vocab_counter is semantic-field-only in the reference)
    val vocabUnbound = specs.filter(s => s.vocabSize.isEmpty && s.sigType == "semantic")
    val vocabs: Map[String, Long] =
      if (vocabUnbound.isEmpty) Map.empty
      else vocabUnbound.map { sp =>
        records.select(lit(sp.field).as("f"), explode(split(norm(sp), " ")).as("t"))
          .filter(length(col("t")) > 0)
      }.reduce(_ unionByName _)
        .groupBy("f").agg(count_distinct(col("t")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    specs.map { sp =>
      sp.copy(
        maxStrLen = sp.maxStrLen.orElse(lens.get(sp.field)),
        vocabSize = sp.vocabSize.orElse(vocabs.get(sp.field)))
    }
  }

  /** Distinct token-set column for one field: char k-shingles (syntactic)
    * or whitespace word tokens (semantic) of the normalized text. Tokens
    * are emitted as 64-bit hashes (the engine-wide convention): set counts
    * equal the string-set counts modulo collisions, and every downstream
    * join/intersect moves 8 bytes per token instead of a string.
    *
    * Round 6: the projection runs in the allocation-free signature kernel
    * (TextSignatures scratch machinery) instead of a Catalyst
    * transform(sequence → substr → xxhash64) chain — the expression form
    * copied one k-char string per shingle position and measured ~115 µs/doc
    * at the bench shape (~0.57 s serialized on a single-split input) where
    * the kernel's rolling char hash is ~20x cheaper. Everything downstream
    * consumes only hash-set identities (join keys, intersection/union
    * SIZES), so swapping the hash family changes no result. */
  def gramCol(src: Column, spec: FieldSpec): Column = {
    val k = spec.shingleK
    val semantic = spec.sigType == "semantic"
    val kernel = udf { (s: String) =>
      if (s == null) Array.emptyLongArray
      else {
        val cs = graft.functions.TextSignatures.normalize(s)
        if (semantic) graft.functions.TextSignatures.tokenHashSet(cs)
        else graft.functions.TextSignatures.shingleSet(cs, k)
      }
    }
    kernel(src)
  }

  /**
   * records(idCol, <source columns>...) → (id1, id2, score) with
   * score = Σ_f w_f · jaccard_f / Σ_f w_f >= threshold, rounded to 6.
   * A missing/empty field contributes 0 to the numerator but its weight
   * stays in the denominator (reference empty-field zeroing).
   */
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /**
   * Per-field completeness threshold: a pair with weighted score >= t has
   * j_f >= (t·W − (W − w_f)) / w_f for EVERY field f (all other fields can
   * contribute at most their full weight), so when that bound is positive,
   * field f's prefix join at it is ALONE a complete candidate set.
   */
  def fieldThreshold(spec: FieldSpec, totalW: Double, t: Double): Double =
    (t * totalW - (totalW - spec.weight)) / spec.weight

  def dedupPairs(records: DataFrame, specs: Seq[FieldSpec], threshold: Double,
      idCol: String = "id"): DataFrame =
    ConfScope.smallInputScope(records.sparkSession, records) {
      val (plan, caches) = dedupPairsPlan(records, specs, threshold, idCol)
      // eager: release the per-field gram caches + candidate cache instead
      // of leaking them for the session (see SetSimJoin.jaccardSelfJoin)
      val out = plan.localCheckpoint()
      caches.foreach(_.unpersist())
      out
    }

  /**
   * Multi-field record LINKAGE — the reference's linkage mode over a field
   * config (entity_embed.py:536-582 driving ANNLinkageIndex,
   * indexes.py:85-140): two tagged sources in one table, the same per-field
   * gram/blocking/weighted-rescore machinery as [[dedupPairs]], but only
   * CROSS-source pairs, emitted ORIENTED as (left_id, right_id, score)
   * regardless of id magnitude (indexes.py:123-130).
   *
   * Scale shape: source-disjointness is evaluated INSIDE each field's
   * prefix-filter candidate join (SetSimJoin pairFilter hook — intra-source
   * collisions, ~half of all candidates on balanced sources, never reach
   * the pair exchange), exactly like the single-column Linkage operator
   * pushes it into the bucket join. Completeness is unchanged: the filter
   * removes only pairs the output excludes by definition.
   */
  def linkagePairs(records: DataFrame, specs: Seq[FieldSpec], threshold: Double,
      leftSource: String, idCol: String = "id",
      sourceCol: String = "source"): DataFrame =
    ConfScope.smallInputScope(records.sparkSession, records) {
    require(records.columns.contains(sourceCol),
      s"linkage needs source column '$sourceCol'")
    val crossSource: (String, String) => Column =
      (a, b) => col(s"$a.$sourceCol") =!= col(s"$b.$sourceCol")
    val (plan, caches) = dedupPairsPlan(records, specs, threshold, idCol,
      extra = Seq(sourceCol), pairFilter = Some(crossSource))
    val src = records.select(col(idCol).cast("long").as("id"),
      col(sourceCol).as("source"))
    val oriented = plan
      .join(src.select(col("id").as("id1"), col("source").as("src1")), "id1")
      .join(src.select(col("id").as("id2"), col("source").as("src2")), "id2")
      .filter(col("src1") =!= col("src2"))
      .filter(col("src1") === leftSource || col("src2") === leftSource)
      .select(
        when(col("src1") === leftSource, col("id1")).otherwise(col("id2")).as("left_id"),
        when(col("src1") === leftSource, col("id2")).otherwise(col("id1")).as("right_id"),
        col("score"))
    val out = oriented.localCheckpoint()
    caches.foreach(_.unpersist())
    out
    }

  /** The un-checkpointed join plan + the caches it holds — plan-shape tests
    * assert on THIS (the public method's localCheckpoint collapses
    * executedPlan to a checkpoint-RDD scan, which would make a no-cartesian
    * assertion vacuous); callers must unpersist the returned caches after
    * materializing. */
  private[graft] def dedupPairsPlan(records: DataFrame, specs: Seq[FieldSpec],
      threshold: Double, idCol: String = "id", extra: Seq[String] = Nil,
      pairFilter: Option[(String, String) => Column] = None)
      : (DataFrame, Seq[DataFrame]) = {
    require(specs.nonEmpty, "at least one field spec required")
    val totalW = specs.map(_.weight).sum

    // ONE prefix table per field (SetSimJoin.PrefixTable: hashed-set side +
    // df-sorted token lists, both persisted) — shared by the planner's cost
    // estimate, the chosen candidate join(s) AND the rescore below. Round-6
    // restructure: the estimate previously re-derived the tokenize →
    // token-df → per-id-sort chain from the raw gram tables, duplicating
    // the operator's most expensive shuffles; sharing the table removes a
    // full pass over every field. Lineage-cut after the persist: with N
    // fields x 3 consumers, Catalyst would otherwise re-analyze every
    // subtree per downstream Dataset (GraftSqlBridge scaladoc).
    val fieldTablesCached = specs.map { sp =>
      SetSimJoin.prefixTable(
        records.select(col(idCol).as("id") +: extra.map(col) :+
          gramCol(col(sp.source), sp).as("g"): _*), extra)
    }
    val cut = org.apache.spark.sql.GraftSqlBridge.truncateLineageLocal _
    val fieldTables = fieldTablesCached.map(pt =>
      SetSimJoin.PrefixTable(cut(pt.d), cut(pt.sorted)))
    // NOT worth it (measured): eagerly materializing the per-field caches
    // as concurrent count() jobs before the estimate — AQE already overlaps
    // the independent per-field stages inside the estimate job, and the
    // extra cache-scan pass made the interleaved A/B a wash-to-loss
    // (min 3.20 s with vs 2.98 s without at the bench shape).

    // ---- selectivity-aware blocking plan (both plans are provably
    // complete, so the choice only affects cost, never the result) ----
    //  union plan: every field joined at t (weighted avg >= t ⇒ max
    //    per-field jaccard >= t);
    //  single-field plan: field f alone at fieldThreshold(f) (see above).
    // An unselective field (templated boilerplate bodies at web scale) can
    // make its union branch emit orders of magnitude more candidates than
    // a selective field's single-field plan — the raw-candidate estimate
    // (one cheap pass over the shared prefix tables) picks the cheapest.
    def unionPlan(): DataFrame = fieldTables
      .map(pt => SetSimJoin.joinFromTable(pt, threshold, extra, pairFilter)
        .select("id1", "id2"))
      .reduce(_ union _)
      .distinct()

    val singles = specs.zip(fieldTables).flatMap { case (sp, pt) =>
      val tf = fieldThreshold(sp, totalW, threshold)
      if (tf > 0 && tf <= 1) Some((sp, pt, tf)) else None
    }
    val planned =
      if (singles.isEmpty || specs.size == 1) unionPlan()
      else {
        val est = SetSimJoin.estimateFromTables(
          specs.zip(fieldTables).map { case (sp, pt) =>
            val tfOpt = singles.collectFirst { case (s, _, tf) if s eq sp => tf }
            (sp.field, pt, threshold +: tfOpt.toSeq)
          })
        val unionCost = specs.map(sp => est((sp.field, threshold))).sum
        val (bsp, bpt, btf) = singles.minBy { case (sp, _, tf) => est((sp.field, tf)) }
        val bestCost = est((bsp.field, btf))
        if (bestCost < unionCost) {
          log.info(s"multifield plan: single-field '${bsp.field}' at " +
            f"$btf%.3f (est $bestCost raw candidates vs union $unionCost)")
          SetSimJoin.joinFromTable(bpt, btf, extra, pairFilter)
            .select("id1", "id2")
        } else {
          log.info(s"multifield plan: union of ${specs.size} field joins at " +
            f"$threshold%.3f (est $unionCost raw candidates; best single " +
            s"'${bsp.field}' was $bestCost)")
          unionPlan()
        }
      }
    val candsCached = planned
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = org.apache.spark.sql.GraftSqlBridge.truncateLineageLocal(candsCached)

    // weighted rescore: per-field contribution rows, summed per pair. The
    // per-field set arrays come from the SAME prefix tables (pt.d's `h` is
    // the sorted distinct hash array — intersection/union SIZES over it are
    // identical to the raw gram array's, so scores are unchanged).
    val contrib = specs.zip(fieldTables).map { case (sp, pt) =>
      cands
        .join(pt.d.select(col("id").as("id1"), col("h").as("g1")), Seq("id1"), "left")
        .join(pt.d.select(col("id").as("id2"), col("h").as("g2")), Seq("id2"), "left")
        .select(col("id1"), col("id2"),
          // try_divide: an empty-vs-empty field is 0/0 → null → 0 (the
          // reference's empty-field zeroing; ANSI mode would error on /0)
          (coalesce(
            try_divide(
              size(array_intersect(col("g1"), col("g2"))).cast("double"),
              size(array_union(col("g1"), col("g2")))),
            lit(0.0)) * sp.weight).as("wj"))
    }.reduce(_ unionByName _)

    val out = contrib.groupBy("id1", "id2")
      .agg(round(sum(col("wj")) / totalW, 6).as("score"))
      .filter(col("score") >= threshold)
    (out, fieldTablesCached.flatMap(_.caches) :+ candsCached)
  }

  /**
   * 100 TB mode — LSH-blocked multi-field candidates: each field computes
   * its own MinHash band keys (graft.functions.TextSignatures at the shared
   * config), bucket spaces made disjoint per field by mixing the field
   * index into the key, all memberships unioned into ONE skew-capped bucket
   * join (the reference's OR-blocking record pool, models.py:177-198).
   * Candidate coverage is probabilistic (the LSH S-curve per field); pairs
   * are then weighted-rescored exactly like dedupPairs. Use when the exact
   * prefix-filter join's candidate volume is too high — blocking cost here
   * is independent of the similarity threshold.
   */
  def lshCandidates(records: DataFrame, specs: Seq[FieldSpec],
      cfg: graft.config.GraftConfig, idCol: String = "id",
      extra: Seq[String] = Nil,
      pairFilter: Option[(String, String) => Column] = None)
      : CandidateGen.Result = {
    require(specs.nonEmpty, "at least one field spec required")
    val memberships = specs.zipWithIndex.map { case (sp, i) =>
      val sigs = Signatures.compute(
        records.select(col(idCol).as("id"), col(sp.source).as("text")), cfg,
        emitShingles = false)
      sigs.select(col("id"),
        // field-mixed bucket: field i's bucket space never collides with
        // field j's (same trick as band-index mixing inside the kernel)
        explode(transform(col("band_keys"),
          k => xxhash64(lit(i), k))).as("bucket"))
    }.reduce(_ unionByName _)
    // extras (e.g. a linkage source tag) join in by id so the caller's
    // pairFilter can run INSIDE the bucket join, before the pair exchange
    val withExtra =
      if (extra.isEmpty) memberships
      else memberships.join(
        records.select(col(idCol).cast("long").as("id") +: extra.map(col): _*), "id")
    val r = BucketJoin.pairs(withExtra, cfg.maxBandBucket, "multifield_lsh",
      pairFilter)
    CandidateGen.Result(
      r.pairs.withColumn("stage", lit("multifield_lsh")), r.oversizeLog)
  }

  /** Weighted rescore of an externally-supplied candidate set (the verify
    * half of dedupPairs, shared by the exact and LSH paths). */
  def rescore(cands: DataFrame, records: DataFrame, specs: Seq[FieldSpec],
      threshold: Double, idCol: String = "id"): DataFrame = {
    val totalW = specs.map(_.weight).sum
    val contrib = specs.map { sp =>
      val d = records.select(col(idCol).as("id"), gramCol(col(sp.source), sp).as("g"))
      cands.select("id1", "id2")
        .join(d.select(col("id").as("id1"), col("g").as("g1")), Seq("id1"), "left")
        .join(d.select(col("id").as("id2"), col("g").as("g2")), Seq("id2"), "left")
        .select(col("id1"), col("id2"),
          (coalesce(
            try_divide(
              size(array_intersect(col("g1"), col("g2"))).cast("double"),
              size(array_union(col("g1"), col("g2")))),
            lit(0.0)) * sp.weight).as("wj"))
    }.reduce(_ unionByName _)
    contrib.groupBy("id1", "id2")
      .agg(round(sum(col("wj")) / totalW, 6).as("score"))
      .filter(col("score") >= threshold)
  }
}
