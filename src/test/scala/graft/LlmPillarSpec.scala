package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness for the engine-hash-based operators the DuckDB oracle cannot
  * replay (xxhash64 / Scala-side decode): recall against exact baselines,
  * determinism, and structural invariants. Runs at sf0.01 (500 docs/vecs). */
class LlmPillarSpec extends AnyFunSuite with SparkFixture {
  private val dir = "/root/testdata/sf0.01"

  test("minhash LSH recalls every exact near-dup pair at jaccard >= 0.8") {
    val exact = Dedup.ngramJaccard(spark, dir)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDedup(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
    assert(exact.subsetOf(lsh),
      s"LSH missed pairs: ${exact -- lsh}")
  }

  test("minhash pairs are verified: every reported pair really has jaccard >= 0.8") {
    val bad = Dedup.minhashDedup(spark, dir).filter(col("jaccard") < 0.8).count()
    assert(bad == 0)
  }

  test("simhash chunk blocking is exact-recall at BOTH adaptive widths") {
    // brute-force spec: all-pairs hamming over the (hi, lo) signatures
    val sigs = Dedup.simhashSignatures(spark, dir)
    val a = sigs.select(col("doc_id").as("doc_a"),
      col("sim_hi").as("ha"), col("sim_lo").as("la"))
    val b = sigs.select(col("doc_id").as("doc_b"),
      col("sim_hi").as("hb"), col("sim_lo").as("lb"))
    def brute(bound: Int) = a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .filter((bit_count(col("ha").bitwiseXOR(col("hb"))) +
               bit_count(col("la").bitwiseXOR(col("lb")))) <= bound)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the pigeonhole recall bound is (64/w − 1) at each width the adaptive
    // rule can pick: 8-bit chunks ⇒ ≤7, 16-bit (the Manku config) ⇒ ≤3
    for ((w, bound) <- Seq(8 -> 7, 16 -> 3)) {
      val pairs = Dedup.simhashPairsAt(spark, dir, w)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = brute(bound)
      assert(expect.nonEmpty, s"fixture should contain hamming<=$bound pairs")
      assert(pairs == expect,
        s"w=$w missed: ${expect -- pairs}; spurious: ${pairs -- expect}")
    }
    // and the public query picks the width the corpus size dictates
    val n = Tables.documents(spark, dir).count()
    assert(Dedup.simhashChunkBits(n) == (if (n >= 4096) 16 else 8))
  }

  test("dup clusters are transitively closed with min-member labels") {
    val pairs = Dedup.minhashDedup(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cl = Dedup.dupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    // every detected pair ends up in one cluster (transitivity closes chains)
    pairs.foreach { case (a, b) =>
      assert(cl(a) == cl(b), s"pair ($a,$b) split across clusters")
    }
    // membership is exactly the docs that appear in some pair
    assert(cl.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // the label is the component's min member (the canonical keeper id)
    cl.groupBy(_._2).foreach { case (label, members) =>
      assert(label == members.keys.min)
    }
  }

  test("exact dedup collapses injected copies and nothing else") {
    val out = Dedup.exactDedup(spark, dir)
    val docs = Tables.documents(spark, dir).count()
    assert(out.count() == docs) // all texts distinct → one group per original
    val dupGroups = out.filter(col("n_copies") === 2).count()
    assert(dupGroups == docs / 10) // the injected tenth
    // keeper is always the original id, not the +1000000 copy
    assert(out.filter(col("keeper_id") >= 1000000L).count() == 0)
  }

  test("documents fixture is pure ASCII — the m6_edit_verify oracle pairing rests on it") {
    // Spark's levenshtein/substring count codepoints; DuckDB's byte/char
    // handling can diverge on multi-byte text. The cross-engine hash match
    // for m6_edit_verify is only guaranteed on ASCII, so pin the fixture
    // property here: a non-ASCII generator change fails THIS test with a
    // diagnosis instead of a bare hash mismatch in the driver gate.
    val nonAscii = Tables.documents(spark, dir)
      .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
    assert(nonAscii == 0,
      s"$nonAscii documents contain non-ASCII text; m6_edit_verify's " +
        "Spark-vs-DuckDB levenshtein pairing no longer holds — restrict its " +
        "prefix to an ASCII-safe transform before re-enabling")
  }

  test("ngram novelty: first doc scores 1.0 and novel counts tile the distinct-gram space") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.ngramNovelty(spark, dir)
      .select(col("doc_id"), col("n_grams"), col("n_novel"), col("novelty"))
      .cache()
    try {
      // no doc owns more firsts than it has grams
      assert(out.filter(col("n_novel") > col("n_grams")).count() == 0)
      // the lowest doc_id sees every one of its grams first
      val first = out.orderBy(col("doc_id")).limit(1).head()
      assert(first.getAs[Double]("novelty") == 1.0)
      // every distinct gram has exactly one first owner → novel counts sum
      // to the corpus' distinct-gram cardinality
      val novelTotal = out.agg(sum(col("n_novel"))).head().getLong(0)
      val distinctGrams = Tables.documents(spark, dir)
        .select(TextAnalysis.normTokens(col("text")).as("toks"))
        .select(explode(TextAnalysis.shingles(col("toks"), 8)).as("g"))
        .agg(countDistinct(col("g"))).head().getLong(0)
      assert(novelTotal == distinctGrams)
    } finally out.unpersist()
  }

  test("ANN probes only its sign bucket and agrees with brute force on shared pairs") {
    val ann = Similarity.annLsh(spark, dir)
      .select(col("q_id"), col("vec_id"), col("sim").as("ann_sim"))
    val exact = Similarity.cosineTopK(spark, dir)
      .select(col("q_id"), col("vec_id"), col("sim").as("bf_sim"))
    // where both report a pair, the similarity must be identical (same fold)
    val joined = ann.join(exact, Seq("q_id", "vec_id"))
    assert(joined.count() > 0)
    assert(joined.filter(col("ann_sim") =!= col("bf_sim")).count() == 0)
    // and brute force returns a full top-10 per probe
    val probes = Tables.embeddings(spark, dir).filter(col("vec_id") % 50 === 0).count()
    assert(exact.count() == probes * 10)
  }

  test("decontamination flags every planted benchmark leak with its full shingle set") {
    import graft.operators.TextAnalysis
    val out = Dedup.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val held = Tables.documents(spark, dir).filter(col("doc_id") % 97 === 0)
    val expected = held.select(col("doc_id"),
        size(array_distinct(TextAnalysis.shingles(TextAnalysis.normTokens(col("text")), 8))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(expected.nonEmpty)
    expected.foreach { case (id, n) =>
      assert(out.get(id + 2000000).contains(n.toLong),
        s"plant ${id + 2000000}: expected $n shared shingles, got ${out.get(id + 2000000)}")
    }
  }

  test("bloom-prefiltered decontamination answers the exact scan verbatim, even sketch-starved") {
    val exact = Dedup.decontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(exact.nonEmpty)
    // the properly-sized sketch: identical rows, pair for pair
    val bloom = Dedup.bloomDecontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(bloom.sameElements(exact))
    // FP-robustness: a 64-bit sketch over thousands of shingles saturates —
    // nearly every probe is a false positive — and the verify join still
    // recovers the exact answer. The Bloom side can only ever ADD candidate
    // rows (no false negatives by construction); this pins that the exact
    // join is what decides.
    val starved = Dedup.bloomDecontaminate(spark, dir, forceBits = Some(64L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(starved.sameElements(exact))
  }

  test("leak-scan normalization matches case-mangled and re-punctuated plants") {
    import graft.operators.{Exact, TextAnalysis}
    import TextAnalysis.{normTokens, shingles}
    import spark.implicits._
    // a verbatim leak, then trivially reformatted: case flips, punctuation,
    // an em dash that collapses to a double space when stripped
    val df = Seq((
      "the quick brown fox jumps over the lazy dog again and again today",
      "The QUICK brown fox, jumps over the lazy dog — again and again today!"
    )).toDF("orig", "mangled")
    val row = df.select(
      transform(array_distinct(shingles(normTokens(col("orig")), 8)),
        s => Exact.fold60(s)).as("a"),
      transform(array_distinct(shingles(normTokens(col("mangled")), 8)),
        s => Exact.fold60(s)).as("b"))
      .select(size(col("a")).as("na"),
        size(array_intersect(col("a"), col("b"))).as("shared"))
      .collect()(0)
    assert(row.getInt(0) > 0)
    assert(row.getInt(1) == row.getInt(0),
      "every canonical 8-shingle of the mangled copy must still collide")
  }

  test("incremental dedup rejects verbatim re-crawls and admits heavy edits") {
    val out = Dedup.incrementalDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val origs = Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(origs.nonEmpty)
    origs.foreach { id =>
      val r = out(id + 3000000)
      if (id % 20 == 0) {
        // identical text ⇒ identical signature ⇒ every band collides with
        // the original ⇒ rejected at jaccard exactly 1
        assert(!r.getAs[Boolean]("admitted"), s"verbatim re-crawl $id admitted")
        assert(r.getAs[Double]("best_jaccard") == 1.0)
      } else {
        // every other token dropped ⇒ no original 3-gram survives
        assert(r.getAs[Boolean]("admitted"), s"heavily edited $id rejected: $r")
      }
    }
  }

  test("repetition filter flags every planted boilerplate doc, via the dup-3gram rule") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.repetitionFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val planted = Tables.documents(spark, dir).filter(col("doc_id") % 53 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val r = out(id)
      assert(r.getAs[Boolean]("repetitive"), s"plant $id not flagged")
      assert(r.getAs[Double]("dup3_frac") >= 0.5, s"plant $id dup3=${r.get(2)}")
    }
    // natural prose stays well under the duplicate-3-gram threshold
    val naturalMaxDup3 = (out.keySet -- planted).map(out(_).getAs[Double]("dup3_frac")).max
    assert(naturalMaxDup3 < 0.25, s"natural dup3 max $naturalMaxDup3")
  }

  test("cluster keep-best selects exactly one max-quality keeper per cluster") {
    import graft.operators.{Dedup, TextAnalysis}
    val out = Dedup.clusterKeepBest(spark, dir).collect()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    val q = TextAnalysis.qualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality_score")).toMap
    byCluster.foreach { case (cid, rows) =>
      val keepers = rows.filter(_.getAs[Boolean]("kept"))
      assert(keepers.length == 1, s"cluster $cid keeps ${keepers.length}")
      val keeper = keepers.head.getAs[Long]("keeper_id")
      // the keeper dominates every member on (quality desc, doc_id asc)
      rows.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        assert(q(keeper) > q(id) || (q(keeper) == q(id) && keeper <= id),
          s"cluster $cid: member $id (q=${q(id)}) beats keeper $keeper (q=${q(keeper)})")
        assert(r.getAs[Double]("keeper_quality") == q(keeper))
      }
    }
    // clusters are non-trivial on the fixture: at least one has > 1 member
    assert(byCluster.exists(_._2.length > 1))
  }

  test("LM support separates shared-transition prose from singleton gibberish") {
    import graft.operators.TextAnalysis
    val tmp = java.nio.file.Files.createTempDirectory("graft-lmsup-").toString
    import spark.implicits._
    val fluent = Seq.fill(15)("data table scan").mkString(" ")
    Seq(
      (1L, fluent), (2L, fluent), (3L, fluent),
      (4L, (1 to 20).map(i => s"zq$i").mkString(" "))
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.lmSupport(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    // every bigram of doc 4 occurs exactly once corpus-wide -> support 1.0,
    // the degenerate tail an LM filter cuts; the shared prose scores the
    // corpus-wide transition counts
    assert(out(4L).getAs[Double]("support_score") == 1.0)
    assert(out(1L).getAs[Double]("support_score") > 10.0)
    assert(out(1L).getAs[Long]("n_bigrams") == 44L)

    // fixture-wide: scores are positive and bounded by total bigram volume
    val scores = TextAnalysis.lmSupport(spark, dir).collect()
    assert(scores.nonEmpty)
    assert(scores.forall(_.getAs[Double]("support_score") >= 1.0))
  }

  test("passage scrub removes exactly the cross-doc flood passages, in place") {
    import graft.operators.TextAnalysis
    // planted corpus: passage windows are fixed 10-token spans, so the
    // boilerplate block is 10-aligned by construction (one unique leading
    // passage per doc). Three docs share the block (>= 3 distinct docs =
    // flood), one doc is clean, tails are sub-passage and never candidates.
    val boiler = "nav nav nav home about contact legal privacy terms cookie"
    def uniq(i: Int) = (1 to 10).map(k => s"u${i}t$k").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-passage-").toString
    import spark.implicits._
    Seq(
      (1L, uniq(1) + " " + boiler + " tail one"),
      (2L, uniq(2) + " " + boiler + " tail two"),
      (3L, uniq(3) + " " + boiler),
      (4L, uniq(4) + " solo passage")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.passageScrub(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1).getAs[Long]("n_removed") == 1L)
    assert(out(1).getAs[String]("clean_text") == uniq(1) + " tail one")
    assert(out(2).getAs[String]("clean_text") == uniq(2) + " tail two")
    assert(out(3).getAs[String]("clean_text") == uniq(3))
    assert(out(4).getAs[Long]("n_removed") == 0L)
    assert(out(4).getAs[String]("clean_text") == uniq(4) + " solo passage")

    // fixture-wide accounting invariants: passages tile the token stream,
    // and the clean text is exactly the stream minus 10 tokens per removal
    val acc = TextAnalysis.passageScrub(spark, dir)
      .withColumn("clean_n", when(col("clean_text") === "", lit(0))
        .otherwise(size(split(col("clean_text"), " "))).cast("long"))
      .join(Tables.documents(spark, dir).select(col("doc_id"),
        size(TextAnalysis.normTokens(col("text"))).cast("long").as("n")),
        Seq("doc_id"))
    assert(acc.filter(col("n_passages") =!= expr("n div 10")).count() == 0)
    assert(acc.filter(col("clean_n") =!= col("n") - col("n_removed") * 10).count() == 0)
    assert(acc.filter(col("n_removed") > 0).count() > 0,
      "fixture contains no flood passages — the scrub leg is untested")
  }

  test("PII scrub leaves zero residual matches and counts exactly the plants") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.piiScrub(spark, dir)
    // nothing email- or phone-shaped survives the scrub, corpus-wide
    assert(out.filter(
      regexp_count(col("scrubbed"), lit("[a-z0-9]+@[a-z0-9]+\\.[a-z]+")) > 0 ||
      regexp_count(col("scrubbed"), lit("[0-9]{3}-[0-9]{4}")) > 0).count() == 0)
    // the plants (and only the plants) carried PII, and kept their tokens
    val planted = out.filter(col("doc_id") % 41 === 0)
    assert(planted.count() > 0)
    assert(planted.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0)
    assert(out.filter(col("doc_id") % 41 =!= 0)
      .filter(col("n_emails") > 0 || col("n_phones") > 0).count() == 0)
    assert(planted.filter(!col("scrubbed").contains("<EMAIL>") ||
      !col("scrubbed").contains("<PHONE>")).count() == 0)
  }

  test("BM25 top-k matches a brute-force reference scorer on every query") {
    // independent implementation: collect the fixture corpus and score the
    // registered query workload with plain-Scala BM25 (same k1 = 1.2,
    // b = 0.75, raw-ratio idf), then compare the full ranked output —
    // ranks exactly, scores to 1e-6
    val norm = (s: String) => s.toLowerCase.replaceAll("[^a-z0-9 ]", "")
      .split(" ").filter(_.nonEmpty).toSeq
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> norm(r.getString(1))).filter(_._2.nonEmpty).toMap
    val tfm = docs.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (t, xs) => t -> xs.size } }
    val dfm = tfm.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val nd = docs.size
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / nd
    def score(qterms: Seq[String], id: Long): Option[(Double, Int)] = {
      val hit = qterms.filter(tfm(id).contains)
      if (hit.isEmpty) None
      else Some((hit.sorted.map { t =>
        val tf = tfm(id)(t).toDouble
        (nd.toDouble / dfm(t)) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * (docs(id).size / avgdl)))
      }.sum, hit.size))
    }
    val expected = graft.operators.TextAnalysis.Bm25Queries.flatMap {
      case (q, text) =>
        val qts = text.split(" ").toSeq
        docs.keys.toSeq.flatMap(id => score(qts, id).map(s => (q, id, s)))
          .sortBy { case (_, id, (s, _)) => (-s, id) }.take(10).zipWithIndex
          .map { case ((_, id, (s, n)), i) => (q, i + 1) -> (id, s, n) }
    }.toMap
    val got = SparkEntry.queries("m6_bm25_topk")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(2)) ->
        (r.getLong(1), r.getDouble(4), r.getLong(3)))
      .toMap
    spark.catalog.clearCache()
    assert(got.size == expected.size, s"row count ${got.size} != ${expected.size}")
    expected.foreach { case (key @ (q, rnk), (id, s, n)) =>
      val (gid, gs, gn) = got(key)
      assert(gid == id, s"$q rank $rnk: doc $gid, reference says $id")
      assert(gn == n, s"$q rank $rnk: matched $gn terms, reference says $n")
      // the query emits Exact.rnd(score, 4) — apply the same half-up round
      val s4 = math.floor(s * 1e4 + 0.5) / 1e4
      assert(math.abs(gs - s4) < 1e-9, s"$q rank $rnk: score $gs vs reference $s4")
    }
  }

  test("phrase search equals a brute-force token scan of every document") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.normTokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val expected = TextAnalysis.PhraseQueries.flatMap { case (q, text) =>
      val p = text.split(" ").toSeq
      docs.toSeq.flatMap { case (id, toks) =>
        val anchors = (1 to toks.length - p.length + 1)
          .filter(i => toks.slice(i - 1, i - 1 + p.length) == p)
        if (anchors.isEmpty) None
        else Some((q, id) -> (anchors.size.toLong, anchors.min.toLong))
      }
    }.toMap
    // fixture safety: every fixed phrase must actually occur at this sf —
    // an all-empty query would pass trivially
    TextAnalysis.PhraseQueries.foreach { case (q, text) =>
      assert(expected.keys.exists(_._1 == q), s"phrase '$text' absent from fixture")
    }
    val got = SparkEntry.queries("m6_phrase_search")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    spark.catalog.clearCache()
    assert(got == expected, s"phrase results differ: got $got expected $expected")
  }

  test("rrf fusion equals an independent fusion of its two leg rankings") {
    // dense leg replayed brute-force in plain Scala for the three fixed
    // probes (vec_id = 0, s, 2s; s = max(50, N/40) — the probe-stride rule)
    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val stride = math.max(50L, vecs.size / 40L)
    def dotp(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]): Double = math.sqrt(dotp(a, a))
    val denseRnk: Map[(String, Long), Int] = (0 until 3).flatMap { i =>
      val qid = i * stride
      val qv = vecs(qid)
      vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, dotp(qv, v) / (nrm(v) * nrm(qv))) }
        .sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, _), r) => (s"q${i + 1}", id) -> (r + 1) }
    }.toMap
    // lexical leg: the registered BM25 ranking (itself pinned against a
    // plain-Scala replay by the bm25 test above)
    val lexRnk = SparkEntry.queries("m6_bm25_topk")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expected = (denseRnk.keySet ++ lexRnk.keySet).groupBy(_._1)
      .flatMap { case (q, ks) =>
        ks.toSeq.map { k =>
          (k._2,
            lexRnk.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
              denseRnk.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0))
        }.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
          .map { case ((id, s), i) =>
            (q, i + 1) -> (id, math.floor(s * 1e6 + 0.5) / 1e6,
              lexRnk.get((q, id)), denseRnk.get((q, id)))
          }
      }
    val got = SparkEntry.queries("m6_rrf_fusion")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(2)) ->
        (r.getLong(1), r.getDouble(5),
          if (r.isNullAt(3)) None else Some(r.getInt(3)),
          if (r.isNullAt(4)) None else Some(r.getInt(4))))
      .toMap
    spark.catalog.clearCache()
    assert(got.size == expected.size, s"row count ${got.size} != ${expected.size}")
    expected.foreach { case (key, (id, s, lr, dr)) =>
      val (gid, gs, glr, gdr) = got(key)
      assert(gid == id, s"$key: doc $gid, reference says $id")
      assert(glr == lr && gdr == dr, s"$key: leg ranks ($glr, $gdr) vs ($lr, $dr)")
      assert(math.abs(gs - s) < 1e-9, s"$key: rrf $gs vs reference $s")
    }
    // non-vacuous hybrid: every query's fused list draws from BOTH legs
    got.groupBy(_._1._1).foreach { case (q, rows) =>
      assert(rows.values.exists(_._3.isDefined), s"$q: no lexical contribution")
      assert(rows.values.exists(_._4.isDefined), s"$q: no dense contribution")
    }
  }

  test("ann-fused rrf: probe restriction commutes and fused ranks track the exact-dense fusion") {
    // the dense leg's ranks must be EXACTLY the full IVF-PQ+rerank search's
    // ranks for the three fusion probes — the probe-restriction-commutes
    // claim rrfFusionAnn's doc makes, checked against the independently
    // oracle-verified full search
    val stride = math.max(50L,
      Tables.embeddings(spark, dir).count() / 40L)
    val full = SparkEntry.queries("m6_ann_ivfpq_rerank")(spark, dir).collect()
      .filter(_.getLong(0) < 3 * stride)
      .map(r => (s"q${r.getLong(0) / stride + 1}", r.getLong(1)) -> r.getInt(2))
      .toMap
    val fused = SparkEntry.queries("m6_rrf_fusion_ann")(spark, dir).collect()
    val denseRnks = fused.filter(!_.isNullAt(4))
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(4)).toMap
    assert(denseRnks.nonEmpty, "no dense contribution anywhere")
    denseRnks.foreach { case (k, r) =>
      assert(full.get(k).contains(r),
        s"$k: fused dense rank $r vs full search ${full.get(k)}")
    }
    // the lexical leg is the SAME bm25 ranking the exact-dense fusion uses
    val exact = SparkEntry.queries("m6_rrf_fusion")(spark, dir).collect()
    spark.catalog.clearCache()
    val lexOf = (rows: Array[org.apache.spark.sql.Row]) =>
      rows.filter(!_.isNullAt(3))
        .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
    val (lexAnn, lexExact) = (lexOf(fused), lexOf(exact))
    lexAnn.keySet.intersect(lexExact.keySet).foreach { k =>
      assert(lexAnn(k) == lexExact(k),
        s"$k: lexical rank ${lexAnn(k)} differs from exact fusion ${lexExact(k)}")
    }
    // rank agreement with the exact-dense fusion: the ANN stack is an
    // approximation, but on this corpus the fused top-10s agree >= 7/10 per
    // query (measured 10/8/8 at sf0.01) and both legs contribute to each
    val byQ = (rows: Array[org.apache.spark.sql.Row]) =>
      rows.groupBy(_.getString(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
    val (annQ, exQ) = (byQ(fused), byQ(exact))
    assert(annQ.keySet == exQ.keySet && annQ.keySet == Set("q1", "q2", "q3"))
    annQ.foreach { case (q, ids) =>
      val overlap = ids.intersect(exQ(q)).size
      assert(overlap >= 7, s"$q: fused top-10 overlap $overlap < 7 vs exact-dense")
    }
    fused.groupBy(_.getString(0)).foreach { case (q, rows) =>
      assert(rows.exists(!_.isNullAt(3)), s"$q: no lexical contribution")
      assert(rows.exists(!_.isNullAt(4)), s"$q: no dense contribution")
    }
  }

  test("source divergence equals an exact BigInt total-variation replay") {
    val norm = (s: String) => s.toLowerCase.replaceAll("[^a-z0-9 ]", "")
      .split(" ").filter(_.nonEmpty).toSeq
    val counts: Map[String, Map[String, Long]] =
      Tables.documents(spark, dir).select("source", "text").collect()
        .flatMap(r => norm(r.getString(1)).map(t => (r.getString(0), t)))
        .groupBy(_._1)
        .map { case (src, xs) =>
          src -> xs.groupBy(_._2).map { case (t, ys) => t -> ys.size.toLong } }
    val expected = counts.keys.toSeq.sorted.combinations(2).map {
      case Seq(sa, sb) =>
        val (ca, cb) = (counts(sa), counts(sb))
        // every pair is emitted (r15): a pair sharing zero vocabulary
        // reports tv = 1.0, jaccard = 0.0 — defect = 0 makes both fall
        // out of the shared formulas, no special case needed
        val shared = ca.keySet.intersect(cb.keySet)
        val (na, nb) = (BigInt(ca.values.sum), BigInt(cb.values.sum))
        // the engine accumulates in decimal(38,0) — the BigInt replay is
        // exact at any scale by construction
        val defect = shared.toSeq.map { t =>
          val (x, y) = (BigInt(ca(t)) * nb, BigInt(cb(t)) * na)
          x + y - (x - y).abs
        }.sum
        val tv = (BigDecimal(2 * na * nb - defect) /
          BigDecimal(2 * na * nb)).toDouble
        val jac = shared.size.toDouble / (ca.size + cb.size - shared.size)
        (sa, sb) -> (shared.size.toLong,
          math.floor(tv * 1e6 + 0.5) / 1e6, math.floor(jac * 1e6 + 0.5) / 1e6)
    }.toMap
    val got = SparkEntry.queries("m6_source_divergence")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    spark.catalog.clearCache()
    assert(got.size == expected.size, s"pair count ${got.size} != ${expected.size}")
    expected.foreach { case (key, (sh, tv, jac)) =>
      val (gsh, gtv, gjac) = got(key)
      assert(gsh == sh, s"$key: shared $gsh vs $sh")
      assert(math.abs(gtv - tv) < 1e-9, s"$key: tv $gtv vs $tv")
      assert(math.abs(gjac - jac) < 1e-9, s"$key: jaccard $gjac vs $jac")
      assert(gtv >= 0.0 && gtv <= 1.0 && gjac >= 0.0 && gjac <= 1.0, s"$key out of bounds")
    }
  }

  test("dsir weights equal an independent importance-resampling replay") {
    def fold60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), TextAnalysis.normTokens(col("text")).as("toks"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    val feats = docs.map { case (id, lang, toks) =>
      val f = toks ++ toks.iterator.sliding(2).withPartial(false).map(_.mkString(" "))
      (id, lang, f.map(x => fold60(x + "|ds") % 4096))
    }
    val all = feats.flatMap(_._3)
    val tgt = feats.filter(_._2 == "en").flatMap(_._3)
    val r = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = tgt.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = all.size.toLong
    val tt = tgt.size.toLong
    def ratio(b: Long): Double =
      ((t.getOrElse(b, 0L) + 1L).toDouble / (tt + 4096L).toDouble) /
        ((r(b) + 1L).toDouble / (rt + 4096L).toDouble)
    val expected = feats.map { case (id, _, bs) =>
      val s = bs.sorted.map(ratio).sum // bucket-sorted fold = the engine's pinned order
      id -> (bs.size.toLong, math.floor(s / bs.size * 1e4 + 0.5) / 1e4,
        s >= bs.size.toDouble)
    }.toMap
    val got = SparkEntry.queries("m6_dsir_weights")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    spark.catalog.clearCache()
    assert(got.size == expected.size, s"row count ${got.size} != ${expected.size}")
    expected.foreach { case (id, (n, w, k)) =>
      val (gn, gw, gk) = got(id)
      assert(gn == n, s"doc $id: $gn features, reference says $n")
      assert(math.abs(gw - w) < 1e-9, s"doc $id: weight $gw vs reference $w")
      assert(gk == k, s"doc $id: keep $gk vs reference $k")
    }
    // the semantics, not just the arithmetic: target-slice documents must
    // score systematically higher than off-target ones (their features
    // define the target distribution)
    val byLang = docs.map(d => d._1 -> d._2).toMap
    def mean(ids: Iterable[Long]) =
      ids.map(expected(_)._2).sum / ids.size
    val en = expected.keys.filter(byLang(_) == "en")
    val other = expected.keys.filterNot(byLang(_) == "en")
    assert(mean(en) > mean(other),
      s"en mean ${mean(en)} should exceed non-en mean ${mean(other)}")
  }

  test("lshBits sizes the bucket width log2 with the corpus, clamped to [4,16]") {
    assert(Similarity.lshBits(1) == 4)
    assert(Similarity.lshBits(50) == 4)     // sf0.001
    assert(Similarity.lshBits(500) == 5)    // sf0.01 — a different effective width
    assert(Similarity.lshBits(5000) == 9)   // sf0.1
    assert(Similarity.lshBits(1L << 40) == 16)
    // boundary: exactly 16·2^b stays at b, one more row tips over
    assert(Similarity.lshBits(512) == 5 && Similarity.lshBits(513) == 6)
  }

  test("sign-LSH bucket load is bounded and widening bits only refines it") {
    val vecs = Tables.embeddings(spark, dir).select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val total = vecs.count().toDouble
    def maxShare(bits: Int): Double =
      vecs.withColumn("b", Similarity.signBucket(col("v"), bits))
        .groupBy("b").count().agg(max("count")).collect()(0).getLong(0) / total
    // no 8-bit bucket may hold a quadratic-blowup share of the corpus
    assert(maxShare(8) < 0.05, s"hottest 8-bit bucket holds ${maxShare(8)}")
    // more bits strictly refine buckets, so the hottest bucket only shrinks —
    // the knob that keeps within-bucket work bounded as the corpus grows
    assert(maxShare(12) <= maxShare(8))
  }

  test("embed dedup surfaces every planted near-identical pair through its bucket") {
    val out = Similarity.embedDedup(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val planted = emb.filter(col("vec_id") % 20 === 0).count()
    // the plant offset is corpus-derived (max id + 1), never a constant
    // that real ids could collide with at scale
    val off = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    assert(planted > 0)
    assert(out.filter(col("vec_b") === col("vec_a") + off).count() == planted)
  }

  test("HLL vocabulary estimate stays within 5% of exact per language") {
    val rows = graft.operators.TextAnalysis.vocabHllFull(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("vocab_approx").toDouble
      val exact = r.getAs[Long]("vocab_exact").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"lang=${r.getAs[String]("lang")}: approx=$approx exact=$exact")
    }
  }

  test("harness cache clearing drains every persisted block") {
    spark.catalog.clearCache()
    Dedup.minhashDedup(spark, dir).write.format("noop").mode("overwrite").save()
    // the query persisted its shared base while running…
    spark.catalog.clearCache()
    // …and the harness's per-query clear leaves nothing resident. The
    // contract for checkpointed intermediates (connectedComponents' round
    // frames) is DRAINABLE, not instantly absent: the ContextCleaner
    // reclaims them once unreferenced, which needs a GC cycle — exactly
    // the System.gc() Bench runs between entries. Asserting immediate
    // emptiness raced that cleaner (a real flake caught in r15); nudge it
    // boundedly instead.
    val deadline = System.nanoTime() + 15_000_000_000L
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
        System.nanoTime() < deadline) {
      System.gc(); Thread.sleep(200)
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("PPM decode is deterministic, batch-shaped, and rejects exactly the malformed plants") {
    val a = Multimodal.decodeFeatures(spark, dir).orderBy("doc_id").collect()
    val b = Multimodal.decodeFeatures(spark, dir).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, dir).count())
    a.foreach { r =>
      val ok = r.getAs[Boolean]("ok")
      assert(ok == (r.getLong(0) % 61 != 0),
        s"doc ${r.getLong(0)}: rejection must hit exactly the wrong-magic plants")
      if (ok) {
        assert(r.getAs[Int]("width") == 16)
        assert(r.getAs[Int]("n_pixels") == 16 * r.getAs[Int]("height"))
        Seq("mean_r", "mean_g", "mean_b").foreach { c =>
          val m = r.getAs[Double](c)
          assert(m >= 0.0 && m < 256.0, s"$c=$m out of byte range")
        }
      }
    }
  }

  test("PPM decoder handles every malformed-bytes path without throwing") {
    import Multimodal.{MediaIn, PpmDecoder}
    def d(bytes: Array[Byte]) = PpmDecoder.decode(MediaIn(1L, bytes))
    val px12 = Array.tabulate(12)(i => (i * 10).toByte) // 2×2 RGB
    assert(!d("P5\n2 2\n255\n".getBytes ++ px12).ok, "wrong magic accepted")
    assert(!d("P6\n2 2\n255\n".getBytes ++ px12.take(11)).ok, "truncated pixels accepted")
    assert(!d("P6\n2 2\n254\n".getBytes ++ px12).ok, "non-255 maxval accepted")
    assert(!d("P6\nx 2\n255\n".getBytes ++ px12).ok, "junk width token accepted")
    assert(!d("P6\n-2 2\n255\n".getBytes ++ px12).ok, "negative dimension accepted")
    assert(!d("P6".getBytes).ok, "header-only payload accepted")
    assert(!d(Array.emptyByteArray).ok, "empty payload accepted")
    val good = d("P6\n2 2\n255\n".getBytes ++ px12)
    assert(good.ok && good.width == 2 && good.height == 2 && good.n_pixels == 4)
    assert(good.mean_r == (0 + 30 + 60 + 90) / 4.0)
    assert(good.mean_g == (10 + 40 + 70 + 100) / 4.0)
    assert(good.mean_b == (20 + 50 + 80 + 110) / 4.0)
  }

  test("PCM decoder sign-extends, frames exactly, and drops the partial tail") {
    import Multimodal.{MediaIn, PcmDecoder}
    // 512 bytes of 0xFF = 256 samples of −1 → one frame, energy 1.0
    val neg = PcmDecoder.decode(MediaIn(1L, Array.fill(512)(0xFF.toByte))).toSeq
    assert(neg.map(f => (f.frame_no, f.energy)) == Seq((0, 1.0)))
    // sample 0x8000 = −32768 (the most negative 16-bit value)
    val minSample = PcmDecoder.decode(MediaIn(2L,
      Array.fill(256)(Array(0x00.toByte, 0x80.toByte)).flatten)).toSeq
    assert(minSample.head.energy == 32768.0 * 32768.0)
    // little-endian order: (lo=1, hi=0) is +1, not 256
    val le = PcmDecoder.decode(MediaIn(3L,
      Array.fill(256)(Array(0x01.toByte, 0x00.toByte)).flatten)).toSeq
    assert(le.head.energy == 1.0)
    // sub-frame payload (511 bytes) and the partial tail both emit nothing
    assert(PcmDecoder.decode(MediaIn(4L, Array.fill(511)(0x7F.toByte))).isEmpty)
    assert(PcmDecoder.decode(MediaIn(5L, Array.fill(700)(0x10.toByte))).size == 1)
  }

  test("text-analysis operators leave no persisted residue behind") {
    import graft.operators.TextAnalysis
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Seq[(org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      TextAnalysis.cmsHeavyHitters, TextAnalysis.tfidfTerms,
      TextAnalysis.repetitionFilter)
      .foreach(f => f(spark, dir).write.format("noop").mode("overwrite").save())
    val mid = spark.sparkContext.getPersistentRDDs.keySet
    assert((mid -- before).isEmpty,
      s"cms/tfidf/repetition leaked persisted RDDs: ${mid -- before}")
    // postings scopes its internal persist: at most its eagerly-checkpointed
    // RESULT may remain resident (freed on GC), never the corpus-sized input
    TextAnalysis.postings(spark, dir).write.format("noop").mode("overwrite").save()
    val newIds = spark.sparkContext.getPersistentRDDs.keySet -- mid
    assert(newIds.size <= 1, s"postings leaked beyond its result checkpoint: $newIds")
  }

  test("int8 quantization honors its error bound and sq8 search recalls exact top-10") {
    // the quantizer's defining guarantee, row by row
    val out = Similarity.embedQuantize(spark, dir)
    assert(out.filter(!col("in_bound")).count() == 0)
    // compressed-index search vs the exact baseline: mean top-10 recall
    def top(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = top(Similarity.cosineTopK(spark, dir).select("q_id", "vec_id"))
    val sq8 = top(Similarity.annSq8(spark, dir).select("q_id", "vec_id"))
    assert(exact.keySet == sq8.keySet)
    val recall = exact.map { case (q, ids) =>
      sq8(q).intersect(ids).size.toDouble / ids.size }.sum / exact.size
    assert(recall >= 0.8, f"mean sq8 top-10 recall $recall%.3f below 0.8")
  }

  test("PQ-ADC recall clears its floor on every query against exact top-10") {
    import graft.operators.Similarity
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val exact = topk(Similarity.cosineTopK(spark, dir))
    val pq = topk(Similarity.annPq(spark, dir))
    val recalls = exact.map { case (q, ex) =>
      q -> ex.intersect(pq.getOrElse(q, Set.empty)).size.toDouble / ex.size }
    assert(recalls.nonEmpty)
    // measured 0.4..0.8 per query, mean 0.65 on the fixture (32 subspaces
    // x 16 codes, one Lloyd refinement — up from 0.56 with the raw
    // id-spread seed codebook); floors leave margin for fixture
    // regeneration, and the per-query floor guards against a config that
    // trades one query's recall away for the mean
    recalls.foreach { case (q, r) => assert(r >= 0.3, s"query $q recall $r") }
    val mean = recalls.values.sum / recalls.size
    assert(mean >= 0.55, s"mean PQ recall $mean under floor")
  }

  test("IVF-PQ recall clears its floor and is bounded by IVF-Flat nprobe=2") {
    def top(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = top(Similarity.cosineTopK(spark, dir).select("q_id", "vec_id"))
    val ivfpq = top(Similarity.annIvfPq(spark, dir).select("q_id", "vec_id"))
    val ivf2 = top(Similarity.annIvf2(spark, dir).select("q_id", "vec_id"))
    def recall(ann: Map[Long, Set[Long]])(q: Long) =
      ann.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / exact(q).size
    val qs = exact.keys.toSeq
    // structural bound: IVF-PQ probes the SAME nprobe=2 cells as IVF-Flat
    // but ranks candidates by the compressed reconstruction — within a
    // fixed candidate set, exact scoring maximizes recall-vs-exact, so
    // per-query IVF-PQ recall can never exceed IVF-Flat's
    val above = qs.filter(q => recall(ivfpq)(q) > recall(ivf2)(q))
    assert(above.isEmpty, s"ivfpq recall exceeded its ivf2 bound on: $above")
    // measured on the fixture: per-query 0.3..0.7, mean 0.49 (16-byte
    // residual codes over 8 cells); floors leave fixture-drift margin
    val recalls = qs.map(q => q -> recall(ivfpq)(q))
    recalls.foreach { case (q, r) => assert(r >= 0.2, s"query $q recall $r") }
    val mean = recalls.map(_._2).sum / recalls.size
    assert(mean >= 0.4, f"mean IVF-PQ recall $mean%.3f under floor")
  }

  test("incremental IVF admission: corpus rows are a rank-prefix-preserving subset of ivf2") {
    // admitting a batch appends vectors to cells; it must not perturb the
    // corpus side — per query, the from_batch=false rows of the admitted
    // search, in rank order, must be exactly the ivf2 ranking with batch
    // rows interleaved (same relative order, same sims), and ranks 1..10
    // must be dense
    val inc = Similarity.incrementalIvf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getBoolean(4)))
    val ivf2 = Similarity.annIvf2(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1).map { case (q, xs) =>
        q -> xs.sortBy(_._3).map(x => (x._2, x._4)) }
    val byQ = inc.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to sorted.length),
        s"query $q: ranks not dense")
      assert(sorted.length == 10, s"query $q: expected 10 rows")
      val corpusRows = sorted.filter(!_._5).map(x => (x._2, x._4))
      assert(corpusRows.toSeq == ivf2(q).take(corpusRows.length).toSeq,
        s"query $q: corpus rows diverge from the ivf2 ranking prefix")
    }
    // the batch is discoverable: across the workload at least one admitted
    // vector must out-rank a corpus neighbor (the fixture batch is 10% of
    // the corpus — a search that never surfaces it isn't reading the
    // admission)
    assert(inc.exists(_._5), "no from_batch row anywhere in the workload")
  }

  test("audit sample: exactly 5 per stratum, deterministic, band-consistent") {
    import graft.operators.TextAnalysis
    val a = TextAnalysis.auditSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    val b = TextAnalysis.auditSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(a.sortBy(x => (x._1, x._2, x._3)).sameElements(
      b.sortBy(x => (x._1, x._2, x._3))), "sample is not deterministic")
    val strata = a.groupBy(x => (x._1, x._2))
    assert(strata.values.forall(_.length <= 5))
    strata.foreach { case (st, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"stratum $st: audit ranks not dense")
    }
    // the fixture must exercise BOTH bands (the r15 first cut banded at
    // 0.55 and every doc scored above it — a degenerate one-band sample)
    assert(a.map(_._2).distinct.sorted.toSeq == Seq("high", "low"))
    // band agrees with the released score for every sampled doc
    val scores = TextAnalysis.qualityScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality_score")).toMap
    a.foreach { case (_, band, _, id, s) =>
      assert(s == scores(id))
      assert((band == "high") == (s >= 0.63), s"doc $id band/score mismatch")
    }
    // a doc appears at most once across the whole sample
    assert(a.map(_._4).distinct.length == a.length)
  }

  test("letterbox detect replays the trailing pad-row rule from raw text") {
    val out = Multimodal.letterboxDetect(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .filter(r => r.getString(1).getBytes("UTF-8").length == r.getString(1).length)
    assert(docs.nonEmpty && out.size == docs.length)
    docs.foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val h = math.max(4, text.length / 48)
      val px = text.padTo(h * 48, 'x').take(h * 48)
      def rowPad(row: Int): Boolean = (0 until 16).forall { k =>
        px(row * 48 + 3 * k) + px(row * 48 + 3 * k + 1) + px(row * 48 + 3 * k + 2) == 360
      }
      var rr = h - 1
      while (rr >= 0 && rowPad(rr)) rr -= 1
      val expect = h - 1 - rr
      val got = out(id)
      assert(got.getAs[Int]("height") == h, s"doc $id height")
      assert(got.getAs[Int]("pad_rows") == expect, s"doc $id pad_rows")
      assert(got.getAs[Boolean]("letterboxed") == (expect * 4 >= h))
    }
    // the fixture produces a non-degenerate census: both flag values occur
    assert(out.values.exists(_.getAs[Boolean]("letterboxed")))
    assert(out.values.exists(!_.getAs[Boolean]("letterboxed")))
  }

  test("ann forget: tombstoned vectors vanish and the tail promotes in order") {
    val inc = Similarity.incrementalIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val fg = Similarity.annForget(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(fg.nonEmpty)
    // no tombstoned vector is ever served
    assert(fg.forall(_._2 % 13 != 0), "a forgotten vector was served")
    // retained pair sims are untouched and the ranking is the un-forgotten
    // list with tombstoned rows deleted and the tail promoted: per query,
    // incremental's surviving top-10 rows must be a PREFIX of the forget
    // ranking, in order, with identical sims
    val fgByQ = fg.groupBy(_._1)
    inc.groupBy(_._1).foreach { case (q, rows) =>
      val surviving = rows.sortBy(_._3).filter(_._2 % 13 != 0)
        .map(x => (x._2, x._4)).toSeq
      val served = fgByQ(q).sortBy(_._3).map(x => (x._2, x._4)).toSeq
      assert(served.take(surviving.length) == surviving,
        s"query $q: surviving incremental ranking is not a prefix of forget's")
      // a full top-10 when enough candidates survive; the prefix property
      // above is the real pin (r15 ADVICE: a fixture with < 10 retained
      // candidates in a probed cell must not fail the lifecycle test)
      assert(served.length >= math.min(10, surviving.length),
        s"query $q: served fewer rows than the surviving candidates")
      assert(served.length <= 10, s"query $q: served more than a top-10")
    }
    // the fixture visibly retracts: some query must have lost a ranked row
    assert(inc.exists(_._2 % 13 == 0), "fixture exercised no visible retraction")
  }

  test("ann purge physically erases tombstoned vectors and serves forget's answers") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4))).sortBy(x => (x._1, x._3))
    // the purge changes bytes, not answers
    assert(rows(Similarity.annPurge(spark, dir))
      .sameElements(rows(Similarity.annForget(spark, dir))))
    // and the bytes really change: replay the purge on a catalog we hold,
    // then read the PHYSICAL table — zero tombstoned vectors anywhere, with
    // retained rows conserved against the pre-purge snapshot
    val cells = Similarity.admittedIvfCells(spark, dir, "graft-ann-purge-spec-")
    val tomb = Similarity.annTombstoneAdmit(spark, dir, cells)
    val before = graft.operators.Connectors.readTable(spark, cells)
    val nBefore = before.count()
    val nTomb = before.join(
      graft.operators.Connectors.readTable(spark, tomb), Seq("vec_id"), "left_semi").count()
    assert(nTomb > 0, "fixture planted no tombstoned vectors")
    graft.operators.Connectors.replaceTable(spark, cells,
      before.join(graft.operators.Connectors.readTable(spark, tomb),
        Seq("vec_id"), "left_anti"))
    val after = graft.operators.Connectors.readTable(spark, cells)
    assert(after.join(graft.operators.Connectors.readTable(spark, tomb),
      Seq("vec_id"), "left_semi").count() == 0,
      "tombstoned vectors survived the purge rewrite")
    assert(after.count() == nBefore - nTomb, "purge dropped retained vectors")
  }

  test("ann compact serves bit-identical rankings to the member'd catalog") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4))).sortBy(x => (x._1, x._3))
    // compaction changes bytes, not answers: the quantizer is release-frozen
    // and cell assignments ride with their rows, invariant under re-membering
    assert(rows(Similarity.annCompact(spark, dir))
      .sameElements(rows(Similarity.incrementalIvf(spark, dir))))
    // and the bytes really change: a compacted catalog is ONE owned
    // generation — no external member refs survive
    val cells = Similarity.admittedIvfCells(spark, dir, "graft-ann-compact-spec-")
    val preGen = new java.io.File(cells).listFiles().count(_.getName.startsWith("_gen-"))
    graft.operators.Connectors.compact(spark, cells)
    val cur = java.nio.file.Files.readString(
      java.nio.file.Paths.get(cells, "_CURRENT")).trim
    assert(cur.startsWith("_gen-"),
      s"compacted catalog still member'd: pointer = $cur")
    assert(preGen >= 1, "fixture admitted no delta generation")
  }

  test("index purge physically erases tombstoned postings and serves forget's answers") {
    import graft.operators.TextAnalysis
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).sortBy(x => (x._1, x._3))
    // the purge changes bytes, not answers
    assert(rows(TextAnalysis.indexPurge(spark, dir))
      .sameElements(rows(TextAnalysis.indexForget(spark, dir))))
    // and the bytes really change: replay the purge on a catalog we hold,
    // then read the PHYSICAL table — zero tombstoned rows anywhere, with
    // postings otherwise intact (count conservation against the pre-purge
    // snapshot)
    val (post, stats) = TextAnalysis.admittedCatalog(spark, dir)
    val before = graft.operators.Connectors.readTable(spark, post)
    val nBefore = before.count()
    val nTomb = before.filter(col("doc_id") % 13 === 0).count()
    assert(nTomb > 0, "fixture planted no tombstoned postings")
    graft.operators.Connectors.replaceTable(spark, post,
      before.filter(col("doc_id") % 13 =!= 0))
    val after = graft.operators.Connectors.readTable(spark, post)
    assert(after.filter(col("doc_id") % 13 === 0).count() == 0,
      "tombstoned postings survived the purge rewrite")
    assert(after.count() == nBefore - nTomb, "purge dropped retained postings")
    val _ = stats // stats path exercised through indexPurge above
  }

  test("index compact serves bit-identical rankings to the member'd catalog") {
    import graft.operators.TextAnalysis
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).sortBy(x => (x._1, x._3))
    // compaction changes bytes, not answers: df/nd/avgdl are catalog
    // totals, invariant under re-membering
    assert(rows(TextAnalysis.indexCompact(spark, dir))
      .sameElements(rows(TextAnalysis.incrementalIndex(spark, dir))))
  }

  test("index forget: tombstoned docs vanish, stats correct, empty forget is identity") {
    import graft.operators.TextAnalysis
    val inc = TextAnalysis.incrementalIndex(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4))).sortBy(x => (x._1, x._3))
    val fg = TextAnalysis.indexForget(spark, dir).collect()
    // no tombstoned doc is ever served
    assert(fg.forall(_.getLong(1) % 13 != 0), "a forgotten doc was served")
    // ranks stay dense per query — retraction re-ranks, it doesn't leave holes
    fg.groupBy(_.getString(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length),
        s"query $q: ranks not dense after retraction")
    }
    // the workload actually retracts something visible: at least one doc
    // ranked by the un-forgotten catalog is gone
    val served = fg.map(r => (r.getString(0), r.getLong(1))).toSet
    assert(inc.exists(x => x._2 % 13 == 0 && !served((x._1, x._2))),
      "fixture exercised no visible retraction")
    // an EMPTY tombstone table is the identity: the anti-join plumbing
    // must not perturb scores, ranks, or df derivation
    val (post, stats) = TextAnalysis.admittedCatalog(spark, dir)
    // scratchCatalog registers the shutdown-hook sweep — repeated test runs
    // must not accumulate graft-tomb-empty-* dirs in /tmp (r15 ADVICE)
    val tomb = graft.operators.Connectors.scratchCatalog("graft-tomb-empty-")
    graft.operators.Connectors.appendTo(spark, tomb,
      spark.range(0).select(col("id").as("doc_id")))
    val viaEmpty = TextAnalysis.bm25CatalogSearch(spark, post, stats, Some(tomb))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getDouble(4))).sortBy(x => (x._1, x._3))
    assert(viaEmpty.sameElements(inc), "empty tombstone set is not the identity")
  }

  test("silence segments tile each clip into alternating maximal runs under the exact quiet rule") {
    val frames = Multimodal.pcmEnergy(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) =>
        d -> rs.map(r => (r.getInt(1), r.getDouble(3))).sortBy(_._1) }
    val segs = Multimodal.silenceSegments(spark, dir).collect().groupBy(_.getLong(0))
    assert(segs.nonEmpty)
    assert(segs.keySet == frames.keySet, "segment docs != framed docs")
    segs.foreach { case (d, rows) =>
      val s = rows.sortBy(_.getAs[Int]("seg_no"))
      // contiguity: segments tile the clip's frame range exactly
      var next = 0
      s.foreach { r =>
        assert(r.getAs[Int]("start_frame") == next, s"doc $d: gap at seg ${r.getAs[Int]("seg_no")}")
        next += r.getAs[Long]("n_frames").toInt
      }
      assert(next == frames(d).length, s"doc $d: segments don't cover all frames")
      // maximality: adjacent segments alternate kind (a run never splits)
      s.map(_.getAs[Boolean]("is_quiet")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a != b, s"doc $d: adjacent segments share a kind")
        case _ => ()
      }
      // the quiet rule, replayed exactly: acc·10·nf < tot·8 in BigInt
      val accs = frames(d).map { case (_, e) => BigInt((e * 256).toLong) }
      val tot = accs.sum; val nf = accs.length
      s.foreach { r =>
        val f0 = r.getAs[Int]("start_frame")
        val q = r.getAs[Boolean]("is_quiet")
        (f0 until f0 + r.getAs[Long]("n_frames").toInt).foreach { i =>
          assert((accs(i) * 10 * nf < tot * 8) == q,
            s"doc $d frame $i: quiet flag disagrees with the exact rule")
        }
        // peak replay: max energy over the run through Exact.rnd's exact
        // floor(x·10⁴ + 0.5)/10⁴ double arithmetic
        val peak = (f0 until f0 + r.getAs[Long]("n_frames").toInt)
          .map(frames(d)(_)._2).max
        assert(r.getAs[Double]("peak_energy") ==
          math.floor(peak * 10000 + 0.5) / 10000)
      }
    }
  }

  test("IVF-PQ re-rank recovers flat-IVF recall: adc <= rerank <= ivf2 per query") {
    def top(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = top(Similarity.cosineTopK(spark, dir).select("q_id", "vec_id"))
    val adc = top(Similarity.annIvfPq(spark, dir).select("q_id", "vec_id"))
    val rr = top(Similarity.annIvfPqRerank(spark, dir).select("q_id", "vec_id"))
    val ivf2 = top(Similarity.annIvf2(spark, dir).select("q_id", "vec_id"))
    def recall(ann: Map[Long, Set[Long]])(q: Long) =
      ann.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / exact(q).size
    val qs = exact.keys.toSeq
    // lower structural bound: any exact-top-10 member ADC ranks into its
    // top-10 is also in the top-R shortlist, and exact re-scoring can only
    // displace it with other exact-top-10 members — so re-ranking never
    // loses a recalled neighbor
    val below = qs.filter(q => recall(rr)(q) < recall(adc)(q))
    assert(below.isEmpty, s"re-rank lost recall vs raw ADC on: $below")
    // upper structural bound: the candidate cells are the same nprobe=2
    // set ivf2 exact-scores in full — a shortlist of them cannot beat it
    val above = qs.filter(q => recall(rr)(q) > recall(ivf2)(q))
    assert(above.isEmpty, s"re-rank recall exceeded its ivf2 bound on: $above")
    // the point of the refine stage: ADC ordering errors inside the
    // R = 4k shortlist vanish, so the mean returns to the flat-IVF level
    // (the raw-ADC test floors its mean at 0.4; re-ranked recall must
    // clear the ivf2 test's own 0.7 bound)
    val mean = qs.map(recall(rr)).sum / qs.size
    val meanAdc = qs.map(recall(adc)).sum / qs.size
    assert(mean >= 0.7, f"mean re-ranked recall $mean%.3f below 0.7 " +
      f"(raw ADC $meanAdc%.3f)")
    // the release-gate query must report exactly this measurement (micro
    // average == macro average here: every probe has a full 10-member
    // exact top-10)
    val gate = Similarity.annEval(spark, dir).head
    assert(gate.getLong(0) == qs.size, "gate query count mismatch")
    assert(gate.getLong(1) == qs.size * 10L)
    assert(math.abs(gate.getDouble(3) - mean) < 1e-4,
      s"gate recall ${gate.getDouble(3)} != measured $mean")
  }

  test("re-rank depth R: recall@10 is monotone in R and RerankR sits on the plateau") {
    // the FAISS k_factor folklore says refine shortlists of ~4k suffice;
    // MEASURED here: 0.49 / 0.61 / 0.75 / 0.77 at R = 10/20/40/80, so 4k
    // left 0.02 under the ceiling and RerankR was set to the measured
    // plateau (8k) instead. Structure: a deeper shortlist is a SUPERSET
    // re-scored exactly, so per-query recall is monotone in R; the
    // plateau value is the flat-IVF nprobe=2 recall — the structural
    // ceiling no shortlist depth can beat.
    def top(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = top(Similarity.cosineTopK(spark, dir).select("q_id", "vec_id"))
    def recallOf(ann: Map[Long, Set[Long]]): Map[Long, Double] =
      exact.map { case (q, ex) =>
        q -> ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
    def recallAt(r: Int): Map[Long, Double] =
      recallOf(top(Similarity.annIvfPqRerankAt(spark, dir, r)
        .select("q_id", "vec_id")))
    val rs = Seq(10, 20, 40, Similarity.RerankR)
    val byR = rs.map(r => r -> recallAt(r)).toMap
    for (Seq(lo, hi) <- rs.sliding(2)) {
      val worse = exact.keys.filter(q => byR(hi)(q) < byR(lo)(q))
      assert(worse.isEmpty,
        s"recall fell from R=$lo to R=$hi on queries: $worse")
    }
    def mean(m: Map[Long, Double]) = m.values.sum / m.size
    // the plateau: at the shipped depth, mean recall reaches the ivf2
    // ceiling itself — deepening the shortlist further cannot buy anything
    val ceiling = mean(recallOf(
      top(Similarity.annIvf2(spark, dir).select("q_id", "vec_id"))))
    assert(ceiling - mean(byR(Similarity.RerankR)) <= 1e-9,
      f"RerankR=${Similarity.RerankR} not on the plateau: " +
        f"${mean(byR(Similarity.RerankR))}%.3f vs ivf2 ceiling $ceiling%.3f " +
        f"(R=10 ${mean(byR(10))}%.3f, R=20 ${mean(byR(20))}%.3f, " +
        f"R=40 ${mean(byR(40))}%.3f)")
  }

  test("IVF nprobe=2 recall dominates nprobe=1 on every query and lifts the mean") {
    // superset candidates re-ranked by the same exact score can only swap
    // an exact-top-10 member for another exact-top-10 member, so per-query
    // recall is provably monotone in nprobe — assert it, then the lift
    def top(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = top(Similarity.cosineTopK(spark, dir).select("q_id", "vec_id"))
    val p1 = top(Similarity.annIvf(spark, dir).select("q_id", "vec_id"))
    val p2 = top(Similarity.annIvf2(spark, dir).select("q_id", "vec_id"))
    def recall(ann: Map[Long, Set[Long]])(q: Long) =
      ann.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / exact(q).size
    val qs = exact.keys.toSeq // toSeq: Set.map would collapse EQUAL recalls
    val worse = qs.filter(q => recall(p2)(q) < recall(p1)(q))
    assert(worse.isEmpty, s"nprobe=2 lost recall on queries: $worse")
    val m1 = qs.map(recall(p1)).sum / qs.size
    val m2 = qs.map(recall(p2)).sum / qs.size
    assert(m2 >= m1, f"mean recall fell: $m1%.3f -> $m2%.3f")
    // measured at this fixture: nprobe=1 ≈ 0.48, nprobe=2 ≈ 0.77 over 8
    // cells — the bound pins the lift with headroom for fixture drift
    assert(m2 >= 0.7, f"nprobe=2 mean top-10 recall $m2%.3f below 0.7")
  }

  test("connected components contracts a 1000-node path in O(log n) rounds") {
    // the chain-graph worst case for label propagation (diameter 999): the
    // two-phase contraction must close it in logarithmic rounds
    val n = 1000
    val path = spark.range(0, n - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(path, "doc_id")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == n)
    assert(got.forall(_._2 == 0L), "one component rooted at the min id")
    val bound = 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt + 4
    assert(rounds <= bound, s"$rounds rounds exceeds O(log n) bound $bound")
  }

  test("pack layout matches a per-shard sequential packer at two shard counts") {
    import graft.operators.TextAnalysis
    for (shards <- Seq(8, 32)) {
      val rows = TextAnalysis.packSequencesAt(spark, dir, shards)
        .select("shard", "doc_id", "n_tokens", "start_offset", "first_chunk", "last_chunk")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(rows.map(_._1).distinct.length > 1, "fixture should span shards")
      rows.groupBy(_._1).foreach { case (shard, ds) =>
        var off = 0L // the sequential packer's running offset
        ds.sortBy(_._2).foreach { case (_, id, n, start, fc, lc) =>
          assert(start == off, s"shard $shard doc $id: start $start != $off")
          assert(fc == Math.floorDiv(start, 512L) &&
                 lc == Math.floorDiv(start + n - 1, 512L),
            s"shard $shard doc $id: chunk span ($fc,$lc) wrong for [$start,${start + n})")
          off += n
        }
      }
    }
    // and the registered query picks the corpus-dictated shard count
    assert(TextAnalysis.packShards(Tables.documents(spark, dir).count()) == 8)
  }

  test("aHash near-dup: exact re-encodes at Hamming 0, perturbed frames recalled, quarantine bites") {
    val out = Multimodal.ahashNearDup(spark, dir).cache()
    val lb = Multimodal.ahashHashedOf(spark, Multimodal.ahashCorpus(spark, dir))
      .select("doc_id", "letterboxed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    try {
      val docs = Tables.documents(spark, dir).select("doc_id")
      val exactIds = docs.filter(col("doc_id") % 31 === 0)
        .collect().map(_.getLong(0))
      val pairs = out.select("doc_a", "doc_b", "hamming").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
      // every verbatim re-encode collides with its source at distance 0 —
      // the exact-signature path covers letterboxed images too
      exactIds.foreach { id =>
        assert(pairs.get((id, id + 5000000)).contains(0),
          s"exact re-encode of $id not found at Hamming 0")
      }
      // the bound is the pigeonhole radius of the adaptive chunk geometry
      val n = Tables.documents(spark, dir).count() * 2 // corpus < 4096 here
      assert(n < 4096, "fixture should exercise the 8-bit-chunk config")
      assert(pairs.values.forall(_ <= 7), "pair beyond the Hamming bound")
      // the quarantine bites: no cross-signature pair (hamming > 0) may
      // touch a letterboxed endpoint — those route to the exact path only
      pairs.foreach { case ((a, b), h) =>
        if (h > 0) assert(!lb(a) && !lb(b),
          s"cross pair ($a,$b) has a quarantined endpoint")
      }
      // two-pixel perturbation: most UN-QUARANTINED mutated plants stay
      // inside the radius (pairs with a letterboxed endpoint are
      // quarantined by design — their hash is mostly pad, not content)
      val mutIds = docs.filter(col("doc_id") % 23 === 0)
        .collect().map(_.getLong(0))
        .filter(id => !lb(id) && !lb(id + 4000000))
      assert(mutIds.nonEmpty, "every planted mutant pair got quarantined — vacuous recall")
      val recalled = mutIds.count(id => pairs.contains((id, id + 4000000)))
      assert(recalled.toDouble / mutIds.length >= 0.8,
        s"only $recalled/${mutIds.length} clean perturbed frames recalled")
    } finally out.unpersist()
  }

  test("aHash signature-collapsed blocking is pair-for-pair the naive doc-keyed join") {
    // the r15 skew fix (collapse identical signatures before the chunk
    // join, expand doc pairs afterwards) must be output-invariant against
    // the naive doc-keyed shape UNDER THE SAME QUARANTINE: same pair set,
    // same hamming values, each pair exactly once. The naive reference is
    // (a) the doc-keyed chunk join over clean docs for cross-signature
    // pairs, plus (b) identical-signature pairs over ALL docs at 0.
    import graft.operators.{Dedup, Multimodal}
    val corpus = Multimodal.ahashCorpus(spark, dir)
    val w = Dedup.simhashChunkBits(corpus.count())
    val hashed = Multimodal.ahashHashedOf(spark, corpus).cache()
    try {
      val nchunks = 64 / w
      val chunks = Multimodal.ahashChunksOf(hashed.filter(!col("letterboxed")), w)
      val cross = chunks.as("x").join(chunks.as("y"), Seq("c", "chunk"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          (bit_count(col("x.hash_hi").bitwiseXOR(col("y.hash_hi"))) +
           bit_count(col("x.hash_lo").bitwiseXOR(col("y.hash_lo")))).as("hamming"))
        .filter(col("hamming") <= nchunks - 1 && col("hamming") > 0)
        .dropDuplicates("doc_a", "doc_b")
      val within = hashed.as("u").join(hashed.as("v"), Seq("hash_hi", "hash_lo"))
        .filter(col("u.doc_id") < col("v.doc_id"))
        .select(col("u.doc_id").as("doc_a"), col("v.doc_id").as("doc_b"),
          lit(0).as("hamming"))
      val naive = cross.unionAll(within)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val collapsed = Multimodal.ahashPairs(hashed, w)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      assert(collapsed.length == collapsed.map(_._1).distinct.length,
        "collapsed blocking emitted a doc pair more than once")
      assert(collapsed.toMap == naive,
        s"pair sets differ: naive ${naive.size}, collapsed ${collapsed.length}")
      assert(naive.nonEmpty, "fixture produced no pairs — vacuous equivalence")
      assert(naive.values.exists(_ > 0), "no cross-signature pair survived — vacuous")
    } finally hashed.unpersist()
  }

  test("dedup forget: tombstoned corpus docs stop blocking re-admission") {
    import graft.operators.Dedup
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    val inc = m(Dedup.incrementalDedup(spark, dir))
    val fg = m(Dedup.dedupForget(spark, dir))
    assert(fg.keySet == inc.keySet, "forget changed the batch itself")
    // monotone: forgetting references can only REMOVE matches
    fg.foreach { case (id, (n, adm)) =>
      assert(n <= inc(id)._1, s"batch doc $id gained matches after forget")
      if (inc(id)._2) assert(adm, s"admitted batch doc $id flipped to rejected")
    }
    // the forget is visible, and only where it should be: flips are exactly
    // verbatim twins of forgotten corpus docs
    val flipped = fg.keys.filter(id => fg(id)._2 && !inc(id)._2)
    assert(flipped.nonEmpty, "no decision flipped — the forget was invisible")
    assert(flipped.forall(id => (id - 3000000L) % 20 == 0),
      "a decision flipped outside the forgotten-twin set")
  }

  test("dedup purge physically erases tombstoned signatures and serves forget's decisions") {
    import graft.operators.{Connectors, Dedup, DedupStaging}
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    // the purge changes bytes, not answers
    assert(m(Dedup.dedupPurge(spark, dir)).sameElements(m(Dedup.dedupForget(spark, dir))))
    // and the bytes really change: replay the rewrite on a catalog we hold
    DedupStaging.minhashSigs(spark, dir)
    val t = s"${Connectors.scratchCatalog("graft-dedup-purge-spec-")}/sigs"
    Connectors.appendMemberRef(spark, t,
      DedupStaging.committedDataDir(dir, "minhash_sigs").get)
    val before = Connectors.readTable(spark, t)
    val nBefore = before.count()
    val nTomb = before.filter(col("doc_id") % 20 === 0).count()
    assert(nTomb > 0, "fixture tombstoned no signatures")
    Connectors.replaceTable(spark, t, before.filter(col("doc_id") % 20 =!= 0))
    val after = Connectors.readTable(spark, t)
    assert(after.filter(col("doc_id") % 20 === 0).count() == 0,
      "tombstoned signatures survived the purge rewrite")
    assert(after.count() == nBefore - nTomb, "purge dropped retained signatures")
  }

  test("dedup compact serves bit-identical decisions to the member'd catalog") {
    import graft.operators.{Connectors, Dedup}
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    // compaction changes bytes, not answers: signatures and shingle sets
    // ride whole with their rows, invariant under re-membering
    assert(m(Dedup.dedupCompact(spark, dir))
      .sameElements(m(Dedup.incrementalCommit(spark, dir))))
    // and the bytes really change: both compacted tables are ONE owned
    // generation — the external release refs' lifetime ends at OPTIMIZE
    val (sigsT, shT) = Dedup.admittedDedupCatalog(spark, dir,
      "graft-dedup-compact-spec-")
    Seq(sigsT, shT).foreach { t =>
      Connectors.compact(spark, t)
      val cur = java.nio.file.Files.readString(
        java.nio.file.Paths.get(t, "_CURRENT")).trim
      assert(cur.startsWith("_gen-"),
        s"compacted table $t still member'd: pointer = $cur")
    }
  }

  test("span scrub: excerpts scrub to empty, owners keep, token counts conserve") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.spanScrub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byId = out.map(x => x._1 -> x).toMap
    // conservation, everywhere: kept tokens = n_tokens - n_scrubbed, and
    // short docs (< W tokens) are never touched
    out.foreach { case (id, n, s, kept) =>
      assert(s >= 0 && s <= n, s"doc $id: scrubbed $s outside [0, $n]")
      val nKept = kept.split(" ").count(_.nonEmpty)
      assert(nKept == n - s, s"doc $id: kept $nKept != $n - $s")
      if (n < TextAnalysis.SpanW) assert(s == 0, s"short doc $id was scrubbed")
    }
    // every planted excerpt with >= W tokens is foreign everywhere it
    // overlaps the corpus (its source owns the windows) -> scrubs to EMPTY
    val excerpts = out.filter(_._1 >= 6000000L)
    assert(excerpts.nonEmpty, "fixture planted no excerpts")
    excerpts.filter(_._2 >= TextAnalysis.SpanW).foreach { case (id, n, s, kept) =>
      assert(s == n && kept.isEmpty, s"excerpt $id not fully scrubbed: $s/$n")
    }
    // keep-one is visible on the plant pairs: a source doc that is NOT
    // itself a natural duplicate of a smaller doc keeps its copy intact
    // (doc 174 at sf0.001 is the counter-case — a natural verbatim twin
    // with a smaller-id owner — so the pin is conditional on n_scrubbed=0,
    // and at least one such intact owner must exist for the pin to bite)
    val intactOwners = excerpts.flatMap(e => byId.get(e._1 - 6000000L))
      .filter(_._3 == 0L)
    assert(intactOwners.nonEmpty, "no plant source survived intact")
  }

  test("repeated spans: planted excerpts are fully duplicated in one maximal run") {
    import graft.operators.TextAnalysis
    val out = TextAnalysis.repeatedSpans(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextAnalysis.normTokens(col("text"))).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val planted = docs.filter(_._1 % 29 == 0)
    assert(planted.nonEmpty, "fixture planted no excerpts")
    planted.foreach { case (id, n) =>
      val ex = math.min(n, 40) // the excerpt's token count
      val (nw, nd, frac, span) = out(id + 6000000L)
      if (ex >= 15) {
        // every excerpt window recurs in the original: one maximal run
        // covering the whole excerpt
        assert(nw == ex - 14L, s"plant $id: window count")
        assert(nd == nw, s"plant $id: excerpt not fully duplicated")
        assert(frac == 1.0, s"plant $id: dup_frac")
        assert(span == ex.toLong, s"plant $id: longest span $span != $ex")
        // and the original carries a duplicated span at least that long
        assert(out(id)._4 >= ex.toLong, s"original $id: span shorter than excerpt")
      } else {
        assert(nw == 0L && nd == 0L && span == 0L, s"short plant $id not all-zero")
      }
    }
  }

  test("release diff: statuses partition both releases and token deltas conserve") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.releaseDiff(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.normTokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val removed = docs.count(_._1 % 17 == 0)
    val added = docs.count(_._1 % 10 == 0)
    val survivors = docs.length - removed
    assert(rows("removed")._1 == removed)
    assert(rows("added")._1 == added)
    assert(rows("unchanged")._1 + rows("modified")._1 == survivors,
      "unchanged + modified must cover exactly the surviving documents")
    // boundary columns: an added doc has no before-tokens, a removed doc
    // no after-tokens
    assert(rows("added")._2 == 0 && rows("removed")._3 == 0)
    // halving strictly shrinks every modified doc (a <=1-token doc halves
    // to itself and lands in unchanged)
    assert(rows("modified")._3 < rows("modified")._2,
      "modified docs must lose tokens under the halving rule")
    assert(rows("unchanged")._2 == rows("unchanged")._3)
    // global conservation: before-side totals = corpus tokens minus the
    // added rows' (empty) before side
    val corpusTokens = docs.map(_._2).sum
    assert(rows.values.map(_._2).sum == corpusTokens,
      "tokens_before must total the release-A corpus")
  }

  test("BPE training: 8 well-formed rounds and the merge loop feeds itself") {
    val steps = TextAnalysis.bpeTrain(spark, dir)
      .orderBy("step").collect()
    assert(steps.map(_.getInt(0)).toSeq == (1 to 8),
      "one merge per round, in order")
    steps.foreach { r =>
      assert(r.getString(1).matches("^\\|[a-z0-9]+ \\|[a-z0-9]+$"),
        s"malformed merge pair '${r.getString(1)}'")
      assert(r.getLong(2) > 0)
    }
    // at least one later winner must merge a symbol BUILT by an earlier
    // round (a multi-char side) — the signature of real iterative BPE, as
    // opposed to a static bigram census
    assert(steps.exists(_.getString(1).split(" ").exists(_.length > 2)),
      s"no compound symbol among winners: ${steps.map(_.getString(1)).mkString(", ")}")
  }

  test("BPE merge application anchors both symbol edges") {
    import spark.implicits._
    val cases = Seq(
      // the corruption case the right-edge sentinel exists for: after
      // earlier rounds built |bc, winner (|a,|b) must NOT match inside
      // "|a |bc" (its right symbol is a strict prefix of a longer merge
      // product — the unanchored replace rewrote this to "|abc", a merge
      // of a pair that never existed)
      ("|a |bc", "|a |b", "|a |bc"),
      ("|a |b |c", "|a |b", "|ab |c"),     // interior boundary match
      ("|x |a |b", "|a |b", "|x |ab"),     // match at end-of-sequence
      ("|a |b |a |b", "|a |b", "|ab |ab"), // repeated non-overlapping
      ("|a |a |a", "|a |a", "|aa |a"),     // self-pair: leftmost, no overlap
      ("|ca |b", "|a |b", "|ca |b"))       // left edge: '|' opens every symbol
    cases.toDF("seq", "mpr", "want")
      .withColumn("got", TextAnalysis.applyMerge(col("seq"), col("mpr")))
      .collect().foreach { r =>
        assert(r.getAs[String]("got") == r.getAs[String]("want"),
          s"applyMerge('${r.getAs[String]("seq")}', '${r.getAs[String]("mpr")}')" +
            s" = '${r.getAs[String]("got")}', want '${r.getAs[String]("want")}'")
      }
  }

  test("BPE encode matches a reference Sennrich replay on every vocab word") {
    // reference implementation: apply the trainer's own merge list, in
    // order, greedy leftmost non-overlapping — the semantics applyMerge
    // claims — to every distinct word, and require the engine's final
    // vocabulary to agree symbol-for-symbol (encode∘train coherence)
    val merges = TextAnalysis.bpeTrain(spark, dir).orderBy("step")
      .collect().map(_.getString(1))
    def encodeWord(word: String): Vector[String] = {
      var syms = word.map(ch => s"|$ch").toVector
      merges.foreach { m =>
        val Array(x, y) = m.split(" ")
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
            out += x + y.stripPrefix("|"); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val vocab = TextAnalysis.bpeLearn(spark, dir)._2
      .select("word", "seq").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(vocab.nonEmpty)
    vocab.foreach { case (word, seq) =>
      val want = encodeWord(word).mkString(" ")
      assert(seq == want, s"'$word' segmented '$seq', reference '$want'")
      // lossless round-trip: stripping the anchors reproduces the word
      assert(seq.replace(" ", "").replace("|", "") == word)
    }
    // and the fixture actually exercises multi-symbol segmentations
    assert(vocab.exists(_._2.contains(" ")), "no word split into >1 symbol")
  }

  test("temperature mix: weights renormalize, rates invert the share order, head downsampled") {
    // order by the EXACT token count (lang tiebreak), not the 6-decimal
    // rounded share — a rounded-share tie would make the monotonicity
    // check order-dependent
    val rows = TextAnalysis.temperatureMix(spark, dir)
      .orderBy(col("n_tokens").desc, col("lang")).collect()
    assert(rows.length > 1)
    val shares = rows.map(_.getDouble(2))
    val weights = rows.map(_.getDouble(3))
    val rates = rows.map(_.getDouble(4))
    // both distributions are (rounded) probability vectors
    assert(math.abs(shares.sum - 1.0) < 1e-4, s"shares sum ${shares.sum}")
    assert(math.abs(weights.sum - 1.0) < 1e-4, s"weights sum ${weights.sum}")
    // α = 1/2 smoothing: sampling rate is strictly decreasing in share
    // (p^{-1/2} is), so the share-descending order is rate-ascending
    assert(rates.sameElements(rates.sorted),
      s"rates not monotone against share: ${rates.mkString(",")}")
    // smoothing moves mass off the head onto the tail — with non-uniform
    // shares some language must land on each side of rate 1
    assert(rates.head < 1.0, s"head language not downsampled: ${rates.head}")
    assert(rates.last > 1.0, s"tail language not upsampled: ${rates.last}")
    assert(rates.forall(_ <= 4.0), "upsampling cap violated")
  }

  test("BPE fertility: per-language report conserves the encode totals") {
    val f = TextAnalysis.bpeFertility(spark, dir).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      // every word is at least one symbol; every id covers >= 1 char
      assert(r.getLong(3) >= r.getLong(2),
        s"${r.getString(0)}: fewer ids than words")
      assert(r.getLong(4) >= r.getLong(3),
        s"${r.getString(0)}: fewer chars than ids")
      assert(r.getDouble(5) >= 1.0 && r.getDouble(6) >= 1.0)
    }
    // the language rollup is a partition of the encode manifests
    val encTotal = TextAnalysis.bpeEncode(spark, dir)
      .agg(sum(col("n_ids").cast("long")), count(lit(1))).head
    assert(f.map(_.getLong(3)).sum == encTotal.getLong(0),
      "per-language id totals must sum to the encode total")
    assert(f.map(_.getLong(1)).sum == encTotal.getLong(1))
  }

  test("BPE packing tiles each shard gap-free with the encode id counts") {
    val p = TextAnalysis.packBpe(spark, dir).collect()
    assert(p.nonEmpty)
    p.groupBy(_.getLong(1)).foreach { case (s, rows) =>
      var off = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) == off,
          s"shard $s: offset gap at doc ${r.getLong(0)}")
        off += r.getInt(2)
      }
    }
    // the packed layout covers exactly the encoded corpus
    val total = p.map(_.getInt(2).toLong).sum
    val enc = TextAnalysis.bpeEncode(spark, dir)
      .agg(sum(col("n_ids").cast("long"))).head.getLong(0)
    assert(total == enc, s"packed $total ids vs encoded $enc")
  }

  test("source overlap: sketch estimate tracks exact Jaccard within MinHash error") {
    val rows = Dedup.sourceOverlap(spark, dir)
      .select("jaccard", "est_jaccard").collect()
    assert(rows.length == 190, "20 sources -> 190 unordered pairs")
    // 16 hashes: per-pair std ~ sqrt(p(1-p)/16) <= 0.125; the mean abs
    // error across 190 pairs concentrates far tighter. Measured on the
    // fixture: mean 0.034, max 0.17 — bounds at ~2x headroom.
    val errs = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    assert(errs.max <= 0.35, s"sketch estimate off by ${errs.max}")
    assert(errs.sum / errs.length <= 0.08,
      s"mean sketch error ${errs.sum / errs.length}")
    rows.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("contamination score grades the partial plants strictly between 0 and 1") {
    val out = Dedup.contaminationScore(spark, dir).cache()
    try {
      val plants = out.filter(col("doc_id") >= 3000000)
        .select("contamination").collect().map(_.getDouble(0))
      assert(plants.nonEmpty, "partial plants must be present")
      // every-16th-token mutation: windows inside the 15-token clean runs
      // survive — scores must land mid-range, neither the hard-gate 1.0
      // nor the no-overlap 0.0
      plants.foreach(c => assert(c > 0.2 && c < 0.9,
        s"plant contamination $c outside the graded regime"))
      // the natural corpus shares no 8-grams with the held-out slice
      assert(out.filter(col("doc_id") < 3000000 && col("contamination") > 0)
        .count() == 0)
      // and no doc can hit more grams than it has
      assert(out.filter(col("n_hit") > col("n_grams")).count() == 0)
    } finally out.unpersist()
  }

  test("PCM near-dup: delta-sign fingerprint recalls every clean plant at the bound") {
    val corpus = Multimodal.pcmCorpus(spark, dir)
    val hashed = Multimodal.pcmSigOf(spark, corpus).cache()
    val out = Multimodal.pcmNearDup(spark, dir).cache()
    try {
      val sigs = hashed.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)), r.getBoolean(3)))
        .toMap
      val pairs = out.select("doc_a", "doc_b", "hamming").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
      // every verbatim re-encode collides with its source at distance 0 —
      // the identical-signature path covers quarantined clips too
      val exactIds = sigs.keys.filter(id => id < 4000000 && id % 31 == 0)
        .filter(id => sigs.contains(id + 5000000)).toSeq
      assert(exactIds.nonEmpty, "no verbatim plants in the fixture — vacuous")
      exactIds.foreach { id =>
        assert(pairs.get((id, id + 5000000)).contains(0),
          s"verbatim re-encode of $id not found at Hamming 0")
      }
      // the STRUCTURAL claim delta coding buys: a perturbation confined to
      // segment 0 can only flip signature bits 0 and 63 (its two
      // neighboring ring comparisons) — so every perturbed plant sits at
      // Hamming <= 2, provably inside the verify bound, and recall for
      // quarantine-free pairs is 100%, not a measured fraction
      val mutIds = sigs.keys.filter(id => id < 4000000 && id % 23 == 0)
        .filter(id => sigs.contains(id + 4000000)).toSeq
      assert(mutIds.nonEmpty, "no perturbed plants in the fixture — vacuous")
      mutIds.foreach { id =>
        val ((ahi, alo), aq) = sigs(id)
        val ((bhi, blo), bq) = sigs(id + 4000000)
        assert(((alo ^ blo) & ~1L) == 0L && ((ahi ^ bhi) & ~(1L << 31)) == 0L,
          s"perturbed pair $id differs outside signature bits {0, 63}")
        if (!aq && !bq)
          assert(pairs.contains((id, id + 4000000)),
            s"clean perturbed pair $id not recalled")
      }
      // pigeonhole radius of the adaptive chunk geometry (corpus < 4096
      // here: 8-bit chunks, bound 7) and the quarantine contract: no
      // cross-signature pair touches an all-zero-signature endpoint
      assert(pairs.values.forall(_ <= 7), "pair beyond the Hamming bound")
      pairs.foreach { case ((a, b), h) =>
        if (h > 0) assert(!sigs(a)._2 && !sigs(b)._2,
          s"cross pair ($a,$b) has a quarantined endpoint")
      }
    } finally { hashed.unpersist(); out.unpersist() }
  }

  test("video near-dup: temporal fingerprint recalls every clean plant at the bound") {
    val corpus = Multimodal.videoCorpus(spark, dir)
    val hashed = Multimodal.videoSigOf(spark, corpus).cache()
    val out = Multimodal.videoNearDup(spark, dir).cache()
    try {
      val sigs = hashed.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)), r.getBoolean(3)))
        .toMap
      assert(sigs.nonEmpty, "no eligible clips — vacuous")
      val pairs = out.select("doc_a", "doc_b", "hamming").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
      // every verbatim re-encode collides with its source at distance 0 —
      // the identical-signature path covers quarantined clips too (their
      // content keys match by construction)
      val exactIds = sigs.keys.filter(id => id < 4000000 && id % 31 == 0)
        .filter(id => sigs.contains(id + 5000000)).toSeq
      assert(exactIds.nonEmpty, "no verbatim plants in the fixture — vacuous")
      exactIds.foreach { id =>
        assert(pairs.get((id, id + 5000000)).contains(0),
          s"verbatim re-encode of $id not found at Hamming 0")
      }
      // the STRUCTURAL claim: a first-pixel perturbation is confined to
      // temporal segment 0 and flips only ring bits {0, 63} — Hamming <= 2,
      // inside the verify bound, so clean-pair recall is 100% by pigeonhole
      val mutIds = sigs.keys.filter(id => id < 4000000 && id % 23 == 0)
        .filter(id => sigs.contains(id + 4000000)).toSeq
      assert(mutIds.nonEmpty, "no perturbed plants in the fixture — vacuous")
      mutIds.foreach { id =>
        val ((ahi, alo), aq) = sigs(id)
        val ((bhi, blo), bq) = sigs(id + 4000000)
        if (!aq && !bq) {
          assert(((alo ^ blo) & ~1L) == 0L && ((ahi ^ bhi) & ~(1L << 31)) == 0L,
            s"perturbed pair $id differs outside signature bits {0, 63}")
          assert(pairs.contains((id, id + 4000000)),
            s"clean perturbed pair $id not recalled")
        }
      }
      assert(mutIds.exists { id => !sigs(id)._2 && !sigs(id + 4000000)._2 },
        "every perturbed plant got quarantined — vacuous recall")
      // pigeonhole radius of the adaptive chunk geometry (corpus < 4096
      // here: 8-bit chunks, bound 7) and the quarantine contract: no
      // cross-signature pair touches a quarantined endpoint
      assert(pairs.values.forall(_ <= 7), "pair beyond the Hamming bound")
      pairs.foreach { case ((a, b), h) =>
        if (h > 0) assert(!sigs(a)._2 && !sigs(b)._2,
          s"cross pair ($a,$b) has a quarantined endpoint")
      }
    } finally { hashed.unpersist(); out.unpersist() }
  }

  test("scene cuts: adaptive threshold segments clips, covers every frame once") {
    import spark.implicits._
    val out = Multimodal.sceneCuts(spark, dir).cache()
    try {
      val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getLong(3), r.getLong(4)))
      assert(rows.nonEmpty, "no scenes — vacuous")
      // frame conservation: per doc, scene lengths sum to the clip's frame
      // count and scenes tile [0, F) without overlap
      val docs = Tables.documents(spark, dir)
        .filter(octet_length(col("text")) === length(col("text")))
        .filter(length(col("text")) >= 48)
        .select(col("doc_id"), (length(col("text")) / 48).cast("long").as("f"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.groupBy(_._1).foreach { case (id, ss) =>
        assert(ss.map(_._4).sum == docs(id),
          s"doc $id: scene frames ${ss.map(_._4).sum} != ${docs(id)}")
        val sorted = ss.sortBy(_._3)
        assert(sorted.map(_._2).toSeq == (1L to ss.length).toSeq,
          s"doc $id: scene numbering not dense")
        sorted.foldLeft(0L) { case (next, (_, _, start, n, _)) =>
          assert(start == next, s"doc $id: gap/overlap at frame $start")
          start + n
        }
      }
      // a synthetic clip with one sharp mid-clip change must split into
      // exactly two scenes at the boundary; a constant clip stays one scene
      val synth = Seq((1L, "a" * 480 + "Z" * 480), (2L, "a" * 480))
        .toDF("doc_id", "text")
      // route the synthetic corpus through the same operator shape by
      // staging it as a one-table fixture dir
      val tmp = java.nio.file.Files.createTempDirectory("scenefix-").toString
      synth.coalesce(1).write.parquet(s"$tmp/documents.parquet")
      val s2 = Multimodal.sceneCuts(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      val clip1 = s2.filter(_._1 == 1L).sortBy(_._2)
      assert(clip1.length == 2 && clip1(0)._3 == 0 && clip1(1)._3 == 10,
        s"sharp mid-change must cut at frame 10: ${clip1.toSeq}")
      val clip2 = s2.filter(_._1 == 2L)
      assert(clip2.length == 1 && clip2(0)._4 == 10L,
        s"constant clip must stay one 10-frame scene: ${clip2.toSeq}")
    } finally out.unpersist()
  }

  test("video fingerprint quarantines constant-gray clips under content keys") {
    import spark.implicits._
    // clip 1: one repeated char — constant gray stream, must quarantine
    // under its payload content key; clip 2: a louder tail — varies, live
    // signature; clips 3/4: a different constant char, twice — shared key
    // distinct from clip 1's (quarantined clips pair iff payloads match)
    val clips = Seq((1L, "a" * 240), (2L, "a" * 200 + "Z" * 40),
        (3L, "b" * 240), (4L, "b" * 240))
      .toDF("doc_id", "text")
    val sig = Multimodal.videoSigOf(spark, clips).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)), r.getBoolean(3)))
      .toMap
    assert(sig(1L)._2, "constant clip must quarantine")
    assert((sig(1L)._1._1 & Multimodal.QuarantineKeyMark) != 0L,
      "quarantined signature must carry the content-key marker")
    assert(!sig(2L)._2 && sig(2L)._1 != ((0L, 0L)),
      "varying clip must carry a live signature")
    assert(sig(3L) == sig(4L), "identical constant payloads share a key")
    assert(sig(3L)._1 != sig(1L)._1,
      "different constant clips must NOT share the quarantine key")
    // sub-minimum clips (< 4 frames) emit nothing
    val short = Multimodal.videoSigOf(spark,
      Seq((5L, "a" * 100)).toDF("doc_id", "text"))
    assert(short.count() == 0)
  }

  test("PCM fingerprint quarantines constant-energy clips under content keys") {
    import spark.implicits._
    // clip 1: one repeated 2-char sample — constant energy, delta-codes to
    // all-zeros and must quarantine; clip 2: same head with a louder tail —
    // energy varies, must NOT quarantine; clips 3/4: a DIFFERENT constant
    // tone, twice — quarantined clips pair iff payloads match (the r18
    // content-key substitution), so 3 and 4 share a key that differs from
    // clip 1's, and silence-vs-tone can never read as a verbatim dup
    val clips = Seq((1L, "ab" * 80), (2L, "ab" * 70 + "XY" * 10),
        (3L, "cd" * 80), (4L, "cd" * 80))
      .toDF("doc_id", "text")
    val sig = Multimodal.pcmSigOf(spark, clips).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)), r.getBoolean(3)))
      .toMap
    assert(sig(1L)._2, "constant clip must quarantine")
    assert((sig(1L)._1._1 & Multimodal.QuarantineKeyMark) != 0L,
      "quarantined signature must carry the content-key marker")
    assert(!sig(2L)._2 && sig(2L)._1 != ((0L, 0L)),
      "varying clip must carry a live signature")
    assert(sig(3L) == sig(4L), "identical constant payloads share a key")
    assert(sig(3L)._1 != sig(1L)._1,
      "different constant tones must NOT share the quarantine key")
    // sub-minimum clips (< 64 samples) emit nothing, like the image path
    val short = Multimodal.pcmSigOf(spark,
      Seq((5L, "ab" * 10)).toDF("doc_id", "text"))
    assert(short.count() == 0)
  }

  test("PCM fingerprint stays exact past the long-product overflow bound") {
    // 6.4M samples (sz = 100k): a loud first half (32767 amplitude) and a
    // silent second half. The cross-multiplied long product acc_hi·sz =
    // 1.07e19 WRAPS Long (max 9.22e18) — a wrapping comparison would read
    // negative, drop the loud→silent boundary bit, and diverge from the
    // oracle's HUGEINT replay; the kernel's BigInt branch must keep it.
    val n = 6400000
    val b = new Array[Byte](2 * n)
    var j = 0
    while (j < n / 2) { b(2 * j) = 0xFF.toByte; b(2 * j + 1) = 0x7F.toByte; j += 1 }
    // second half stays zero-initialized (silence)
    val Some((hi, lo)) = Multimodal.pcmSignature(b)
    assert(((lo >> 31) & 1L) == 1L,
      "the loud-to-silent boundary bit (31) vanished — the long product wrapped")
    assert(hi == 0L && lo == (1L << 31),
      s"expected exactly bit 31 set, got hi=$hi lo=$lo")
  }

  test("keyframe dedup: a re-cut clip sharing only its cold open is recalled at the keyframe level") {
    import spark.implicits._
    // clips 1 and 2 share ONLY frame 0 (identical cold open, different
    // footage after); clip 3 is unrelated, with a constant opening frame
    // (all-ones aHash — structurally distinct from the split-frame
    // signature of the shared open). The whole-clip temporal signatures of
    // 1 and 2 differ — exactly the case clip-level near-dup misses and
    // keyframe dedup exists to catch.
    val f0 = "a" * 24 + "Z" * 24
    val clips = Seq(
      (1L, f0 + "b" * 48 + "Q" * 48 + "c" * 48),
      (2L, f0 + "R" * 48 + "d" * 48 + "S" * 48),
      (3L, "b" * 48 + "e" * 48 + "T" * 48 + "f" * 48))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("kffix-").toString
    clips.coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val out = Multimodal.keyframeAhash(spark, tmp).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)),
        r.getInt(4)))
    // frame 0 opens scene 1 in EVERY clip, so the shared cold open IS both
    // clips' scene-1 keyframe: recalled at Hamming 0 by construction, no
    // matter where the re-cut moved every later scene boundary
    assert(out.exists { case ((ca, sa, cb, sb), h) =>
      ca == 1L && cb == 2L && sa == 1L && sb == 1L && h == 0 },
      s"shared cold open not recalled: ${out.toSeq}")
    // cross-clip only (same-clip scene pairs are dropped), and clip 3's
    // constant opening never reads as the split opening of clips 1/2
    assert(out.forall { case ((ca, _, cb, _), _) => ca != cb },
      "same-clip keyframe pair leaked through")
    assert(!out.exists { case ((_, sa, cb, sb), h) =>
      cb == 3L && sa == 1L && sb == 1L && h == 0 },
      "unrelated opening frame read as a cold-open dup")
    // and on the real fixture: every eligible re-cut plant (doc % 37) is
    // recalled against its original at the CLUSTER level — the shared
    // scene-1 keyframes carry one signature, so both sit in that group's
    // star (a direct edge when the group is exactly the pair; connected
    // through the hub when other clips share the opening signature)
    val edges = Multimodal.keyframeAhash(spark, dir).collect()
      .filter(_.getInt(4) == 0)
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    val parent = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    def find(x: (Long, Long)): (Long, Long) = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val planted = Tables.documents(spark, dir)
      .filter(octet_length(col("text")) === length(col("text")))
      .filter(length(col("text")) >= 48)
      .filter(col("doc_id") % 37 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty, "no re-cut plants in the fixture — vacuous")
    planted.foreach { id =>
      assert(find((id, 1L)) == find((id + 6000000L, 1L)),
        s"re-cut plant of clip $id not in its original's keyframe cluster")
    }
  }

  test("letterbox quarantine keys off TRAILING pad rows, not leading ones") {
    import spark.implicits._
    // The rule every replay oracle must mirror (a round-19 review caught
    // the keyframe oracle testing the FIRST row instead — divergent on
    // exactly these two shapes): ahashHashedOf counts trailing all-pad
    // rows from the bottom, so a pad-like HEAD with a content tail is
    // clean while a content head with a pad TAIL quarantines. 192 chars =
    // the un-padded 16x4 keyframe geometry.
    val content = "A" * 48
    val pad = "x" * 48
    val corpus = Seq(
      (1L, content * 3 + pad), // trailing pad row    -> quarantined
      (2L, pad + content * 3), // leading pad row only -> clean
      (3L, pad * 4))           // fully pad            -> quarantined
      .toDF("doc_id", "text")
    val lb = Multimodal.ahashHashedOf(spark, corpus).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(lb(1L), "content head with an all-pad last row must quarantine")
    assert(!lb(2L), "pad head with a content tail must stay clean")
    assert(lb(3L), "fully padded frame must quarantine")
  }

  test("pair curation: either-side duplication clusters transitively; gate and keep-best per cluster") {
    import spark.implicits._
    // five pairs (ids 50-54, clear of the %41/%43 plant residues):
    //   50 = (img0, capA)   51 = (img0, capS)   -> shared image
    //   52 = (imgX, capS)                       -> shared caption with 51
    //   53 = (imgY, capB)                       -> clean singleton
    //   54 = (imgLB, capC)                      -> letterboxed image (48
    //        content chars in the >=4-row frame: 3 trailing pad rows)
    // so {50, 51, 52} must close TRANSITIVELY (50 never shares anything
    // with 52 directly) while 53 and 54 stay singletons
    val img0 = ("the very same image payload scraped twice " * 5).take(192)
    val imgX = ("a completely different first photograph!! " * 5).take(192)
    val imgY = ("yet another unrelated picture of a thing " * 5).take(192)
    val imgLB = "tiny real content then the scrape truncated?".padTo(48, '.')
    val docs = Seq(
      (100L, img0), (101L, "a perfectly fine caption about one thing"),
      (102L, img0), (103L, "one boilerplate caption reused everywhere"),
      (104L, imgX), (105L, "one boilerplate caption reused everywhere"),
      (106L, imgY), (107L, "an unremarkable but healthy description"),
      (108L, imgLB), (109L, "caption of the broken scrape")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("pcfix-").toString
    docs.coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val out = Multimodal.pairCuration(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4),
        r.getBoolean(5), r.getLong(6), r.getBoolean(7)))).toMap
    assert(out.keySet == Set(50L, 51L, 52L, 53L, 54L))
    // transitive closure: one cluster rooted at the min pair id
    Seq(50L, 51L, 52L).foreach { p =>
      assert(out(p)._1 == 50L, s"pair $p not in the transitive cluster") }
    assert(out(53L)._1 == 53L && out(54L)._1 == 54L,
      "independent pairs must stay singleton clusters")
    // the image gate: only the truncated scrape fails
    assert(Seq(50L, 51L, 52L, 53L).forall(out(_)._2), "full image gated out")
    assert(!out(54L)._2 && !out(54L)._5 && out(54L)._4 == -1L,
      "letterboxed image must fail the gate, keep nothing, have no keeper")
    // keep-best: exactly one kept pair in the dup cluster — the highest
    // caption-classifier score among its gate-passing members (recomputed
    // here through the same inference core), ties to the smaller pair id
    val scores = graft.operators.TextAnalysis.classifyFrame(
        Multimodal.pairFixture(spark, tmp)
          .select(col("pair_id").as("doc_id"), col("cap_text").as("text")))
      .collect().map(r => r.getLong(0) -> (
        r.getDouble(2), r.getBoolean(3))).toMap
    val gatedCluster = Seq(50L, 51L, 52L).filter(p => out(p)._2 && scores(p)._2)
    assert(gatedCluster.nonEmpty, "no gated member in the cluster — vacuous")
    val expectKeeper = gatedCluster.minBy(p => (-scores(p)._1, p))
    Seq(50L, 51L, 52L).foreach { p =>
      assert(out(p)._4 == expectKeeper, s"pair $p keeper diverged") }
    assert(out.count { case (p, v) => v._1 == 50L && v._5 } ==
      (if (gatedCluster.isEmpty) 0 else 1), "cluster must keep exactly one")
    assert(out(expectKeeper)._5, "the keeper itself must be marked kept")
  }

  test("shard manifest covers the corpus exactly and bounds hash skew") {
    val m = TextAnalysis.shardManifest(spark, dir).cache()
    try {
      val total = Tables.documents(spark, dir).count()
      assert(m.agg(sum("n_docs")).head.getLong(0) == total,
        "every document lands in exactly one shard")
      assert(m.filter(col("shard") < 0 || col("shard") >= 64).count() == 0)
      val counts = m.select("n_docs").collect().map(_.getLong(0))
      // uniform hash at 500 docs / 64 shards: no empty shard, no shard
      // over 4x the mean (measured spread 2..15 around mean 7.8)
      assert(counts.forall(c => c >= 1 && c <= 4 * total / 64),
        s"shard skew out of bounds: min ${counts.min} max ${counts.max}")
      // first/last really belong to their shard under the same salted fold
      m.select("shard", "first_doc", "last_doc").collect().foreach { r =>
        Seq(r.getLong(1), r.getLong(2)).foreach { id =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(s"graft-shard:$id".getBytes("UTF-8"))
          val fold = java.lang.Long.parseLong(
            md.map("%02x".format(_)).mkString.substring(0, 15), 16)
          assert(fold % 64 == r.getLong(0),
            s"doc $id listed in shard ${r.getLong(0)} but hashes to ${fold % 64}")
        }
      }
    } finally m.unpersist()
  }
}
