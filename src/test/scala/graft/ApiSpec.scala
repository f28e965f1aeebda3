package graft

import org.apache.spark.sql.functions._

/** Facade smoke: every [[Graft]] group is drivable end-to-end through the
  * public surface (deep semantics live in each operator's own spec — this
  * gate pins the facade's signatures and delegation, so an operator
  * refactor that breaks the public API fails HERE, not in a user's build).
  */
class ApiSpec extends SparkSuite {
  import spark.implicits._

  private def docs = graft.core.Tables.documents(spark, sf("0.001"))
  private def embs = graft.core.Tables.embeddings(spark, sf("0.001"))

  test("dedup group: pairs -> components -> survivors") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    val comp = Graft.dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == comp(2L) && comp(2L) == comp(3L))
    assert(comp(10L) == comp(11L) && comp(1L) != comp(10L))
    assert(Graft.dedup.jaccardPairs(docs, 0.5).columns.nonEmpty)
  }

  test("sim group: exact top-k pairs through the facade") {
    val top = Graft.sim.topKPairs(embs, k = 5).collect()
    assert(top.length == 5)
  }

  test("text group: cleanse projects clean_text; BPE trains and encodes") {
    val cleansed = Graft.text.cleanse(docs)
    assert(cleansed.columns.contains("clean_text"))
    val merges = Graft.text.bpeTrain(Graft.text.wordDict(docs), numMerges = 5)
    assert(merges.size == 5)
    val enc = Graft.text.bpeEncode(docs, merges)
    assert(enc.agg(min(col("bpe_tokens"))).head().getInt(0) > 0)
  }

  test("joins group: as-of and salted joins through the facade") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "lt", "lv")
    val right = Seq((1L, 9L, "v1"), (1L, 15L, "v2"), (2L, 7L, "v3"))
      .toDF("rk", "rt", "rv")
    val asOf = Graft.joins.asOf(left, right, Seq("k"), Seq("rk"), "lt", "rt")
      .select("lv", "rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // p1@10 -> v1@9; p2@20 -> v2@15; p3@5 -> no view before it
    assert(asOf("p1") == "v1" && asOf("p2") == "v2" && asOf("p3") == null)
    val big = Seq((1L, 100.0), (1L, 50.0), (2L, 10.0)).toDF("bk", "v")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("dk", "name")
    val salted = Graft.joins.salted(big, dim, "bk", "dk", salt = 4)
      .groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == Map("x" -> 2L, "y" -> 1L))
  }

  test("stats group: histogram global rank matches a window row_number") {
    val df = graft.core.Tables.orders(spark, sf("0.001"))
      .select("o_orderkey", "o_totalprice")
    val ranked = Graft.stats.withGlobalRank(df, "o_totalprice", Seq("o_orderkey"))
      .select("o_orderkey", "rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.orderBy("o_totalprice", "o_orderkey")
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    assert(ranked == want)
  }

  test("graph group: pageRank conserves mass on a symmetric triangle") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val ranks = Graft.graph.pageRank(edges, iters = 5).collect()
      .map(_.getDouble(1))
    assert(math.abs(ranks.sum - 1.0) < 1e-12)
  }

  test("text group: canonicalUrl collapses crawl variants") {
    import spark.implicits._
    val urls = Seq(
      "HTTP://Site.COM:80/a/b/?b=2&a=1#frag",
      "http://site.com/a/b?a=1&b=2").toDF("u")
      .select(Graft.text.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0))
    assert(urls.distinct.length == 1 &&
      urls.head == "http://site.com/a/b?a=1&b=2", urls.mkString(" | "))
  }

  test("joins group: bloom-prefiltered join equals the plain join") {
    val fact = graft.core.Tables.lineitem(spark, sf("0.001"))
      .select("l_orderkey", "l_quantity")
    val dim = graft.core.Tables.orders(spark, sf("0.001"))
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val pre = Graft.joins.bloomPrefiltered(fact, dim,
      "l_orderkey", "o_orderkey", expectedItems = 10000L)
    assert(pre.count() ==
      fact.join(dim, col("l_orderkey") === col("o_orderkey")).count())
  }

  test("sim group: top component through the facade is unit-norm") {
    val tc = Graft.sim.topComponent(
      graft.core.Tables.embeddings(spark, sf("0.001")), iters = 4)
    assert(math.abs(tc.vector.map(x => x * x).sum - 1.0) < 1e-9)
    assert(tc.rayleigh.length == 4)
  }

  test("graph group: hierarchy flatten + ancestors through the facade") {
    // supplier-fixture forest shape: roots k<3, parent = k div 3
    val nodes = spark.range(27).selectExpr(
      "id AS v", "CASE WHEN id < 3 THEN id ELSE id DIV 3 END AS parent")
    val flat = Graft.graph.flatten(nodes).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(flat(26L) == ((2L, 2L))) // 26 -> 8 -> 2 (root), depth 2
    assert(flat(1L) == ((1L, 0L)))
    val anc = Graft.graph.ancestors(nodes)
    // Σdepth over the 27-node forest: nodes 3..8 depth1, 9..26 depth2
    assert(anc.count() == 6 * 1 + 18 * 2)
  }

  test("time group: LTTB keeps endpoints and honors the bucket budget") {
    val series = spark.range(100).selectExpr(
      "'s1' AS k", "id * 1000000 AS x",
      "CAST(id % 17 AS DOUBLE) AS y", "id AS tie")
    val out = Graft.time.lttb(series, "k", "x", "y", "tie", buckets = 10)
      .collect()
    assert(out.length <= 10 && out.length >= 3)
    val xs = out.map(_.getLong(out.head.fieldIndex("x"))).sorted
    assert(xs.head == 0L && xs.last == 99L * 1000000)
  }

  test("stats group: exact KS and AUC numerators on hand-checked samples") {
    // A={1,2} vs B={3,4}: F1−F2 peaks at v=2 (2/2 − 0/2) → num = 2·2 = 4
    val ks = Graft.stats.ksNumerator(
      Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 0L), ("g", 4L, 0L))
        .toDF("grp", "v", "isa"), "grp", "v", "isa").head()
    assert(ks.getLong(1) == 2L && ks.getLong(2) == 2L && ks.getLong(3) == 4L)
    // pos {2,3} vs neg {1,2}: wins 2>1, 3>1, 3>2 plus the 2=2 half-tie
    // → U = 3½, x2 = 7, den = 2·2·2 = 8 (AUC 7/8)
    val auc = Graft.stats.aucExact(
      Seq((2L, 1L), (3L, 1L), (1L, 0L), (2L, 0L)).toDF("v", "pos"),
      "v", "pos").head()
    assert(auc.getLong(2) == 7L && auc.getLong(3) == 8L)
  }

  test("stats group: basket pairs counts co-occurrence with ordered ties") {
    val baskets = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (2L, "a")).toDF("bk", "it")
    val top = Graft.stats.basketPairs(baskets, "bk", "it", 10).collect()
    assert(top.head.getString(0) == "a" && top.head.getString(1) == "b" &&
      top.head.getLong(2) == 2L)
    assert(top.length == 3) // (a,b)=2, then (a,c)=1 < (b,c)=1
  }

  test("quality group: one-pass audit reports zero and nonzero rules") {
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 2.0)).toDF("k", "v")
    val got = Graft.quality.audit(df, Seq(
        "k_null" -> col("k").isNull, "v_negative" -> (col("v") < 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("k_null") == (3L, 0L) && got("v_negative") == (3L, 1L))
  }

  test("joins group: fuzzy block pairs stay inside the block") {
    val df = Seq((1, 10L, "abc"), (1, 11L, "abd"), (1, 12L, "zzz"),
      (2, 20L, "abc")).toDF("blk", "k", "s")
    val pairs = Graft.joins.fuzzyPairs(df, "blk", "k", "s", maxDist = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    // only (10,11) qualifies: same block, dist 1; "abc"⨯"abc" across
    // blocks 1/2 must NOT pair
    assert(pairs.toSeq == Seq((10L, 11L, 1)))
  }

  test("privacy group: group sizes and diversity on a hand-checked table") {
    // QI (nat): A×3 rows {seg x,x,y}, B×1 row {seg z}
    val df = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "z"))
      .toDF("nat", "seg")
    val k = Graft.privacy.groupSizes(df, Seq("nat"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(k == Map("A" -> 3L, "B" -> 1L))
    val l = Graft.privacy.groupDiversity(df, Seq("nat"), "seg")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // B is k=1 AND l=1: unique and attribute-disclosing
    assert(l == Map("A" -> (3L, 2L), "B" -> (1L, 1L)))
  }

  test("time group: CUSUM peaks at the level shift, exact integers") {
    // series 1,1,1,5,5,5: n=6, T=18, cum=1,2,3,8,13,18; cusum =
    // 6·cum − 18·i = −12,−24,−36,−24,−12,0 → the single peak |−36| is
    // i=3, the last pre-shift row
    val s = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 5L), (5L, 5L), (6L, 5L))
      .toDF("t", "x")
    val got = Graft.time.cusum(s, "t", "x")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got.map(_._2) == Seq(-12L, -24L, -36L, -24L, -12L, 0L))
    assert(got.filter(_._3 == 1L).map(_._1) == Seq(3L))
  }

  test("text group: novelty share credits the first owner only") {
    // doc1 {a,b}, doc2 {b,c}: doc1 novel 2/2, doc2 novel 1/2 (c only)
    val pairs = Seq((1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"))
      .toDF("doc", "it")
    val got = Graft.text.noveltyShare(pairs, "doc", "it")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(1L -> (2L, 2L), 2L -> (2L, 1L)))
  }

  test("maintain group: compact reduces the file count, keeps every row") {
    val in = graft.core.Scratch.dir("api_frag")
    val out = graft.core.Scratch.dir("api_compact")
    val o = graft.core.Tables.orders(spark, sf("0.001"))
    o.repartition(16).write.mode("overwrite").parquet(in)
    val st = Graft.maintain.compact(spark, in, out, targetFiles = Some(2))
    assert(st.filesAfter == 2 && st.rows == o.count())
  }

  test("stats group: two-proportion z² pieces on a hand-checked sample") {
    // arm 1: 4 units / 3 converted; arm 0: 6 units / 2 converted.
    // d = 3·6 − 2·4 = 10, N = 10, X = 5 →
    // z²_num = 100·10 = 1000, z²_den = 4·6·5·5 = 600
    val units = (Seq.fill(3)((1, 1)) ++ Seq((1, 0)) ++
      Seq.fill(2)((0, 1)) ++ Seq.fill(4)((0, 0))).toDF("variant", "conv")
    val r = Graft.stats.twoProportion(units, "variant", "conv").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 3L, 6L, 2L)))
    assert((r.getLong(4), r.getLong(5)) == ((1000L, 600L)))
    assert(r.getDouble(6) == 1000.0 / 600.0)
  }

  test("stats group: Theil-Sen selects the positional median slope") {
    // slopes of the 6 pairs: 2, 1/2, 1, -1, 1/2, 2 → sorted rationals
    // -1, 1/2, 1/2, 1, 2, 2; lower median (k=3) = 1/2
    val series = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L)).toDF("x", "y")
    val r = Graft.stats.theilSen(series, "x", "y").head()
    assert(r.getLong(0) == 6L, "n_pairs")
    assert((r.getLong(1), r.getLong(2)) == ((1L, 2L)), "median slope 1/2")
    assert(r.getDouble(3) == 0.5)
  }

  test("stats group: Kendall tau-b on a hand-checked frame") {
    // (1,1),(2,2),(3,1): C=1, D=1, one tie-on-y pair → tau_num 0,
    // den_x_x2 = 6 (x all distinct), den_y_x2 = 6 − 2 = 4
    val df = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 1L))
      .toDF("g", "x", "y")
    val r = Graft.stats.kendallTau(df, "g", "x", "y").head()
    assert((r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((3L, 0L, 6L, 4L)))
  }

  test("stats group: CUPED theta and adjustment on an exact-linear " +
    "sample") {
    // y = 3x exactly ⇒ θ = 3.000000 and BOTH adjusted means collapse to
    // 3·x̄ (the whole arm difference was covariate imbalance)
    val units = Seq((0L, 10L, 30L), (0L, 30L, 90L), (1L, 20L, 60L),
      (1L, 60L, 180L)).toDF("arm", "x", "y")
    val rows = Graft.stats.cuped(units, "arm", "x", "y")
      .orderBy("arm").collect()
    assert(rows.map(_.getLong(4)).toSeq == Seq(3000000L, 3000000L))
    val xbar = (10 + 30 + 20 + 60) / 4.0
    rows.foreach(r => assert(r.getDouble(6) == 3.0 * xbar,
      s"adjusted mean must be 3·x̄: $r"))
  }

  test("stats group: confusion report on a hand-checked sample") {
    // 3 TP, 1 FP, 2 FN, 4 TN → precision 3/4, recall 3/5,
    // F1 = 6/(6+1+2) = 2/3, mcc_num = 3·4 − 1·2 = 10
    val df = (Seq.fill(3)((1L, 1L)) ++ Seq((1L, 0L)) ++
      Seq.fill(2)((0L, 1L)) ++ Seq.fill(4)((0L, 0L))).toDF("p", "a")
    val r = Graft.stats.confusion(df, "p", "a").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 1L, 2L, 4L)))
    assert(r.getDouble(4) == 0.75 && r.getDouble(5) == 0.6 &&
      r.getDouble(6) == 6.0 / 9.0 && r.getLong(7) == 10L)
  }

  test("stats group: association rules direction asymmetry") {
    // A in both baskets, B in one → conf(B→A) = 1, conf(A→B) = 1/2
    val b = Seq((1L, "A"), (1L, "B"), (2L, "A")).toDF("k", "it")
    val got = Graft.stats.basketRules(b, "k", "it", 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(got == Map(("B", "A") -> 1.0, ("A", "B") -> 0.5))
  }

  test("sketch group: hll, cms, kmv and bloom through the facade") {
    val keys = (1L to 500L).map(k => (k, 1L)).toDF("k", "one")
    // HLL: ≤64 registers, estimate within the small-m noise envelope
    val regs = Graft.sketch.hllRegisters(keys, "k")
    assert(regs.count() <= 64)
    val est = Graft.sketch.hllEstimate(regs)
    assert(est > 250 && est < 1000, s"hll estimate $est for 500 keys")
    // duplicates change nothing: max absorbs repeated hashes
    val dup = keys.union(keys)
    assert(Graft.sketch.hllRegisters(dup, "k").collect().toSet ==
      regs.collect().toSet)
    // CMS: lookup of a 30× heavy hitter never undercounts
    val rows = ((1L to 200L) ++ Seq.fill(30)(7L)).map(k => Tuple1(k))
      .toDF("k")
    val counters = Graft.sketch.cmsCounters(rows, "k")
    val got = Graft.sketch.cmsLookup(counters,
      Seq(Tuple1(7L)).toDF("k"), "k").head()
    assert(got.getLong(1) >= 31L, s"cms estimate ${got.getLong(1)}")
    // KMV: below k the estimate is EXACT
    val small = (1L to 40L).map(Tuple1(_)).toDF("k")
    assert(Graft.sketch.kmvEstimate(Graft.sketch.kmv(small, "k")) == 40.0)
    // Bloom: every member is claimed (never false-negative)
    val bits = Graft.sketch.bloomBits(small, "k")
    val claimed = Graft.sketch.bloomProbe(bits, keys, "k").collect()
      .map(_.getLong(0)).toSet
    assert((1L to 40L).forall(claimed.contains), "bloom false negative")
  }

  test("sketch group: streaming-mergeable forms (bucketed KMV, bloom " +
    "hits) through the facade") {
    val keys = (1L to 500L).map(Tuple1(_)).toDF("k")
    val kb = Graft.sketch.kmvBuckets(keys, "k")
    assert(kb.count() <= 64)
    val est = Graft.sketch.kmvBucketsEstimate(kb)
    assert(est > 125 && est < 2000, s"bucketed-KMV estimate $est for 500")
    // duplicates change nothing: min absorbs repeated hashes
    assert(Graft.sketch.kmvBuckets(keys.union(keys), "k").collect().toSet ==
      kb.collect().toSet)
    // bloomHits carries the SAME bit set as bloomBits
    val hits = Graft.sketch.bloomHits(keys, "k")
    assert(hits.select("bit").collect().map(_.getLong(0)).toSet ==
      Graft.sketch.bloomBits(keys, "k").collect().map(_.getLong(0)).toSet)
  }

  test("privacy group: clipped counts + seeded release through the facade") {
    val df = ((1L to 20L).map(u => ("a", u)) ++ Seq.fill(15)(("a", 99L)) ++
      (1L to 3L).map(u => ("b", u))).toDF("g", "u")
    val clipped = Graft.privacy.clippedCounts(df, "g", "u", cap = 8L)
    val got = clipped.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((28L, 35L, 21L, 7L))) // 20×1 + min(15,8); loss 7
    assert(got("b") == ((3L, 3L, 3L, 0L)))
    val r1 = Graft.privacy.release(clipped, "g", 1.0, "s").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val r2 = Graft.privacy.release(clipped, "g", 1.0, "s").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(r1 == r2, "seeded release must be deterministic")
  }

  test("table group: manifest-table lifecycle through the facade") {
    val dir = java.nio.file.Files.createTempDirectory("api_mtable").toString
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Graft.table.create(spark, dir, a, statsCols = Seq("k"))
    Graft.table.append(spark, dir, Seq((3L, "c")).toDF("k", "v"))
    Graft.table.merge(spark, dir,
      Seq((2L, "B", "U"), (1L, "", "D")).toDF("k", "v", "_op"),
      "k", opCol = Some("_op"))
    assert(Graft.table.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set(2L -> "B", 3L -> "c"))
    assert(Graft.table.readVersion(spark, dir, 0L).count() == 2L)
    assert(Graft.table.history(spark, dir).map(_.operation) ==
      Seq("create", "append", "merge"))
    // session additions: AS OF wall clock, provenance, clone, drop,
    // layout evolution — each through the facade
    val h = Graft.table.history(spark, dir)
    assert(Graft.table.readAsOf(spark, dir, h(1).ts).count() == 3L)
    assert(Graft.table.readWithMeta(spark, dir)
      .schema.fieldNames.contains("_commit_version"))
    val cl = java.nio.file.Files.createTempDirectory("api_mclone").toString + "/t"
    Graft.table.cloneTable(spark, dir, cl)
    assert(Graft.table.read(spark, cl).count() ==
      Graft.table.read(spark, dir).count())
    // merge-on-read family through the facade: vector delete, vector
    // update, purge — content checked after each
    Graft.table.deleteVector(spark, cl, col("k") === 3L)
    assert(Graft.table.read(spark, cl).count() == 1L)
    Graft.table.updateVector(spark, cl, col("k") === 2L,
      Map("v" -> lit("UPD")))
    assert(Graft.table.read(spark, cl).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set(2L -> "UPD"))
    assert(Graft.table.purgeVectors(spark, cl).dvs.isEmpty)
    assert(Graft.table.read(spark, cl).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set(2L -> "UPD"))
    Graft.table.dropColumn(spark, cl, "v")
    assert(Graft.table.read(spark, cl).schema.fieldNames.toSeq == Seq("k"))
    assert(Graft.table.alterLayout(spark, cl,
      statsCols = Some(Seq("k"))).version >= 0L)
    assert(Graft.table.vacuum(spark, dir, keepLast = 1) > 0L)
  }
}
