package graft

import org.apache.spark.sql.functions._

/** Semantic gates for the insight family (InsightQueries) beyond the
  * DuckDB hash-parity the driver checks: each query's result must satisfy
  * the mathematical invariants of the operation it claims to implement,
  * verified against independently-computed ground truth at sf0.001.
  */
class InsightSpec extends SparkSuite {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf("0.001"))

  test("interval coverage equals brute-force day-set union per supplier") {
    // Ground truth by a method the query never uses: explode every
    // interval into its covered days and count distinct days per
    // supplier. Islands count: distinct days minus interior adjacencies.
    val li = graft.core.Tables.lineitem(spark, sf("0.001"))
      .select(col("l_suppkey"), to_date(col("l_shipdate")).as("s"),
        date_add(to_date(col("l_shipdate")), col("l_quantity").cast("int")).as("e"))
    // day d is covered iff some interval has s <= d < e  (span semantics:
    // an island [min_s, max_e) contributes max_e - min_s days)
    val truth = li
      .select(col("l_suppkey"),
        explode(sequence(col("s"), date_sub(col("e"), 1))).as("day"))
      .distinct()
      .groupBy("l_suppkey").agg(count(lit(1)).as("truth_days"))
    val got = q("q_interval_coverage")
    val joined = got.join(truth, "l_suppkey")
      .where(col("covered_days") =!= col("truth_days"))
    assert(joined.count() === 0,
      s"coverage mismatch: ${joined.collect().mkString(", ")}")
    // islands partition coverage: each island is ≥1 day, so
    // n_islands <= covered_days, and both are positive
    assert(got.where(col("n_islands") > col("covered_days") ||
      col("n_islands") < 1).count() === 0)
  }

  test("transition matrix counts sum to |events| - |active users|") {
    // Every user with k events contributes exactly k-1 transitions.
    val ev = graft.core.Tables.events(spark, sf("0.001"))
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val t = q("q_event_transitions")
    val total = t.agg(sum("cnt")).head.getLong(0)
    assert(total === nEvents - nUsers)
    // per-source probabilities sum to 1 exactly-enough (each prob is an
    // exact-ratio double; the sum re-associates, hence the tolerance)
    val probs = t.groupBy("from_type").agg(sum("prob").as("p"))
      .where(abs(col("p") - 1.0) > 1e-12)
    assert(probs.count() === 0)
  }

  test("hash sample is reproducible and rate lands near 3.7%") {
    val a = q("q_sample_hash").agg(sum("n_sampled")).head.getLong(0)
    val b = q("q_sample_hash").agg(sum("n_sampled")).head.getLong(0)
    assert(a === b, "deterministic sampling must be run-stable")
    val n = graft.core.Tables.orders(spark, sf("0.001")).count()
    val rate = a.toDouble / n
    assert(rate > 0.015 && rate < 0.06, s"rate $rate implausible for 37/1000")
  }

  test("attribution partitions every purchase into exactly one channel") {
    val att = q("q_event_attribution")
    val purchases = graft.core.Tables.events(spark, sf("0.001"))
      .where(col("event_type") === "purchase").count()
    assert(att.agg(sum("n_purchases")).head.getLong(0) === purchases)
    // channels are source event types (or none) — never 'purchase'
    assert(att.where(col("channel") === "purchase").count() === 0)
  }

  test("top-5 share is in (0,1] and top5 <= total with equality iff n_cust <= 5") {
    val r = q("q_agg_topn_share").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_cust")
      val top5 = row.getAs[Double]("top5_rev")
      val total = row.getAs[Double]("total_rev")
      val share = row.getAs[Double]("top5_share")
      assert(share > 0.0 && share <= 1.0)
      assert(top5 <= total)
      if (n <= 5) assert(share === 1.0, s"n_cust=$n must mean full share")
      else assert(top5 < total)
    }
  }

  test("lift equals the distinct-self-join definition (no-self-join plan)") {
    // Ground truth by the textbook self-join the production plan avoids.
    val ut = graft.core.Tables.events(spark, sf("0.001"))
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type")).distinct()
    val truth = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.day") === col("b.day") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("truth_ab"))
    val got = q("q_event_lift")
    assert(got.count() > 0)
    assert(got.join(truth, Seq("ta", "tb"), "full_outer")
      .where(col("n_ab").isNull || col("truth_ab").isNull ||
        col("n_ab") =!= col("truth_ab")).count() === 0)
    // lift is a proper association measure: positive, and bounded by
    // nu / max(n_a, n_b) — here just sanity-bound it
    assert(q("q_event_lift").where(col("lift") <= 0).count() === 0)
  }

  test("time-to-next matches a brute-force forward scan per purchase") {
    val ev = graft.core.Tables.events(spark, sf("0.001"))
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(r => (r._2.toString, r._3))
    }
    var matched = 0L; var purchases = 0L
    byUser.values.foreach { rows =>
      rows.zipWithIndex.foreach { case (r, i) =>
        if (r._4 == "purchase") {
          purchases += 1
          if (rows.drop(i + 1).exists(_._4 == "view")) matched += 1
        }
      }
    }
    val got = q("q_time_to_next")
      .agg(sum("n_purchases"), sum("n_matched")).head
    assert(got.getLong(0) === purchases)
    assert(got.getLong(1) === matched)
  }

  test("scan metadata accounts for every row and every file on disk") {
    val got = q("cap_scan_metadata").collect()
    val total = graft.core.Tables.lineitem(spark, sf("0.001")).count()
    assert(got.map(_.getAs[Long]("n_rows")).sum === total)
    // the fixture is a single parquet file; _metadata must name it and
    // report its exact on-disk byte size
    val f = new java.io.File(sf("0.001") + "/lineitem.parquet")
    assert(got.map(_.getAs[String]("file_name")).toSet === Set(f.getName))
    assert(got.map(_.getAs[Long]("file_size")).toSet === Set(f.length()))
  }

  test("rolling 7-day distinct equals per-day brute-force recount") {
    val ev = graft.core.Tables.events(spark, sf("0.001"))
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate,
        r.getString(2)))
    val spine = ev.map(_._2).distinct
    val purch = ev.filter(_._3 == "purchase").map(r => (r._1, r._2)).distinct
    val want = spine.map { d =>
      d -> purch.filter { case (_, pd) =>
        !pd.isAfter(d) && pd.plusDays(6).compareTo(d) >= 0
      }.map(_._1).distinct.length.toLong
    }.toMap
    val got = q("q_time_rolling_distinct").collect()
      .map(r => r.getAs[java.time.LocalDateTime]("day").toLocalDate ->
        r.getAs[Long]("u7")).toMap
    assert(got === want)
  }

  test("gini matches the O(n^2) mean-absolute-difference definition") {
    // independent ground truth: G = sum |xi - xj| / (2 n^2 mu), exact in
    // BigDecimal, compared within a few ulps of the engine's positional
    // form (same value, different association order)
    val rev = graft.core.Tables.orders(spark, sf("0.001"))
      .join(graft.core.Tables.customer(spark, sf("0.001")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey", "c_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("r"))
      .collect().map(r => (r.getInt(0), r.getDecimal(2)))
    val byNation = rev.groupBy(_._1)
    val want = byNation.map { case (nk, rows) =>
      val xs = rows.map(_._2.doubleValue())
      val n = xs.length
      val sumAbs = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      nk -> sumAbs / (2.0 * n * xs.sum)
    }
    q("q_agg_gini").collect().foreach { r =>
      val nk = r.getInt(0); val g = r.getAs[Double]("gini")
      assert(math.abs(g - want(nk)) < 1e-9, s"nation $nk: $g vs ${want(nk)}")
      assert(g >= 0.0 && g < 1.0)
    }
  }

  test("LTTB picks exactly the fixed-anchor reference points") {
    val B = 32
    val ev = graft.core.Tables.events(spark, sf("0.001"))
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // driver-side reference: same bucket math, exact-sum anchors, same
    // IEEE area expression, same tie-break
    val want = ev.groupBy(_._1).flatMap { case (k, rowsU) =>
      val rows = rowsU.sortBy(r => (r._2, r._4))
      val n = rows.length
      def bucket(rn: Int): Long =
        if (rn == 1) 0L else if (rn == n) (B - 1).toLong
        else 1L + (rn - 2).toLong * (B - 2) / math.max(n - 2, 1)
      val byB = rows.zipWithIndex
        .map { case (r, i) => (bucket(i + 1), r) }.groupBy(_._1)
      val anchors = byB.map { case (b, rs) =>
        val xs = rs.map(_._2._2)
        val ys = rs.map(r => BigDecimal(r._2._3).setScale(4))
        b -> (xs.map(BigDecimal(_)).sum.toDouble / xs.length,
          ys.sum.toDouble / xs.length)
      }
      // neighbors are the ADJACENT NON-EMPTY buckets (lag/lead over the
      // bucket-ordered anchor frame skips empties), mirroring the engine
      val sortedB = byB.toSeq.sortBy(_._1)
      sortedB.zipWithIndex.map { case ((b, rs), idx) =>
        val prev = if (idx > 0) Some(anchors(sortedB(idx - 1)._1)) else None
        val next = if (idx < sortedB.length - 1)
          Some(anchors(sortedB(idx + 1)._1)) else None
        val scored = rs.map(_._2).map { r =>
          val a = (prev, next) match {
            case (Some((px, py)), Some((nx, ny))) =>
              math.abs((px - nx) * (r._3 - py) - (px - r._2.toDouble) * (ny - py))
            case _ => 0.0
          }
          (a, r)
        }
        val best = scored.minBy { case (a, r) => (-a, r._2, r._4) }._2
        (k, b, best._2, best._3)
      }
    }.toSet
    val got = q("cap_time_lttb").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === want)
    // invariants: endpoints survive; one point per non-empty bucket
    ev.groupBy(_._1).foreach { case (k, rowsU) =>
      val rows = rowsU.sortBy(r => (r._2, r._4))
      val mine = got.filter(_._1 == k).toSeq.sortBy(_._2)
      assert(mine.head._3 === rows.head._2, "first point must survive")
      assert(mine.last._3 === rows.last._2, "last point must survive")
      assert(mine.map(_._2).distinct.length === mine.length)
    }
  }

  test("session paths match a driver-side sessionize-and-slide recount") {
    val ev = graft.core.Tables.events(spark, sf("0.001"))
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getString(3)))
    val gapUs = 43200000000L
    def us(t: java.time.LocalDateTime) =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    val trigrams = ev.groupBy(_._1).toSeq.flatMap { case (_, rowsU) =>
      val rows = rowsU.sortBy(r => (us(r._2), r._3))
      // split into sessions at >12h gaps, then slide a 3-window
      val sessions = rows.foldLeft(List.empty[List[(Long, java.time.LocalDateTime, Long, String)]]) {
        case (acc, r) => acc match {
          case cur :: rest if us(r._2) - us(cur.head._2) <= gapUs =>
            (r :: cur) :: rest
          case _ => List(r) :: acc
        }
      }.map(_.reverse)
      sessions.flatMap(s => s.map(_._4).sliding(3).filter(_.length == 3))
    }
    val counts = trigrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val want = counts.toSeq
      .sortBy { case (k, n) => (-n, k(0), k(1), k(2)) }.take(10)
      .map { case (k, n) => (k(0), k(1), k(2), n.toLong) }.toSet
    val got = q("q_event_paths").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got === want)
  }

  test("pareto k80 is the true minimal prefix and is consistent with gini") {
    val rows = q("q_agg_pareto").collect()
    val rev = graft.core.Tables.orders(spark, sf("0.001"))
      .join(graft.core.Tables.customer(spark, sf("0.001")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey", "c_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("r"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDecimal(2)))
      .groupBy(_._1)
    rows.foreach { row =>
      val nk = row.getInt(0); val k80 = row.getAs[Long]("k80")
      val xs = rev(nk).sortBy(r => (r._3.negate(), r._2)).map(_._3)
      val tot = xs.reduce(_.add(_))
      def covered(k: Int) = xs.take(k).reduce(_.add(_))
        .multiply(java.math.BigDecimal.valueOf(5))
        .compareTo(tot.multiply(java.math.BigDecimal.valueOf(4))) >= 0
      assert(covered(k80.toInt), s"nation $nk: k80=$k80 must cover 80%")
      assert(k80 == 1 || !covered(k80.toInt - 1),
        s"nation $nk: k80=$k80 must be minimal")
    }
  }

  test("sliding median equals a driver-side trailing-window recount") {
    val ev = graft.core.Tables.events(spark, sf("0.001"))
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getDouble(3)))
    val want = ev.groupBy(_._1).flatMap { case (u, rowsU) =>
      val rows = rowsU.sortBy(r => (r._2.toString, r._3))
      rows.indices.map { i =>
        val win = rows.slice(math.max(0, i - 6), i + 1).map(_._4).sorted
        (u, rows(i)._3, win((win.length + 1) / 2 - 1))
      }
    }.toSet
    val got = q("q_window_median_sliding").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("med7"))).toSet
    assert(got === want)
  }

  test("anomaly flags exactly the hours above 2x mean rate") {
    val h = graft.core.Tables.events(spark, sf("0.001"))
      .groupBy(expr("CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ)").as("b"))
      .agg(count(lit(1)).as("c")).collect()
    val total = h.map(_.getAs[Long]("c")).sum
    val nh = h.length.toLong
    val want = h.filter(r => r.getAs[Long]("c") * nh > 2 * total)
      .map(_.getAs[java.time.LocalDateTime]("b")).toSet
    val got = q("q_time_anomaly").collect()
      .map(_.getAs[java.time.LocalDateTime]("bucket")).toSet
    assert(got === want)
  }
}
