package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** Round-11 statistics tier: plain-Scala parity (a third implementation
  * beyond the DuckDB oracle) for the experiment-analysis chi-square
  * (q_ab_test) and the information-gain feature ranking (q_info_gain).
  * Both queries' whole contract is exact integer statistics + one
  * mirrored double step, so parity here is bit-for-bit.
  */
class StatsSpec extends SparkSpec {

  private def r0(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("q_ab_test: cells, rates, and chi-square match a plain-Scala 2x2") {
    val ev = Tables.table(spark, sf0001, "events")
      .selectExpr("(ts div 1000) div 86400000000 AS day",
        "user_id % 2 = 1 AS treat", "event_type = 'click' AS click")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    val expected = ev.groupBy(_._1).flatMap { case (day, es) =>
      val a = es.count(e => e._2 && e._3).toLong
      val b = es.count(e => e._2 && !e._3).toLong
      val c = es.count(e => !e._2 && e._3).toLong
      val d = es.count(e => !e._2 && !e._3).toLong
      if (a + b > 0 && c + d > 0 && a + c > 0 && b + d > 0) {
        val adbc = BigInt(a) * d - BigInt(b) * c
        val num = BigInt(a + b + c + d) * adbc * adbc
        val den = BigInt(a + b) * (c + d) * (a + c) * (b + d)
        Some(day -> ((a + b, c + d,
          r0(1000000d * a / (a + b)),
          r0(1000000d * c / (c + d)),
          r0(1000000 * num.toDouble / den.toDouble))))
      } else None
    }
    val got = SparkEntry.queries("q_ab_test")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val day = r.getAs[Long]("day")
      val (nt, nc, pt, pc, chi2) = expected(day)
      assert(r.getAs[Long]("n_treat") == nt)
      assert(r.getAs[Long]("n_ctrl") == nc)
      assert(r.getAs[Long]("p_treat_ppm") == pt, s"day $day treat rate")
      assert(r.getAs[Long]("p_ctrl_ppm") == pc, s"day $day ctrl rate")
      assert(r.getAs[Long]("chi2_micro") == chi2, s"day $day chi2")
    }
  }

  test("q_anomaly: trailing z-scores match a plain-Scala sliding window") {
    val ev = Tables.table(spark, sf0001, "events")
      .selectExpr("event_type", "(ts div 1000) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counts = ev.groupBy(identity).map { case ((t, d), v) =>
      (t, d, v.length.toLong) }
    val expected = counts.groupBy(_._1).flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(_._2)
      sorted.indices.flatMap { i =>
        val win = sorted.slice(math.max(0, i - 7), i).map(_._3)
        val n = win.length.toLong
        val s = win.sum
        val sxx = win.map(c => c * c).sum
        val rad = n * sxx - s * s
        if (n >= 3 && rad > 0) {
          val (t, d, cnt) = sorted(i)
          val z = r0(1000000 * (n * cnt - s) / math.sqrt(rad.toDouble))
          Some((t, d) -> ((cnt, z, if (math.abs(z) > 3000000) 1L else 0L)))
        } else None
      }
    }
    val got = SparkEntry.queries("q_anomaly")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("day"))
      val (cnt, z, flag) = expected(k)
      assert(r.getAs[Long]("cnt") == cnt, s"$k count")
      assert(r.getAs[Long]("z_micro") == z, s"$k z-score")
      assert(r.getAs[Long]("is_anomaly") == flag, s"$k flag")
    }
  }

  test("q_info_gain: full parity with a plain-Scala entropy computation") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val langs = docs.map(_._2).distinct.sorted
    val dl = docs.groupBy(_._2).map { case (l, d) => l -> d.length.toLong }
    val dTot = docs.length.toLong
    // doc-level presence
    val pres = docs.flatMap { case (id, lang, t) =>
      t.trim.toLowerCase.split("\\s+", -1).distinct.map(w => (w, lang, id))
    }
    val npl = pres.groupBy(p => (p._1, p._2))
      .map { case (k, v) => k -> v.length.toLong }
    val np = pres.groupBy(_._1).map { case (w, v) => w -> v.length.toLong }
    def plogp(n: Long, tot: Long): Long = {
      val x = n.toDouble / tot
      r0(-x * math.log(x) * 1000000)
    }
    val h0 = langs.map(l => plogp(dl(l), dTot)).sum
    val expected = np.map { case (w, nP) =>
      val hp = langs.map(l =>
        npl.get((w, l)).map(plogp(_, nP)).getOrElse(0L)).sum
      val nA = dTot - nP
      val ha = langs.map { l =>
        val na = dl(l) - npl.getOrElse((w, l), 0L)
        if (na > 0 && nA > 0) plogp(na, nA) else 0L
      }.sum
      w -> ((nP, h0 - r0((nP * hp + nA * ha).toDouble / dTot)))
    }
    val got = SparkEntry.queries("q_info_gain")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val w = r.getAs[String]("term")
      val (nP, ig) = expected(w)
      assert(r.getAs[Long]("n_docs") == nP, s"term $w n_docs")
      assert(r.getAs[Long]("ig_micro") == ig, s"term $w info gain")
      // quantized IG stays in the meaningful band: bounded above by the
      // prior entropy (allow 1-unit quantization slack either side)
      assert(r.getAs[Long]("ig_micro") <= h0 + 1)
    }
  }

  test("q_auc: rank-sum AUC matches brute-force pairwise comparison") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def wt(t: String): Long = {
      val hex = "%02x".format(md.digest(t.getBytes("UTF-8")).head).charAt(0)
      if (hex <= '3') -2L else if (hex <= '7') -1L
      else if (hex <= 'b') 1L else 2L
    }
    val ds = docs.map { case (src, lang, text) =>
      (src, lang == "en",
        text.trim.toLowerCase.split("\\s+", -1).map(wt).sum)
    }
    // brute-force pairwise AUC per source in half-units: every
    // (positive, negative) pair contributes 2 for a win, 1 for a tie —
    // the tie-corrected Mann-Whitney definition the rank-sum identity
    // in the query must reproduce exactly
    val expected = ds.groupBy(_._1).flatMap { case (src, es) =>
      val pos = es.filter(_._2).map(_._3)
      val neg = es.filterNot(_._2).map(_._3)
      if (pos.nonEmpty && neg.nonEmpty) {
        val half = (for (p <- pos; q <- neg) yield
          if (p > q) 2L else if (p == q) 1L else 0L).sum
        Some(src -> ((pos.length.toLong, neg.length.toLong,
          r0(1000000d * half /
            (2.0 * pos.length * neg.length)))))
      } else None
    }
    val got = SparkEntry.queries("q_auc")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val (np, nn, auc) = expected(src)
      assert(r.getAs[Long]("n_pos") == np, s"source $src n_pos")
      assert(r.getAs[Long]("n_neg") == nn, s"source $src n_neg")
      assert(r.getAs[Long]("auc_micro") == auc, s"source $src auc")
      assert(r.getAs[Long]("auc_micro") >= 0L &&
        r.getAs[Long]("auc_micro") <= 1000000L)
    }
  }

  test("q_calibration: bins, rates, and score mass match plain Scala") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def wt(t: String): Long = {
      val hex = "%02x".format(md.digest(t.getBytes("UTF-8")).head).charAt(0)
      if (hex <= '3') -2L else if (hex <= '7') -1L
      else if (hex <= 'b') 1L else 2L
    }
    val ds = docs.map { case (lang, text) =>
      (lang == "en", text.trim.toLowerCase.split("\\s+", -1).map(wt).sum)
    }
    val mn = ds.map(_._2).min
    val mx = ds.map(_._2).max
    val expected = ds.groupBy { case (_, s) => (s - mn) * 10 / (mx - mn + 1) }
      .map { case (bin, es) =>
        val n = es.length.toLong
        val np = es.count(_._1).toLong
        bin -> ((n, np, r0(1000000d * np / n), es.map(_._2).sum))
      }
    val got = SparkEntry.queries("q_calibration")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    // conservation: every doc lands in exactly one bin
    assert(got.map(_.getAs[Long]("n")).sum == docs.length.toLong)
    got.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0L && bin <= 9L)
      val (n, np, rate, mass) = expected(bin)
      assert(r.getAs[Long]("n") == n, s"bin $bin n")
      assert(r.getAs[Long]("n_pos") == np, s"bin $bin n_pos")
      assert(r.getAs[Long]("pos_rate_ppm") == rate, s"bin $bin rate")
      assert(r.getAs[Long]("sum_score") == mass, s"bin $bin score mass")
    }
  }

  test("q_ndcg: gains and ratios match a plain-Scala ranking evaluation") {
    // system ranking from q_tfidf_knn (its own parity is pinned in
    // DedupSpec); relevance, discounts, ideal re-ranking, and the
    // final ratio recomputed in plain Scala
    val knn = SparkEntry.queries("q_tfidf_knn")(spark, sf0001)
      .select("doc_id", "nbr_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val texts = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def shingles(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+", -1)
      val c = math.max(toks.length - 2, 1)
      (0 until c).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
    }
    val sh = texts.map { case (id, t) => id -> shingles(t) }
    def rel(a: Long, b: Long): Long = {
      val (sa, sb) = (sh(a), sh(b))
      val inter = sa.intersect(sb).size.toLong
      inter * 1000000L / (sa.size + sb.size - inter)
    }
    val expected = knn.groupBy(_._1).toSeq.flatMap { case (doc, es) =>
      val rels = es.toSeq.map { case (_, nbr, rnk) =>
        (nbr, rnk, rel(doc, nbr)) }
      val ideal = rels.sortBy(e => (-e._3, e._1)).zipWithIndex
        .map { case ((nbr, _, _), i) => nbr -> (i + 1) }.toMap
      val dcg = rels.map { case (_, rnk, r) =>
        r0(r.toDouble / math.log(rnk + 1d)) }.sum
      val idcg = rels.map { case (nbr, _, r) =>
        r0(r.toDouble / math.log(ideal(nbr) + 1d)) }.sum
      if (idcg > 0)
        Some(doc -> ((es.length.toLong, dcg, idcg,
          r0(1000000d * dcg / idcg))))
      else None
    }.toMap
    val got = SparkEntry.queries("q_ndcg")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val (n, dcg, idcg, ndcg) = expected(doc)
      assert(r.getAs[Long]("n_nbrs") == n, s"doc $doc n_nbrs")
      assert(r.getAs[Long]("dcg_micro") == dcg, s"doc $doc dcg")
      assert(r.getAs[Long]("idcg_micro") == idcg, s"doc $doc idcg")
      assert(r.getAs[Long]("ndcg_ppm") == ndcg, s"doc $doc ndcg")
    }
  }

  test("q_ks_test: sup-CDF-gap statistic matches plain Scala exactly") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("lang", "n_chars", "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .filter(d => d._3 == "src0" || d._3 == "src1")
    val expected = docs.groupBy(_._1).flatMap { case (lang, ds) =>
      val byV = ds.groupBy(_._2).map { case (v, es) =>
        (v, es.count(_._3 == "src0").toLong,
          es.count(_._3 == "src1").toLong)
      }.toSeq.sortBy(_._1)
      val ta = byV.map(_._2).sum
      val tb = byV.map(_._3).sum
      if (ta > 0 && tb > 0) {
        // exact cumulative cross-products over the merged value support
        val gaps = byV.scanLeft((0L, 0L, 0L, BigInt(0))) {
          case ((_, ca, cb, _), (v, a, b)) =>
            (v, ca + a, cb + b,
              (BigInt(ca + a) * tb - BigInt(cb + b) * ta).abs)
        }.tail
        val dmax = gaps.map(_._4).max
        Some(lang -> ((ta, tb,
          r0(1000000d * dmax.toDouble / (ta.toDouble * tb.toDouble)),
          gaps.filter(_._4 == dmax).map(_._1).min)))
      } else None
    }
    val got = SparkEntry.queries("q_ks_test")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val lang = r.getAs[String]("lang")
      val (na, nb, ks, at) = expected(lang)
      assert(r.getAs[Long]("n_a") == na, s"lang $lang n_a")
      assert(r.getAs[Long]("n_b") == nb, s"lang $lang n_b")
      assert(r.getAs[Long]("ks_ppm") == ks, s"lang $lang ks")
      assert(r.getAs[Long]("ks_at") == at, s"lang $lang argmax value")
      assert(r.getAs[Long]("ks_ppm") >= 0L &&
        r.getAs[Long]("ks_ppm") <= 1000000L)
    }
  }

  test("q_assoc_rules: support/confidence/lift match plain-Scala baskets") {
    val ue = Tables.table(spark, sf0001, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val nu = ue.map(_._1).distinct.length.toLong
    val it = ue.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val expected = ue.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val items = es.map(_._2).distinct.sorted
      for (i <- items.indices; j <- (i + 1) until items.length)
        yield (items(i), items(j))
    }.groupBy(identity).collect {
      case ((a, b), v) if v.length >= 5 =>
        val nb = v.length.toLong
        (a, b) -> ((nb, it(a), it(b), nb * 1000000L / nu,
          nb * 1000000L / it(a),
          r0(1000000d * (nu.toDouble * nb.toDouble)
            / (it(a).toDouble * it(b).toDouble))))
    }
    val got = SparkEntry.queries("q_assoc_rules")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[String]("a"), r.getAs[String]("b"))
      val (nb, na, nbb, sup, conf, lift) = expected(k)
      assert(r.getAs[Long]("n_both") == nb, s"$k n_both")
      assert(r.getAs[Long]("n_a") == na, s"$k n_a")
      assert(r.getAs[Long]("n_b") == nbb, s"$k n_b")
      assert(r.getAs[Long]("support_ppm") == sup, s"$k support")
      assert(r.getAs[Long]("conf_ppm") == conf, s"$k confidence")
      assert(r.getAs[Long]("lift_ppm") == lift, s"$k lift")
      // antecedent ordering is canonical and self-pairs are impossible
      assert(k._1 < k._2, s"$k pair order")
    }
  }

  test("q_freq_spectrum: spectrum and Good-Turing shift match plain Scala") {
    val texts = Tables.table(spark, sf0001, "documents")
      .select("text").collect().map(_.getString(0))
    val tf = texts.flatMap(_.trim.toLowerCase.split("\\s+", -1))
      .groupBy(identity).map { case (_, v) => v.length.toLong }
    val spec = tf.groupBy(identity)
      .map { case (r, v) => r -> v.size.toLong }
    val expected = spec.map { case (r, n) =>
      r -> ((n, spec.get(r + 1)
        .map(nx => 1000000L * (r + 1) * nx / n).getOrElse(0L)))
    }
    val got = SparkEntry.queries("q_freq_spectrum")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    // conservation: the spectrum partitions the vocabulary
    assert(got.map(_.getAs[Long]("n_terms")).sum == tf.size.toLong)
    got.foreach { r =>
      val (n, gt) = expected(r.getAs[Long]("r"))
      assert(r.getAs[Long]("n_terms") == n, s"r=${r.getAs[Long]("r")}")
      assert(r.getAs[Long]("gt_rstar_micro") == gt,
        s"r=${r.getAs[Long]("r")} Good-Turing estimate")
    }
  }

  test("q_kappa: confusion cells and kappa match a plain-Scala 2x2") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def wt(t: String): Long = {
      val hex = "%02x".format(md.digest(t.getBytes("UTF-8")).head).charAt(0)
      if (hex <= '3') -2L else if (hex <= '7') -1L
      else if (hex <= 'b') 1L else 2L
    }
    val expected = docs.map { case (src, lang, text) =>
      (src, lang == "en",
        text.trim.toLowerCase.split("\\s+", -1).map(wt).sum >= 0)
    }.groupBy(_._1).flatMap { case (src, es) =>
      val a = es.count(e => e._3 && e._2).toLong
      val b = es.count(e => e._3 && !e._2).toLong
      val c = es.count(e => !e._3 && e._2).toLong
      val d = es.count(e => !e._3 && !e._2).toLong
      val n = a + b + c + d
      val pe = (a + b) * (a + c) + (c + d) * (b + d)
      if (n * n - pe > 0)
        Some(src -> ((n, a + d, (a + d) * 1000000L / n,
          r0(1000000d * (n * (a + d) - pe) / (n * n - pe)))))
      else None
    }
    val got = SparkEntry.queries("q_kappa")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val (n, agree, po, kappa) = expected(src)
      assert(r.getAs[Long]("n") == n, s"source $src n")
      assert(r.getAs[Long]("n_agree") == agree, s"source $src agree")
      assert(r.getAs[Long]("po_ppm") == po, s"source $src po")
      assert(r.getAs[Long]("kappa_micro") == kappa, s"source $src kappa")
      // kappa is bounded: [-1, 1] in micro units
      assert(math.abs(r.getAs[Long]("kappa_micro")) <= 1000000L)
    }
  }

  test("q_survival: KM table matches a plain-Scala product-limit estimator") {
    val ev = Tables.table(spark, sf0001, "events")
      .selectExpr("user_id", "(ts div 1000) div 86400000000 AS d",
        "(ts div 1000) div 3600000000 AS h", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val subjects = ev.groupBy(e => (e._1, e._2)).values.map { es =>
      val f = es.map(_._3).min
      val l = es.map(_._3).max
      val p = es.filter(_._4 == "purchase").map(_._3)
        .reduceOption(_ min _)
      p match {
        case Some(ph) => (ph - f, true)
        case None => (l - f, false)
      }
    }.toSeq
    val byT = subjects.groupBy(_._1).map { case (t, ss) =>
      (t, ss.size.toLong, ss.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    var h = 0L
    var dead = false
    val expected = byT.flatMap { case (t, nTot, dT) =>
      val nRisk = byT.filter(_._1 >= t).map(_._2).sum
      if (dT > 0 && nRisk > dT)
        h += r0(1000000 * math.log(nRisk.toDouble / (nRisk - dT)))
      if (dT > 0 && nRisk == dT) dead = true
      if (dT > 0)
        Some(t -> ((nRisk, dT, nTot - dT, h,
          if (dead) 0L else r0(1000000 * math.exp(-h / 1000000.0)))))
      else None
    }.toMap
    val got = SparkEntry.queries("q_survival")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val t = r.getAs[Long]("t")
      val (nr, ne, nc, hm, sp) = expected(t)
      assert(r.getAs[Long]("n_risk") == nr, s"t=$t n_risk")
      assert(r.getAs[Long]("n_event") == ne, s"t=$t n_event")
      assert(r.getAs[Long]("n_censored") == nc, s"t=$t n_censored")
      assert(r.getAs[Long]("h_micro") == hm, s"t=$t hazard")
      assert(r.getAs[Long]("s_ppm") == sp, s"t=$t survival")
    }
    // survival is monotone non-increasing in t
    val byTime = got.sortBy(_.getAs[Long]("t"))
      .map(_.getAs[Long]("s_ppm")).toSeq
    byTime.zip(byTime.drop(1)).foreach { case (a, b) =>
      assert(a >= b, "survival must not increase")
    }
  }

  test("q_benford: digit counts and deviations match plain Scala") {
    val prices = Tables.table(spark, sf0001, "orders")
      .select("o_totalprice").collect().map(_.getDouble(0))
      .filter(_ > 0)
    val digits = prices.map(p => r0(p * 100)).filter(_ > 0)
      .map(_.toString.head.asDigit.toLong)
    val tot = digits.length.toLong
    val expected = digits.groupBy(identity).map { case (d, v) =>
      val n = v.length.toLong
      val ep = r0(1000000 * math.log10(1.0 + 1.0 / d))
      d -> ((n, n * 1000000L / tot, ep, n * 1000000L / tot - ep))
    }
    val got = SparkEntry.queries("q_benford")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    // conservation: every priced order contributes exactly one digit
    assert(got.map(_.getAs[Long]("n")).sum == tot)
    got.foreach { r =>
      val d = r.getAs[Long]("digit")
      val (n, op, ep, dev) = expected(d)
      assert(d >= 1L && d <= 9L)
      assert(r.getAs[Long]("n") == n, s"digit $d n")
      assert(r.getAs[Long]("obs_ppm") == op, s"digit $d observed")
      assert(r.getAs[Long]("exp_ppm") == ep, s"digit $d expected")
      assert(r.getAs[Long]("dev_ppm") == dev, s"digit $d deviation")
    }
  }

  test("q_pagerank: integer power iteration matches plain Scala") {
    // the edge set from q_knn_graph (its own parity is pinned in
    // DedupSpec); the 5-round integer recurrence replayed in Scala
    val edges = SparkEntry.queries("q_knn_graph")(spark, sf0001)
      .select("doc_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.length.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => pr(e._1) / deg(e._1)).sum
      }
      pr = nodes.map(n =>
        n -> (150000L + 850000L * in.getOrElse(n, 0L) / 1000000L)).toMap
    }
    val got = SparkEntry.queries("q_pagerank")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == nodes.length)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("pr_micro") == pr(id), s"doc $id rank")
      assert(r.getAs[Long]("n_out") == deg.getOrElse(id, 0L),
        s"doc $id outdegree")
    }
  }

  test("q_gini: concentration index matches plain Scala") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).trim.toLowerCase.split("\\s+", -1).length.toLong))
    val expected = docs.groupBy(_._1).flatMap { case (src, ds) =>
      val xs = ds.sortBy(d => (d._3, d._2)).map(_._3)
      val n = xs.length.toLong
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      if (sx > 0)
        Some(src -> ((n, sx,
          r0(1000000d * (2 * six - (n + 1) * sx) / (n * sx)))))
      else None
    }
    val got = SparkEntry.queries("q_gini")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val (n, sx, gini) = expected(src)
      assert(r.getAs[Long]("n_docs") == n, s"source $src n")
      assert(r.getAs[Long]("total_tokens") == sx, s"source $src tokens")
      assert(r.getAs[Long]("gini_ppm") == gini, s"source $src gini")
      // Gini over non-negative sizes is bounded to [0, 1)
      assert(gini >= 0L && gini < 1000000L)
    }
  }

  test("q_js_div: pairwise divergences match plain Scala; JS laws hold") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val stc = docs.flatMap { case (src, t) =>
      t.trim.toLowerCase.split("\\s+", -1).map(w => (src, w))
    }.groupBy(identity).map { case ((s, w), v) => (s, w, v.length.toLong) }
    val vocab = stc.groupBy(_._2).map { case (w, v) => (w, v.map(_._3).sum) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(500).map(_._1).toSet
    val stv = stc.filter(e => vocab(e._2))
      .map(e => (e._1, e._2) -> e._3).toMap
    val tot = stv.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val srcs = docs.map(_._1).distinct.sorted
    def j(c1: Long, t1: Long, c2: Long, t2: Long): Long =
      if (c1 > 0) r0(1e9 * (c1.toDouble / t1.toDouble) *
        math.log((2 * c1 * t2).toDouble / (c1 * t2 + c2 * t1).toDouble))
      else 0L
    val expected = (for {
      sa <- srcs; sb <- srcs
      if sa < sb && tot.getOrElse(sa, 0L) > 0 && tot.getOrElse(sb, 0L) > 0
    } yield {
      val (ta, tb) = (tot(sa), tot(sb))
      val s = vocab.toSeq.map { w =>
        val ca = stv.getOrElse((sa, w), 0L)
        val cb = stv.getOrElse((sb, w), 0L)
        j(ca, ta, cb, tb) + j(cb, tb, ca, ta)
      }.sum
      (sa, sb) -> s
    }).toMap
    val got = SparkEntry.queries("q_js_div")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(r.getAs[Long]("js2_nano") == expected(k), s"pair $k")
      // 2*JS is bounded by 2*ln(2) (plus nano-quantization slack)
      assert(r.getAs[Long]("js2_nano") <= 1386294362L, s"pair $k bound")
    }
  }

  test("q_seasonality: day-of-week indices match plain Scala") {
    val ev = Tables.table(spark, sf0001, "events")
      .selectExpr("event_type", "(ts div 1000) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val daily = ev.groupBy(identity).map { case ((t, d), v) =>
      (t, d, v.length.toLong) }
    val expected = daily.groupBy(_._1).flatMap { case (t, ds) =>
      val nd = ds.size.toLong
      val sAll = ds.map(_._3).sum
      ds.groupBy(_._2 % 7).map { case (dow, es) =>
        val n = es.size.toLong
        val s = es.map(_._3).sum
        (t, dow) -> ((n, s,
          r0(1000000d * (s.toDouble * nd.toDouble) /
            (n.toDouble * sAll.toDouble))))
      }
    }
    val got = SparkEntry.queries("q_seasonality")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("dow"))
      val (n, s, idx) = expected(k)
      assert(r.getAs[Long]("n_days") == n, s"$k n_days")
      assert(r.getAs[Long]("sum_cnt") == s, s"$k sum")
      assert(r.getAs[Long]("idx_ppm") == idx, s"$k index")
    }
  }

  private def dailyCounts(): Map[(String, Long), Long] =
    Tables.table(spark, sf0001, "events")
      .selectExpr("event_type", "(ts div 1000) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("q_cusum: closed-form excursions equal the recursive CUSUM") {
    val daily = dailyCounts()
    val expected = daily.keys.map(_._1).toSeq.distinct.flatMap { t =>
      val xs = daily.filter(_._1._1 == t).toSeq
        .map { case ((_, d), x) => (d, x) }.sortBy(_._1)
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum
      // the textbook RECURSIVE form — the query's window identity
      // S+ = P - runningMin(P) must reproduce it exactly
      var (pf, pos, neg) = (0L, 0L, 0L)
      xs.map { case (d, x) =>
        val dev = n * x - sx
        pf += dev
        pos = math.max(0L, pos + dev)
        neg = math.max(0L, neg - dev)
        (t, d) -> ((x, pf, pos, neg))
      }
    }.toMap
    val got = SparkEntry.queries("q_cusum")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("day"))
      val (x, pf, pos, neg) = expected(k)
      assert(r.getAs[Long]("x") == x, s"$k count")
      assert(r.getAs[Long]("pf") == pf, s"$k prefix")
      assert(r.getAs[Long]("cusum_pos") == pos, s"$k positive excursion")
      assert(r.getAs[Long]("cusum_neg") == neg, s"$k negative excursion")
    }
  }

  test("q_trend_mk: S statistic matches brute-force pair enumeration") {
    val daily = dailyCounts()
    val expected = daily.keys.map(_._1).toSeq.distinct.flatMap { t =>
      val xs = daily.filter(_._1._1 == t).toSeq
        .map { case ((_, d), x) => (d, x) }.sortBy(_._1)
      val n = xs.length.toLong
      if (n > 1) {
        val s = (for (i <- xs.indices; j <- (i + 1) until xs.length)
          yield java.lang.Long.signum(xs(j)._2 - xs(i)._2).toLong).sum
        Some(t -> ((n, s, r0(1000000d * 2 * s / (n * (n - 1))))))
      } else None
    }.toMap
    val got = SparkEntry.queries("q_trend_mk")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (n, s, tau) = expected(t)
      assert(r.getAs[Long]("n_days") == n, s"$t n_days")
      assert(r.getAs[Long]("s_stat") == s, s"$t S")
      assert(r.getAs[Long]("tau_ppm") == tau, s"$t tau")
      assert(math.abs(tau) <= 1000000L, s"$t tau bound")
    }
  }

  test("q_xcorr: lagged Pearson matches plain-Scala exact moments") {
    val daily = dailyCounts()
    val types = daily.keys.map(_._1).toSeq.distinct
    val expected = (for {
      a <- types; b <- types if a != b; lag <- 0L to 3L
    } yield {
      val pairs = daily.filter(_._1._1 == a).toSeq.flatMap {
        case ((_, d), xa) => daily.get((b, d + lag)).map(xb => (xa, xb))
      }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum
      val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      if (n >= 3 && vx > 0 && vy > 0)
        Some((a, b, lag) -> ((n,
          r0(1000000d * (n * sxy - sx * sy) /
            (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))))))
      else None
    }).flatten.toMap
    val got = SparkEntry.queries("q_xcorr")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[String]("lead_type"), r.getAs[String]("lag_type"),
        r.getAs[Long]("lag"))
      val (n, rm) = expected(k)
      assert(r.getAs[Long]("n") == n, s"$k n")
      assert(r.getAs[Long]("r_micro") == rm, s"$k r")
      assert(math.abs(rm) <= 1000000L, s"$k r bound")
    }
  }

  private def orderedEvents(): Map[Long, Seq[(Long, Long, String)]] =
    Tables.table(spark, sf0001, "events")
      .selectExpr("user_id", "ts div 1000 AS tsu", "event_id",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).map { case (u, es) =>
        u -> es.toSeq.map(e => (e._2, e._3, e._4)).sortBy(e => (e._1, e._2))
      }

  test("q_event_paths: trigram counts and the cut match plain Scala") {
    val paths = orderedEvents().values.flatMap { es =>
      es.sliding(3).filter(_.length == 3)
        .map(w => (w(0)._3, w(1)._3, w(2)._3))
    }.toSeq
    val counts = paths.groupBy(identity)
      .map { case (p, v) => (p, v.length.toLong) }
    val expected = counts.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    val got = SparkEntry.queries("q_event_paths")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.length)
    got.foreach { r =>
      val k = (r.getAs[String]("e1"), r.getAs[String]("e2"),
        r.getAs[String]("e3"))
      assert(counts(k) == r.getAs[Long]("n_paths"), s"path $k")
      assert(expected.map(_._1).contains(k), s"path $k not in the cut")
    }
  }

  test("q_dwell: rank-selected latency quantiles match plain Scala") {
    val gaps = orderedEvents().values.flatMap { es =>
      es.zip(es.drop(1)).map { case ((t0, _, f), (t1, _, t)) =>
        ((f, t), t1 - t0)
      }
    }.toSeq
    val expected = gaps.groupBy(_._1).map { case (k, v) =>
      val xs = v.map(_._2).sorted
      val n = xs.length
      k -> ((n.toLong, xs((n + 1) / 2 - 1), xs((9 * n + 9) / 10 - 1)))
    }
    val got = SparkEntry.queries("q_dwell")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[String]("from_type"), r.getAs[String]("to_type"))
      val (n, med, p90) = expected(k)
      assert(r.getAs[Long]("n_gaps") == n, s"$k n")
      assert(r.getAs[Long]("median_us") == med, s"$k median")
      assert(r.getAs[Long]("p90_us") == p90, s"$k p90")
      assert(med <= p90, s"$k quantile order")
    }
  }

  test("q_zipf_slope: normal equations over quantized lns match plain Scala") {
    val tf = Tables.table(spark, sf0001, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+", -1))
      .groupBy(identity).map { case (t, v) => (t, v.length.toLong) }
    val top = tf.toSeq.sortBy { case (t, c) => (-c, t) }.take(1000)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (r0(1000000 * math.log((i + 1).toDouble)),
        r0(1000000 * math.log(c.toDouble)))
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val num = BigInt(n) * sxy - BigInt(sx) * sy
    val den = BigInt(n) * sxx - BigInt(sx) * sx
    val slope = num.toDouble / den.toDouble
    val got = SparkEntry.queries("q_zipf_slope")(spark, sf0001).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_ranks") == n)
    assert(r.getAs[Long]("slope_micro") == r0(1000000 * slope), "slope")
    assert(r.getAs[Long]("intercept_micro") ==
      r0((sy - slope * sx) / n), "intercept")
    // a natural-language corpus is near-Zipfian: slope strictly
    // negative and in a sane band
    assert(r.getAs[Long]("slope_micro") < 0L)
    assert(r.getAs[Long]("slope_micro") > -3000000L)
  }

  test("q_rfm: tercile scores match plain-Scala rank selection") {
    val ev = Tables.table(spark, sf0001, "events")
      .selectExpr("user_id", "(ts div 1000) div 86400000000 AS d",
        "CAST(round(value * 1000) AS BIGINT) AS vm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cust = Tables.table(spark, sf0001, "customer")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val nat = Tables.table(spark, sf0001, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val prof = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.map(_._2).max, es.length.toLong, es.map(_._3).sum)
    }.toSeq
    val anchor = prof.map(_._2).max
    val byNation = prof.flatMap { case (u, last, f, m) =>
      cust.get(u).map(nk => (nat(nk), u, anchor - last, f, m))
    }.groupBy(_._1)
    def terc(rn: Long, n: Long): Long = (rn - 1) * 3 / n + 1
    val expected = byNation.toSeq.flatMap { case (nation, us) =>
      val n = us.length.toLong
      def ranks(key: ((String, Long, Long, Long, Long)) => Long)
          : Map[Long, Long] =
        us.sortBy(e => (key(e), e._2)).zipWithIndex
          .map { case (e, i) => e._2 -> (i + 1).toLong }.toMap
      val (rr, rf, rm) = (ranks(_._3), ranks(_._4), ranks(_._5))
      us.map { e =>
        (nation, 4 - terc(rr(e._2), n), terc(rf(e._2), n),
          terc(rm(e._2), n))
      }
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = SparkEntry.queries("q_rfm")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    // conservation: every joined user lands in exactly one segment
    assert(got.map(_.getAs[Long]("n_users")).sum ==
      byNation.values.map(_.length.toLong).sum)
    got.foreach { r =>
      val k = (r.getAs[String]("n_name"), r.getAs[Long]("r_score"),
        r.getAs[Long]("f_score"), r.getAs[Long]("m_score"))
      assert(expected(k) == r.getAs[Long]("n_users"), s"segment $k")
      assert(Seq(k._2, k._3, k._4).forall(s => s >= 1L && s <= 3L))
    }
  }

  test("q_user_entropy: banded entropy profile matches plain Scala") {
    val ev = Tables.table(spark, sf0001, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = ev.groupBy(_._1).toSeq.map { case (_, es) =>
      val counts = es.groupBy(_._2).map(_._2.length.toLong)
      val n = counts.sum
      val h = counts.map { c =>
        val p = c.toDouble / n
        r0(-1000000 * p * math.log(p))
      }.sum
      (h / 50000, counts.size.toLong, h)
    }.groupBy(_._1).map { case (band, us) =>
      band -> ((us.length.toLong, us.map(_._2).sum, us.map(_._3).sum))
    }
    val got = SparkEntry.queries("q_user_entropy")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val band = r.getAs[Long]("band")
      val (nu, st, sh) = expected(band)
      assert(r.getAs[Long]("n_users") == nu, s"band $band users")
      assert(r.getAs[Long]("sum_types") == st, s"band $band types")
      assert(r.getAs[Long]("sum_h_micro") == sh, s"band $band entropy")
      // entropy is bounded by ln(#types): band < ln(5)/0.05 + slack
      assert(band >= 0L && band <= 33L)
    }
  }

  test("q_welch: t and Welch-Satterthwaite df match plain-Scala moments") {
    val ev = Tables.table(spark, sf0001, "events")
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) % 2 == 1,
        r0(r.getDouble(2) * 1000)))
    val expected = ev.groupBy(_._1).flatMap { case (t, es) =>
      val (tr, ct) = es.partition(_._2)
      val (n1, n0) = (tr.length.toLong, ct.length.toLong)
      if (n1 > 1 && n0 > 1) {
        def mom(xs: Array[(String, Boolean, Long)]) =
          (xs.map(_._3).sum, xs.map(e => e._3 * e._3).sum)
        val (s1, q1) = mom(tr); val (s0, q0) = mom(ct)
        val a1 = (n1.toDouble * q1 - s1.toDouble * s1) /
          (n1.toDouble * (n1 - 1) * n1)
        val a0 = (n0.toDouble * q0 - s0.toDouble * s0) /
          (n0.toDouble * (n0 - 1) * n0)
        if (a1 + a0 > 0) {
          val dm = s1.toDouble / n1 - s0.toDouble / n0
          Some(t -> ((n1, n0, r0(1000000 * dm),
            r0(1000000 * dm / math.sqrt(a1 + a0)),
            r0(1000000 * (a1 + a0) * (a1 + a0) /
              (a1 * a1 / (n1 - 1) + a0 * a0 / (n0 - 1))))))
        } else None
      } else None
    }
    val got = SparkEntry.queries("q_welch")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (n1, n0, dm, tm, df) = expected(t)
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n0") == n0)
      assert(r.getAs[Long]("dmean_nano") == dm, s"$t mean diff")
      assert(r.getAs[Long]("t_micro") == tm, s"$t t statistic")
      assert(r.getAs[Long]("df_micro") == df, s"$t degrees of freedom")
      // Welch df is bounded by the pooled df
      assert(df <= 1000000L * (n1 + n0 - 2) && df > 0L, s"$t df bound")
    }
  }

  test("q_spearman: tie-doubled ranks match plain Scala; rho in [-1,1]") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("source", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).trim.toLowerCase.split("\\s+").length.toLong))
    val expected = docs.groupBy(_._1).flatMap { case (src, ds) =>
      // 2·(tie-averaged rank) = 2·|{v' < v}| + |{v' = v}| + 1
      def dblRanks(vs: Array[Long]): Array[Long] =
        vs.map(v => 2L * vs.count(_ < v) + vs.count(_ == v) + 1)
      val rx = dblRanks(ds.map(_._2)); val ry = dblRanks(ds.map(_._3))
      val n = ds.length.toLong
      val (sx, sy) = (rx.sum, ry.sum)
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      val sxx = rx.map(a => a * a).sum; val syy = ry.map(a => a * a).sum
      val vx = n.toDouble * sxx - sx.toDouble * sx
      val vy = n.toDouble * syy - sy.toDouble * sy
      if (vx > 0 && vy > 0)
        Some(src -> ((n, r0(1000000 *
          (n.toDouble * sxy - sx.toDouble * sy) /
          (math.sqrt(vx) * math.sqrt(vy))))))
      else None
    }
    val got = SparkEntry.queries("q_spearman")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val (n, rho) = expected(src)
      assert(r.getAs[Long]("n") == n, s"$src n")
      assert(r.getAs[Long]("spearman_micro") == rho, s"$src rho")
      assert(math.abs(rho) <= 1000000L, s"$src rho bound")
    }
  }

  test("q_pca_power / q_pca_project: power iteration matches plain Scala") {
    val rows = Tables.table(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val n = rows.length
    val d = rows.head._2.length
    val xq = rows.map { case (id, v) => (id, v.map(x => r0(x * 10000))) }
    // Long '/' truncates toward zero — the Spark `div` / DuckDB `//`
    // semantics the chain is built on
    val m = Array.tabulate(d)(i => xq.map(_._2(i)).sum / n)
    val cent = xq.map { case (id, v) =>
      (id, Array.tabulate(d)(i => v(i) - m(i))) }
    val cov = Array.tabulate(d, d)((i, j) =>
      cent.map { case (_, c) => c(i) * c(j) }.sum / n)
    var v = Array.fill(d)(1000000L)
    for (_ <- 1 to 5) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val g = w.map(math.abs).max
      assert(g > 0, "degenerate covariance on live data")
      v = w.map(x => (BigInt(x) * 1000000 / g).toLong)
    }
    val gotV = SparkEntry.queries("q_pca_power")(spark, sf0001).collect()
    assert(gotV.length == d)
    gotV.foreach { r =>
      assert(r.getAs[Long]("v_unit") ==
        v(r.getAs[Long]("dim").toInt - 1), s"dim ${r.getAs[Long]("dim")}")
    }
    // each round renormalizes so the max-magnitude coordinate attains
    // exactly ±1e6
    assert(gotV.map(r => math.abs(r.getAs[Long]("v_unit"))).max ==
      1000000L)
    val projs = cent.map { case (id, c) =>
      id -> (0 until d).map(i => c(i) * v(i)).sum }.toMap
    val gotP = SparkEntry.queries("q_pca_project")(spark, sf0001)
      .collect()
    assert(gotP.length == n)
    gotP.foreach { r =>
      assert(r.getAs[Long]("proj") == projs(r.getAs[Long]("vec_id")),
        s"vec ${r.getAs[Long]("vec_id")}")
    }
  }

  test("q_kmeans: three Lloyd rounds match a plain-Scala iteration") {
    val rows = Tables.table(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray
        .map(x => r0(x * 10000))))
    val k = 8
    var cent: Map[Long, Array[Long]] =
      rows.filter(_._1 < k).map { case (id, v) => id -> v }.toMap
    def assign(c: Map[Long, Array[Long]]) = rows.map { case (id, v) =>
      val (d, cid) = c.toSeq.map { case (cid, m) =>
        (v.zip(m).map { case (x, mm) =>
          (x - mm) * (x - mm) }.sum, cid)
      }.min // (dist asc, cid asc) — the struct-ordering tie-break
      (id, cid, d, v)
    }
    for (_ <- 1 to 3) {
      val a = assign(cent)
      val upd = a.groupBy(_._2).map { case (cid, vs) =>
        val n = vs.length
        cid -> Array.tabulate(vs.head._4.length)(i =>
          vs.map(_._4(i)).sum / n) // truncating mean
      }
      cent = cent.map { case (cid, old) =>
        cid -> upd.getOrElse(cid, old) }
    }
    val expected = assign(cent).map { case (id, cid, d, _) =>
      id -> ((cid, d)) }.toMap
    val got = SparkEntry.queries("q_kmeans")(spark, sf0001).collect()
    assert(got.length == rows.length)
    // every centroid id stays in [0, k)
    assert(got.forall(r => r.getAs[Long]("cid") >= 0 &&
      r.getAs[Long]("cid") < k))
    got.foreach { r =>
      val (cid, d) = expected(r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("cid") == cid,
        s"vec ${r.getAs[Long]("vec_id")} assignment")
      assert(r.getAs[Long]("dist2") == d,
        s"vec ${r.getAs[Long]("vec_id")} distance")
    }
  }

  test("q_lift: decile gains and lift match a plain-Scala ranking") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "source", "lang", "text").collect()
      .map { r =>
        val score = r.getString(3).trim.toLowerCase.split("\\s+")
          .map { t =>
            val h = java.security.MessageDigest.getInstance("SHA-256")
              .digest(t.getBytes("UTF-8")).take(1)
            val c = "%02x".format(h(0) & 0xff).charAt(0)
            if (c <= '3') -2L else if (c <= '7') -1L
            else if (c <= 'b') 1L else 2L
          }.sum
        (r.getLong(0), r.getString(1),
          if (r.getString(2) == "en") 1L else 0L, score)
      }
    val expected = docs.groupBy(_._2).flatMap { case (src, ds) =>
      val n = ds.length.toLong
      val ranked = ds.sortBy(d => (-d._4, d._1))
      val decs = ranked.zipWithIndex.map { case (d, i) =>
        (i.toLong * 10 / n + 1, d._3) }
      val agg = decs.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (dec, xs) =>
          (dec, xs.length.toLong, xs.map(_._2).sum) }
      val totN = n; val totPos = ds.map(_._3).sum
      var (cumN, cumPos) = (0L, 0L)
      if (totPos > 0) agg.map { case (dec, nd, np) =>
        cumN += nd; cumPos += np
        (src, dec) -> ((nd, np, cumPos,
          r0(1000000.0 * cumPos / totPos),
          r0(1000000 * (cumPos * totN).toDouble /
            (cumN * totPos).toDouble)))
      } else Seq.empty
    }
    val got = SparkEntry.queries("q_lift")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Long]("decile"))
      val (nd, np, cp, gain, lift) = expected(k)
      assert(r.getAs[Long]("n_docs") == nd, s"$k docs")
      assert(r.getAs[Long]("n_pos") == np, s"$k positives")
      assert(r.getAs[Long]("cum_pos") == cp, s"$k cumulative")
      assert(r.getAs[Long]("gain_ppm") == gain, s"$k gain")
      assert(r.getAs[Long]("lift_micro") == lift, s"$k lift")
    }
    // the final decile's gain is exactly 100%
    got.filter(_.getAs[Long]("decile") == 10L)
      .foreach(r => assert(r.getAs[Long]("gain_ppm") == 1000000L))
  }

  test("q_winsorize: rank-selected clamps match a plain-Scala sort") {
    val li = Tables.table(spark, sf0001, "lineitem")
      .selectExpr("l_returnflag", "l_orderkey", "l_linenumber",
        "cast(round(l_extendedprice * 100) as bigint) c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val expected = li.groupBy(_._1).map { case (flag, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2, r._3)).map(_._4)
      val n = sorted.length
      val p05 = sorted(((n - 1) * 5 / 100).toInt)
      val p95 = sorted(((n - 1) * 95 / 100).toInt)
      val clamped = sorted.map(c => math.min(math.max(c, p05), p95))
      flag -> ((n.toLong, p05, p95, clamped.sum,
        sorted.count(c => c < p05 || c > p95).toLong))
    }
    val got = SparkEntry.queries("q_winsorize")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val (n, p05, p95, ws, nc) = expected(flag)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("p05_cents") == p05, s"$flag p05")
      assert(r.getAs[Long]("p95_cents") == p95, s"$flag p95")
      assert(r.getAs[Long]("winsorized_cents") == ws, s"$flag sum")
      assert(r.getAs[Long]("n_clamped") == nc, s"$flag clamped")
      // the clamp must actually bite on live data
      assert(nc > 0L, s"$flag fixture exercises the clamp")
    }
  }

  test("q_bootstrap: deterministic Poisson replicates match plain Scala") {
    val li = Tables.table(spark, sf0001, "lineitem")
      .selectExpr("l_returnflag", "l_orderkey", "l_linenumber",
        "cast(round(l_extendedprice * 100) as bigint) c").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    def weight(ok: Long, ln: Int, b: Int): Long = {
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$ok:$ln".getBytes("UTF-8"))
      val hu = sha(b) & 0xff // hex chars 2b+1..2b+2 = byte b
      if (hu < 94) 0L else if (hu < 188) 1L else if (hu < 235) 2L
      else if (hu < 251) 3L else if (hu < 255) 4L else 5L
    }
    val expected = li.groupBy(_._1).flatMap { case (flag, rows) =>
      val means = (0 until 16).flatMap { b =>
        val ws = rows.map(r => (weight(r._2, r._3, b), r._4))
        val nb = ws.map(_._1).sum
        if (nb > 0)
          Some((r0(1000000.0 * ws.map(w => w._1 * w._2).sum / nb),
            b))
        else None
      }.sorted
      if (rows.nonEmpty) {
        val nrep = means.length
        val lo = means(((nrep - 1) * 10 / 100).toInt)._1
        val hi = means(((nrep - 1) * 90 / 100).toInt)._1
        Some(flag -> ((rows.length.toLong,
          r0(1000000.0 * rows.map(_._4).sum / rows.length),
          nrep.toLong, lo, hi)))
      } else None
    }
    val got = SparkEntry.queries("q_bootstrap")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val (n, mm, nrep, lo, hi) = expected(flag)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("mean_micro") == mm, s"$flag point mean")
      assert(r.getAs[Long]("n_replicates") == nrep, s"$flag replicates")
      assert(r.getAs[Long]("lo_micro") == lo, s"$flag lo")
      assert(r.getAs[Long]("hi_micro") == hi, s"$flag hi")
      assert(lo <= hi, s"$flag band ordering")
      // the band must be non-degenerate on live data (replicates vary)
      assert(lo < hi, s"$flag fixture should spread the replicates")
    }
  }

  test("q_confusion: conservation and diagonal laws hold") {
    val got = SparkEntry.queries("q_confusion")(spark, sf0001).collect()
    val docs = Tables.table(spark, sf0001, "documents").count()
    // every document lands in exactly one confusion cell
    assert(got.map(_.getAs[Long]("n")).sum == docs)
    got.foreach { r =>
      val diag =
        r.getAs[String]("true_lang") == r.getAs[String]("pred_lang")
      assert(r.getAs[Long]("n_correct") ==
        (if (diag) r.getAs[Long]("n") else 0L),
        s"correct counts must sit on the diagonal: $r")
    }
    // the matrix must not be degenerate (some mass off-diagonal —
    // the cheap model genuinely errs on this corpus)
    assert(got.exists(r =>
      r.getAs[String]("true_lang") != r.getAs[String]("pred_lang")))
  }

  test("q_rolling_actives: DAU/WAU match a plain-Scala sliding window") {
    val ev = Tables.table(spark, sf0001, "events")
      .selectExpr("user_id", "(ts div 1000) div 86400000000 AS d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val dau = ev.groupBy(_._2).map { case (d, xs) =>
      d -> xs.map(_._1).distinct.length.toLong }
    val got = SparkEntry.queries("q_rolling_actives")(spark, sf0001)
      .collect()
    assert(got.length == dau.size)
    got.foreach { r =>
      val day = r.getAs[Long]("day")
      val wau = ev.filter(e => e._2 <= day && e._2 >= day - 6)
        .map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau(day), s"day $day DAU")
      assert(r.getAs[Long]("wau") == wau, s"day $day WAU")
      assert(r.getAs[Long]("stickiness_ppm") ==
        r0(1000000.0 * dau(day) / wau), s"day $day stickiness")
      assert(wau >= dau(day), s"day $day WAU dominates DAU")
    }
  }

  test("q_gopher_rules: the rule battery matches plain-Scala regexes") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stopWords =
      Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val expected = docs.map { case (id, text) =>
      val norm = text.trim.toLowerCase
      val nWords = norm.split("\\s+").length.toLong
      val nWchars = norm.replaceAll("\\s+", "").length.toLong
      def cnt(re: String) =
        re.r.findAllMatchIn(text).length.toLong
      val nEll = cnt("\\.\\.\\."); val nHash = cnt("#")
      val nStop = stopWords.count(w =>
        ("\\b" + w + "\\b").r.findFirstIn(text.toLowerCase).isDefined)
      id -> ((nWords, nWchars, nEll, nHash, nStop,
        nWords >= 50 && nWords <= 100000,
        3 * nWords <= nWchars && nWchars <= 10 * nWords,
        nEll * 10 <= nWords * 3, nHash * 10 <= nWords, nStop >= 2))
    }.toMap
    val got = SparkEntry.queries("q_gopher_rules")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    // the corpus must exercise BOTH routes of the overall gate
    assert(got.exists(_.getAs[Boolean]("gopher_pass") !=
      got.head.getAs[Boolean]("gopher_pass")) ||
      got.map(_.getAs[Boolean]("word_ok")).distinct.length == 2)
    got.foreach { r =>
      val (nw, nc, ne, nh, ns, wok, mok, eok, hok, sok) =
        expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_words") == nw)
      assert(r.getAs[Long]("n_wchars") == nc)
      assert(r.getAs[Long]("n_ellipsis") == ne)
      assert(r.getAs[Long]("n_hash") == nh)
      assert(r.getAs[Int]("n_stop") == ns)
      assert(r.getAs[Boolean]("word_ok") == wok)
      assert(r.getAs[Boolean]("mwl_ok") == mok)
      assert(r.getAs[Boolean]("ellipsis_ok") == eok)
      assert(r.getAs[Boolean]("hash_ok") == hok)
      assert(r.getAs[Boolean]("stop_ok") == sok)
      assert(r.getAs[Boolean]("gopher_pass") ==
        (wok && mok && eok && hok && sok))
    }
  }

  test("q_kruskal: H and tie correction match plain-Scala doubled ranks") {
    val ev = Tables.table(spark, sf0001, "events")
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) % 3,
        r0(r.getDouble(2) * 1000)))
    val expected = ev.groupBy(_._1).flatMap { case (t, es) =>
      val xs = es.map(_._3)
      // 2·(tie-averaged rank) = 2·|{v' < v}| + |{v' = v}| + 1
      def s2Of(v: Long) = 2L * xs.count(_ < v) + xs.count(_ == v) + 1
      val byArm = (0L to 2L).map { a =>
        val vs = es.filter(_._2 == a).map(_._3)
        (vs.length.toLong, vs.map(s2Of).sum)
      }
      val nn = xs.length.toLong
      val tsum = xs.map(v => { val t = xs.count(_ == v).toLong
        t * t - 1 }).sum
      val Seq((n0, s20), (n1, s21), (n2, s22)) = byArm
      // conservation law: the doubled rank sums total N(N+1)
      assert(s20 + s21 + s22 == nn * (nn + 1), s"$t rank mass")
      if (n0 > 0 && n1 > 0 && n2 > 0 && tsum < nn * nn * nn - nn) {
        val nD = nn.toDouble
        val h = 3.0 / (nD * (nn + 1)) *
          (s20.toDouble * s20 / n0 + s21.toDouble * s21 / n1 +
            s22.toDouble * s22 / n2) - 3.0 * (nn + 1)
        val c = 1.0 - tsum.toDouble / (nD * nn * nn - nn)
        Some(t -> ((n0, n1, n2, tsum, r0(1000000 * (h / c)))))
      } else None
    }
    val got = SparkEntry.queries("q_kruskal")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (n0, n1, n2, tsum, h) = expected(t)
      assert(r.getAs[Long]("n0") == n0 && r.getAs[Long]("n1") == n1 &&
        r.getAs[Long]("n2") == n2, s"$t arm sizes")
      assert(r.getAs[Long]("tsum") == tsum, s"$t tie term")
      assert(r.getAs[Long]("h_micro") == h, s"$t H statistic")
      // H is nonnegative up to quantization of the tie-corrected form
      assert(h >= -1L, s"$t H sign")
    }
  }

  test("q_t_closeness: dense-grid TVD matches plain-Scala integers") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("lang", "n_chars", "source").collect()
      .map(r => (r.getString(0), r.getLong(1) / 100, r.getString(2)))
    val n = docs.length.toLong
    val global = docs.groupBy(_._3).map { case (s, d) =>
      s -> d.length.toLong }
    val classes = docs.groupBy(d => (d._1, d._2))
    val perClass = classes.map { case ((lang, b), ds) =>
      val nc = ds.length.toLong
      val num = global.map { case (src, gv) =>
        val c = ds.count(_._3 == src).toLong
        math.abs(c * n - gv * nc)
      }.sum
      (lang, nc, (1000000L * num) / (2 * nc * n))
    }
    val expected = perClass.groupBy(_._1).map { case (lang, cs) =>
      lang -> ((cs.size.toLong, cs.map(_._3).max,
        cs.count(_._3 > 250000).toLong,
        cs.filter(_._3 > 250000).map(_._2).sum))
    }
    val got = SparkEntry.queries("q_t_closeness")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val lang = r.getAs[String]("lang")
      val (ncls, maxT, risky, riskyRows) = expected(lang)
      assert(r.getAs[Long]("n_classes") == ncls, s"$lang classes")
      assert(r.getAs[Long]("max_t_ppm") == maxT, s"$lang max TVD")
      assert(r.getAs[Long]("n_risky_classes") == risky, s"$lang risky")
      assert(r.getAs[Long]("n_risky_rows") == riskyRows, s"$lang rows")
      // TVD is a probability distance: ppm in [0, 1e6]
      assert(maxT >= 0L && maxT <= 1000000L, s"$lang TVD bound")
    }
  }

  test("q_label_prop: 3 vote rounds match a plain-Scala propagation") {
    val edges = graft.ops.llm.Dedup
      .knnGraph(Tables.table(spark, sf0001, "documents"),
        "doc_id", "text", k = 5)
      .select("doc_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val nbrs = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lbl: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lbl = nbrs.map { case (v, ns) =>
        val votes = ns.groupBy(lbl).map { case (l, xs) =>
          l -> xs.length }
        val mc = votes.values.max
        v -> votes.filter(_._2 == mc).keys.min
      }
    }
    val sizes = lbl.values.groupBy(identity).map { case (l, xs) =>
      l -> xs.size.toLong }
    val got = SparkEntry.queries("q_label_prop")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == lbl.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("community") == lbl(id), s"doc $id label")
      assert(r.getAs[Long]("community_size") == sizes(lbl(id)),
        s"doc $id community size")
    }
    // LPA refines, never coarsens past, the connected components:
    // every community is inside one component, so there are at least
    // as many communities as components among the covered nodes
    assert(sizes.size >= 1)
  }

  test("q_kneser_ney: probabilities sum to exactly 1 per context") {
    // the whole point of the D=3/4 integer form: Σ_w num(u,w) = den(u)
    // EXACTLY — verified over the full (uncut) bigram table in BigInt,
    // plus value parity for the served top-200 rows
    val docs = Tables.table(spark, sf0001, "documents")
      .select("text").collect().map(_.getString(0))
    val bigrams = docs.flatMap { t =>
      val toks = t.trim.toLowerCase.split("\\s+")
      if (toks.length >= 2) toks.sliding(2).map(_.mkString(" "))
      else Iterator.empty
    }
    val c = bigrams.groupBy(identity).map { case (g, xs) =>
      g -> xs.length.toLong }
    val heads = c.groupBy(_._1.split(" ")(0))
    val cu = heads.map { case (h, m) => h -> m.values.sum }
    val n1u = heads.map { case (h, m) => h -> m.size.toLong }
    val n1w = c.keys.groupBy(_.split(" ")(1)).map { case (w, xs) =>
      w -> xs.size.toLong }
    val bt = c.size.toLong
    def num(g: String): BigInt = {
      val Array(h, w) = g.split(" ")
      BigInt(4 * c(g) - 3) * bt + BigInt(3) * n1u(h) * n1w(w)
    }
    // the conservation law runs over the WHOLE vocabulary: observed
    // continuations carry (4c−3)·B + 3·n1u·n1w, unseen ones only the
    // smoothing mass 3·n1u·n1w — together they total exactly 4·cu·B
    cu.keys.foreach { h =>
      val den = BigInt(4) * cu(h) * bt
      val seen = heads(h).keySet.map(_.split(" ")(1))
      // iterator, not Set.map — equal num values must not collapse
      val tot = heads(h).keysIterator.map(num).sum +
        n1w.collect { case (w, nw) if !seen(w) =>
          BigInt(3) * n1u(h) * nw }.sum
      assert(tot == den, s"context '$h' mass: $tot != $den")
    }
    val got = SparkEntry.queries("q_kneser_ney")(spark, sf0001).collect()
    assert(got.nonEmpty && got.length <= 200)
    got.foreach { r =>
      val g = r.getAs[String]("bigram")
      val Array(h, w) = g.split(" ")
      assert(r.getAs[Long]("cnt") == c(g), s"'$g' count")
      assert(r.getAs[Long]("cu") == cu(h) && r.getAs[Long]("n1u") ==
        n1u(h) && r.getAs[Long]("n1w") == n1w(w), s"'$g' marginals")
      val ppm = (BigInt(1000000) * num(g)) / (BigInt(4) * cu(h) * bt)
      assert(r.getAs[Long]("p_kn_ppm") == ppm.toLong, s"'$g' p_KN")
    }
  }

  test("q_grid_join: grid candidates are complete vs brute force") {
    // the completeness claim (cell size = r ⇒ neighbor cells cover the
    // radius) proved against the quadratic scan at sf0.01
    val ids = Tables.table(spark, "/root/testdata/sf0.01", "events")
      .select("user_id").distinct().collect().map(_.getLong(0))
    def coord(id: Long, off: Int): Long = {
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(off - 1, off + 7), 16) % 1000
    }
    val pts = ids.map(id => id -> (coord(id, 1), coord(id, 9))).toMap
    val brute = (for {
      a <- ids; b <- ids if a < b
      dx = pts(a)._1 - pts(b)._1; dy = pts(a)._2 - pts(b)._2
      if dx * dx + dy * dy <= 10000
    } yield (a, b) -> (dx * dx + dy * dy)).toMap
    val got = SparkEntry.queries("q_grid_join")(
      spark, "/root/testdata/sf0.01").collect()
    assert(got.length == brute.size, "grid join must equal brute force")
    got.foreach { r =>
      val k = (r.getAs[Long]("user_a"), r.getAs[Long]("user_b"))
      assert(brute.get(k).contains(r.getAs[Long]("dist2")),
        s"pair $k distance")
    }
  }

  test("q_concurrency: boundary sweep matches a plain-Scala sweep") {
    val ev = Tables.table(spark, sf0001, "events")
      .selectExpr("user_id", "ts div 1000 AS tsu",
        "(ts div 1000) div 86400000000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._3).map { case (day, es) =>
      val iv = es.groupBy(_._1).map { case (u, xs) =>
        (u, xs.map(_._2).min, xs.map(_._2).max) }.toSeq
      val bounds = iv.flatMap { case (u, s, e) =>
        Seq((s, 1L, u), (e, -1L, u)) }
        .sortBy { case (t, d, u) => (t, -d, u) }
      var cur = 0L; var mx = 0L
      bounds.foreach { case (_, d, _) =>
        cur += d; if (cur > mx) mx = cur }
      day -> ((iv.size.toLong, mx))
    }
    val got = SparkEntry.queries("q_concurrency")(spark, sf0001)
      .collect()
    assert(got.nonEmpty && got.length == expected.size)
    got.foreach { r =>
      val (n, mx) = expected(r.getAs[Long]("day"))
      assert(r.getAs[Long]("n_sessions") == n)
      assert(r.getAs[Long]("max_concurrent") == mx)
      // peak concurrency never exceeds the day's session count
      assert(mx >= 1L && mx <= n)
    }
  }

  test("q_repetition_full: n-gram profiles match plain-Scala counting") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def profile(t: String, n: Int): (Long, Long, Long) = {
      val toks = t.trim.toLowerCase.split("\\s+", -1)
      val grams =
        if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSeq
        else Seq(toks.mkString(" "))
      val counts = grams.groupBy(identity).map(_._2.length.toLong)
      (grams.length.toLong, counts.size.toLong, counts.max)
    }
    val got = SparkEntry.queries("q_repetition_full")(spark, sf0001)
      .collect()
    assert(got.length == docs.length)
    val byId = docs.toMap
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (t3, d3, m3) = profile(byId(id), 3)
      val (t4, d4, m4) = profile(byId(id), 4)
      assert(r.getAs[Long]("total_3") == t3 &&
        r.getAs[Long]("distinct_3") == d3 &&
        r.getAs[Long]("max_cnt_3") == m3, s"doc $id 3-gram profile")
      assert(r.getAs[Long]("total_4") == t4 &&
        r.getAs[Long]("distinct_4") == d4 &&
        r.getAs[Long]("max_cnt_4") == m4, s"doc $id 4-gram profile")
      assert(r.getAs[Long]("top3_ppm") == 1000000L * m3 / t3 &&
        r.getAs[Long]("dup3_ppm") == 1000000L * (t3 - d3) / t3 &&
        r.getAs[Long]("top4_ppm") == 1000000L * m4 / t4 &&
        r.getAs[Long]("dup4_ppm") == 1000000L * (t4 - d4) / t4,
        s"doc $id ppm shares")
    }
  }

  test("q_srm: unit cells and chi-square match a plain-Scala 2-cell") {
    val units = Tables.table(spark, sf0001, "events")
      .selectExpr("(ts div 1000) div 86400000000 AS day", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val expected = units.groupBy(_._1).flatMap { case (day, us) =>
      val n1 = us.count(_._2 % 2 == 1).toLong
      val n0 = us.count(_._2 % 2 == 0).toLong
      if (n1 + n0 > 0) {
        val srm = 1000000L * (n1 - n0) * (n1 - n0) / (n1 + n0)
        Some(day -> ((n1, n0, srm, if (srm > 3841459L) 1L else 0L)))
      } else None
    }
    val got = SparkEntry.queries("q_srm")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size)
    got.foreach { r =>
      val day = r.getAs[Long]("day")
      val (n1, n0, srm, flag) = expected(day)
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n0") == n0,
        s"day $day cells")
      assert(r.getAs[Long]("srm_micro") == srm, s"day $day chi-square")
      assert(r.getAs[Long]("srm_flag") == flag, s"day $day flag")
      // the 2-cell equal-expected chi-square is non-negative and zero
      // iff the arms balance exactly
      assert(srm >= 0 && (srm == 0) == (n1 == n0), s"day $day law")
    }
  }

  test("q_cuped: theta and adjusted means match plain-Scala moments") {
    val ev = Tables.table(spark, sf0001, "events")
      .selectExpr("(ts div 1000) div 86400000000 AS day", "user_id",
        "value")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r0(r.getDouble(2) * 1000)))
    val days = ev.map(_._1)
    val cut = Math.floorDiv(days.min + days.max, 2L)
    val users = ev.groupBy(_._2).map { case (uid, es) =>
      (uid % 2,
        es.filter(_._1 < cut).map(_._3).sum,
        es.filter(_._1 >= cut).map(_._3).sum)
    }.toSeq
    // global sufficient statistics, the exact expression order of the
    // query's mirrored double promotion
    val n = users.length.toLong
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxx = users.map(u => u._2 * u._2).sum
    val sxy = users.map(u => u._2 * u._3).sum
    val varPre = n.toDouble * sxx - sx.toDouble * sx
    assert(varPre > 0, "fixture must have pre-period variance")
    val theta = (n.toDouble * sxy - sx.toDouble * sy) / varPre
    val expected = users.groupBy(_._1).map { case (arm, us) =>
      val nA = us.length.toLong
      val sxA = us.map(_._2).sum; val syA = us.map(_._3).sum
      val meanPost = syA.toDouble / nA
      val adj = meanPost -
        theta * (sxA.toDouble / nA - sx.toDouble / n)
      arm -> ((nA, r0(1000000 * meanPost), r0(1000000 * theta),
        r0(1000000 * adj)))
    }
    val got = SparkEntry.queries("q_cuped")(spark, sf0001).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val arm = r.getAs[Long]("arm")
      val (nA, mp, th, adj) = expected(arm)
      assert(r.getAs[Long]("n_a") == nA, s"arm $arm units")
      assert(r.getAs[Long]("mean_post_micro") == mp, s"arm $arm mean")
      assert(r.getAs[Long]("theta_micro") == th, s"arm $arm theta")
      assert(r.getAs[Long]("adj_mean_micro") == adj,
        s"arm $arm adjusted mean")
    }
    // CUPED invariant: the unit-weighted adjusted means recombine to
    // the global post mean (the adjustment is mean-preserving)
    val gotMap = got.map(r => r.getAs[Long]("arm") ->
      (r.getAs[Long]("n_a"), r.getAs[Long]("adj_mean_micro"))).toMap
    val pooled = gotMap.values.map { case (nA, a) => nA * a }.sum /
      gotMap.values.map(_._1).sum
    val globalPost = r0(1000000 * (sy.toDouble / n))
    assert(math.abs(pooled - globalPost) <= 2L,
      "adjusted means must recombine to the global post mean")
  }

  test("q_hits: two mutual-reinforcement rounds match plain Scala") {
    val edges = graft.ops.llm.Dedup
      .knnGraph(Tables.table(spark, sf0001, "documents"),
        "doc_id", "text", k = 5)
      .select("doc_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    // halfRound(score keyed by `from`, summed onto `to`), max-norm in
    // integer micro units — the query's exact arithmetic
    def half(score: Map[Long, Long], fromSrc: Boolean): Map[Long, Long] = {
      val sums = edges
        .groupBy(e => if (fromSrc) e._2 else e._1)
        .map { case (t, es) =>
          t -> es.map(e => score(if (fromSrc) e._1 else e._2)).sum }
      val m = sums.values.max
      nodes.map(v =>
        v -> sums.get(v).map(s => 1000000L * s / m).getOrElse(0L)).toMap
    }
    var a: Map[Long, Long] = nodes.map(_ -> 1000000L).toMap
    var h = a
    for (_ <- 1 to 2) {
      a = half(h, fromSrc = true)
      h = half(a, fromSrc = false)
    }
    val got = SparkEntry.queries("q_hits")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == nodes.length)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("auth_micro") == a(id), s"doc $id authority")
      assert(r.getAs[Long]("hub_micro") == h(id), s"doc $id hub")
    }
    // max-norm law: each vector's max is exactly 1e6 after each round
    assert(a.values.max == 1000000L && h.values.max == 1000000L)
  }
}
