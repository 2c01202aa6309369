package graft

/** Semantic laws of the events time-series queries (X48 interpolation,
  * X49 user growth) on real data: full spine coverage, class partition,
  * interpolated values bounded by their anchor observations, extensions
  * confined to series boundaries, and growth-curve conservation.
  */
class InterpolateSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q_interpolate")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("ub"),
        r.getAs[Long]("day"), r.getAs[Long]("value_micro"),
        r.getAs[String]("src")))

  test("every series covers the full day spine exactly once, all classes present") {
    assert(rows.nonEmpty)
    val days = rows.map(_._3)
    val span = (days.min to days.max)
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, rs) =>
      assert(rs.map(_._3).sorted.toSeq == span.toSeq,
        s"$k must cover every day in [${days.min}, ${days.max}] once")
    }
    assert(rows.map(_._5).toSet == Set("observed", "interpolated",
      "extended"), "fixture must exercise all three classes")
    assert(rows.forall(_._4 >= 0), "no null/negative fills on this data")
  }

  test("interpolated values sit between their anchor observations; extensions hug the boundary") {
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, rs) =>
      val ordered = rs.sortBy(_._3)
      val obsDays = ordered.filter(_._5 == "observed").map(_._3)
      assert(obsDays.nonEmpty, s"$k: a series exists only if observed")
      val byDay = ordered.map(r => r._3 -> r).toMap
      ordered.filter(_._5 == "interpolated").foreach { r =>
        val pd = obsDays.filter(_ < r._3).max
        val nd = obsDays.filter(_ > r._3).min
        val pv = byDay(pd)._4
        val nv = byDay(nd)._4
        assert(r._4 >= math.min(pv, nv) && r._4 <= math.max(pv, nv),
          s"$k day ${r._3}: ${r._4} outside [$pv, $nv]")
        // exact linear form with truncated division
        assert(r._4 == pv + ((nv - pv) * (r._3 - pd)) / (nd - pd),
          s"$k day ${r._3}: not the truncated linear interpolant")
      }
      // extensions only before the first / after the last observation,
      // carrying that boundary value flat
      ordered.filter(_._5 == "extended").foreach { r =>
        assert(r._3 < obsDays.min || r._3 > obsDays.max,
          s"$k day ${r._3}: extension inside the observed span")
        val anchor = if (r._3 < obsDays.min) obsDays.min else obsDays.max
        assert(r._4 == byDay(anchor)._4,
          s"$k day ${r._3}: extension must carry the boundary value")
      }
    }
  }

  test("q_user_growth: conservation — new users sum to the distinct-user total") {
    val g = SparkEntry.queries("q_user_growth")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_active"), r.getAs[Long]("n_events"),
        r.getAs[Long]("cum_users"), r.getAs[Long]("cum_events")))
      .sortBy(_._1)
    assert(g.nonEmpty)
    val users = Tables.table(spark, sf0001, "events")
      .select("user_id").distinct().count()
    val events = Tables.table(spark, sf0001, "events").count()
    assert(g.map(_._2).sum == users,
      "every user is new exactly once")
    assert(g.last._5 == users, "final cum_users is the distinct total")
    assert(g.last._6 == events, "final cum_events is the event total")
    // running totals are the prefix sums of the per-day columns
    assert(g.map(_._2).scanLeft(0L)(_ + _).tail.toSeq == g.map(_._5).toSeq)
    assert(g.map(_._4).scanLeft(0L)(_ + _).tail.toSeq == g.map(_._6).toSeq)
    // a day's actives can't exceed the users seen so far
    g.foreach { r => assert(r._3 <= r._5, s"day ${r._1}") }
  }
}
