package graft.meta

import java.time.LocalDate

import graft.SparkFunSuite
import graft.core.CubeConfig
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property layer the reference lacks (SURVEY §5 port strategy):
  * date-filter ⊆, dedup idempotence, resample row-count law. Plain
  * scalacheck generators sampled with fixed seeds (scalatestplus is not
  * on the offline classpath), so runs are deterministic.
  */
class PlannerPropertiesSpec extends SparkFunSuite {
  import spark.implicits._

  private val dateGen = Gen.choose(0L, 120L).map(d => LocalDate.of(2021, 1, 1).plusDays(d))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def layersOf(dates: Seq[LocalDate], times: Seq[String]) = {
    val rows = dates.zip(times).zipWithIndex.map { case ((d, t), i) =>
      (s"p_$i.tif", s"/x/p_$i.parquet",
        d.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE), t, 30.0 + i)
    }
    rows.toDF("product_file", "product_fpath", "acquisition_date", "acquisition_time", "incidence_center")
  }

  test("property: date filter output is a subset and within bounds") {
    for (((dates, a), b) <- samples(Gen.listOfN(12, dateGen), 8)
           .zip(samples(dateGen, 8)).zip(samples(dateGen.map(_.plusDays(11)), 8))) {
      val (lo, hi) = if (a.isBefore(b)) (a, b) else (b, a)
      val cfg = CubeConfig(startDate = lo, endDate = hi)
      val df = layersOf(dates, dates.map(_ => "120000.000000"))
      val out = new CubePlanner(cfg).selectRequestedDates(df)
        .select("acquisition_date").collect().map(_.getString(0))
      val expected = dates.count(d => !d.isBefore(lo) && !d.isAfter(hi))
      assert(out.length == expected, s"dates=$dates lo=$lo hi=$hi")
      assert(out.forall { s =>
        val d = LocalDate.parse(s, java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
        !d.isBefore(lo) && !d.isAfter(hi)
      })
    }
  }

  test("property: dedup is idempotent and keeps the max-time row per date") {
    for (dates <- samples(Gen.listOfN(10, dateGen), 8)) {
      val times = dates.indices.map(i => f"${100000 + i * 111}%06d.000000")
      val planner = new CubePlanner(CubeConfig(temporalOverlap = false))
      val df = layersOf(dates, times)
      val once = planner.pruneTemporalOverlap(df)
      val twice = planner.pruneTemporalOverlap(once)
      assert(once.count() == dates.distinct.size)
      assert(twice.count() == once.count())
      val maxTimes = df.groupBy("acquisition_date").agg(max("acquisition_time").as("t"))
      val wrongWinners = once.join(maxTimes, Seq("acquisition_date"))
        .filter(col("acquisition_time") =!= col("t")).count()
      assert(wrongWinners == 0)
    }
  }

  test("property: n-day resample grid has (end-start)/n + 1 rows") {
    for ((n, span) <- samples(Gen.choose(1, 7), 8).zip(samples(Gen.choose(5L, 60L), 8))) {
      val start = LocalDate.of(2021, 4, 1)
      val end = start.plusDays(span)
      val cfg = CubeConfig(startDate = start, endDate = end, temporalResolution = n)
      val df = layersOf(Seq(start), Seq("120000.000000"))
      val out = new CubePlanner(cfg).setTemporalResolution(df)
      assert(out.count() == span / n + 1, s"n=$n span=$span")
    }
  }
}
