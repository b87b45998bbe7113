package graft.core

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** Port of tests/user_config_test.py goldens (SURVEY §5). */
class CubeConfigSpec extends AnyFunSuite {

  test("defaults match config.py:49-57") {
    val c = CubeConfig()
    assert(c.startDate == LocalDate.of(1970, 1, 1))
    assert(c.minIncidenceAngle == 0.0)
    assert(c.maxIncidenceAngle == 90.0)
    assert(c.temporalResolution == 0)
    assert(!c.coregistered)
    assert(!c.spaceOverlap)
    assert(c.temporalOverlap)
  }

  test("sample config parses with int dates and 0/1 booleans") {
    val c = CubeConfig.fromJsonString(
      """{"start_date": 20200101, "end_date": 20201231, "temporal_resolution": 1,
        |"min_incidence_angle": 20, "max_incidence_angle": 35,
        |"space_overlap": 0, "temporal_overlap": 0}""".stripMargin)
    assert(c.startDate == LocalDate.of(2020, 1, 1))
    assert(c.endDate == LocalDate.of(2020, 12, 31))
    assert(c.temporalResolution == 1)
    assert(c.minIncidenceAngle == 20.0)
    assert(c.maxIncidenceAngle == 35.0)
    assert(!c.spaceOverlap)
    assert(!c.temporalOverlap)
  }

  test("string dates and string angles are coerced (config.py:100-120)") {
    val c = CubeConfig.fromJsonString(
      """{"start_date": "20210402", "end_date": "20210420", "min_incidence_angle": "0.3"}""")
    assert(c.startDate == LocalDate.of(2021, 4, 2))
    assert(c.minIncidenceAngle == 0.3)
  }

  test("invalid temporal_resolution type raises (config.py:122-126)") {
    intercept[IllegalArgumentException] {
      CubeConfig.fromJsonString("""{"temporal_resolution": "1"}""")
    }
  }

  test("invalid date raises") {
    intercept[IllegalArgumentException] {
      CubeConfig.fromJsonString("""{"start_date": "2020-01-01"}""")
    }
  }

  test("end < start raises (config.py:156-166)") {
    intercept[IllegalArgumentException] {
      CubeConfig.fromJsonString("""{"start_date": 20210402, "end_date": 20200402}""")
    }
  }

  test("max < min incidence raises") {
    intercept[IllegalArgumentException] {
      CubeConfig.fromJsonString("""{"min_incidence_angle": 40, "max_incidence_angle": 20}""")
    }
  }

  test("unknown keys warn but do not fail (config.py:79-85)") {
    val c = CubeConfig.fromJsonString("""{"bogus_key": 1, "start_date": 20200101}""")
    assert(c.startDate == LocalDate.of(2020, 1, 1))
  }
}
