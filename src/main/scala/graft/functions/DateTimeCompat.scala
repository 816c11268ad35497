package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Compatibility layer for the reference's user-facing date-time UDF
  * algebra.
  *
  * The reference registers the `sparklinedata/spark-datetime` function
  * library into every session (`SparklineDataModule.scala:72-74`) and its
  * test/benchmark SQL is written against it — predicates like
  * `dateIsBefore(dateTime(`l_shipdate`), dateMinus(dateTime("1997-12-01"),
  * period("P90D")))` (rendered by the library's `date"..."` interpolator;
  * recognized for pushdown in `DateTimeExtractor.scala:28-188`). A user
  * switching from the reference needs these names to resolve.
  *
  * Unlike the reference — which pattern-matches these as opaque `ScalaUDF`s
  * and re-derives their meaning — we register each name as a **native
  * Catalyst expression builder**: `dateTime` is a `Cast`, `dateIsBefore` is
  * `LessThan`, `datePlus` is `TimestampAddInterval`, the field extractors
  * are the corresponding datetime expressions. The whole algebra therefore
  * constant-folds, participates in whole-stage codegen, and — crucially —
  * comes out of the optimizer as the plain `timeCol <op> literal` shape that
  * [[graft.plans.TimeBucketPruning]] and partition pruning already
  * understand. No UDF boundary, no extractor machinery.
  *
  * Semantics follow joda-time (what the original library used):
  * `dayOfWeek` is ISO (1 = Monday), `weekyear` is the ISO week-based year,
  * `era`/`centuryOfEra`/`yearOfCentury` assume CE dates (all of TPC-H).
  */
object DateTimeCompat {

  /** Parse an ISO-8601 period literal (`PnYnMnWnDTnHnMnS`) to a Spark
    * `CalendarInterval`. Fractional seconds supported to micros.
    */
  def parsePeriod(s: String): CalendarInterval = {
    val re = ("^([+-]?)P(?:(\\d+)Y)?(?:(\\d+)M)?(?:(\\d+)W)?(?:(\\d+)D)?" +
      "(?:T(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+(?:\\.\\d+)?)S)?)?$").r
    s.trim match {
      case re(sign, y, mo, w, d, h, mi, se) =>
        def n(x: String): Long = if (x == null) 0L else x.toLong
        val months = n(y) * 12 + n(mo)
        val days = n(w) * 7 + n(d)
        val secs = if (se == null) BigDecimal(0) else BigDecimal(se)
        val micros = n(h) * 3600000000L + n(mi) * 60000000L +
          (secs * 1000000L).toLong
        val k = if (sign == "-") -1 else 1
        new CalendarInterval(k * months.toInt, k * days.toInt, k * micros)
      case _ =>
        throw new IllegalArgumentException(s"not an ISO-8601 period: '$s'")
    }
  }

  private def one(name: String)(f: Expression => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { args =>
      require(args.size == 1, s"$name expects 1 argument, got ${args.size}")
      f(args.head)
    }

  private def two(name: String)(f: (Expression, Expression) => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { args =>
      require(args.size == 2, s"$name expects 2 arguments, got ${args.size}")
      f(args(0), args(1))
    }

  private def ts(e: Expression): Expression = Cast(e, TimestampType)
  private def fmt(e: Expression, pattern: String): Expression =
    DateFormatClass(ts(e), Literal(pattern))
  /** ISO day-of-week, 1 = Monday … 7 = Sunday (joda `dayOfWeek`). */
  private def isoDow(e: Expression): Expression =
    Add(WeekDay(Cast(e, DateType)), Literal(1))

  /** Builders keyed by function name (resolution is case-insensitive). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    one("dateTime")(ts),
    one("dateTimeWithTZ")(ts),
    two("dateTimeWithFormat")((e, f) => new ParseToTimestamp(e, f)),
    two("dateTimeWithFormatAndTZ")((e, f) => new ParseToTimestamp(e, f)),
    // joda epoch constructor takes millis
    one("dateTimeFromEpoch")(e => MillisToTimestamp(Cast(e, LongType))),
    one("period") {
      case l if l.foldable && l.dataType == StringType =>
        val v = l.eval()
        require(v != null, "period(NULL)")
        Literal(parsePeriod(v.toString), CalendarIntervalType)
      case other =>
        throw new IllegalArgumentException(
          s"period() expects a string literal, got $other")
    },
    two("datePlus")((d, p) => TimestampAddInterval(ts(d), p)),
    two("dateMinus")((d, p) => TimestampAddInterval(ts(d), UnaryMinus(p))),
    two("dateIsBefore")((a, b) => LessThan(ts(a), ts(b))),
    two("dateIsAfter")((a, b) => GreaterThan(ts(a), ts(b))),
    two("dateIsBeforeOrEqual")((a, b) => LessThanOrEqual(ts(a), ts(b))),
    two("dateIsAfterOrEqual")((a, b) => GreaterThanOrEqual(ts(a), ts(b))),
    // shift the wall clock so UTC-based extractors read zone-local fields
    // (the session is pinned to UTC by Graft.forceUtc)
    two("withZone")((d, tz) => FromUTCTimestamp(ts(d), tz)),
    one("era")(e => fmt(e, "G")),
    one("centuryOfEra")(e =>
      Cast(Floor(Divide(Cast(Year(Cast(e, DateType)), DoubleType),
        Literal(100.0))), IntegerType)),
    one("yearOfEra")(e => Year(Cast(e, DateType))),
    one("yearOfCentury")(e => Remainder(Year(Cast(e, DateType)), Literal(100))),
    one("year")(e => Year(Cast(e, DateType))),
    // ISO week-based year = calendar year of this week's Thursday
    one("weekyear")(e => Year(DateAdd(Cast(e, DateType),
      Subtract(Literal(4), isoDow(e))))),
    one("monthOfYear")(e => Month(Cast(e, DateType))),
    one("monthOfYearName")(e => fmt(e, "MMMM")),
    one("weekOfWeekyear")(e => WeekOfYear(Cast(e, DateType))),
    one("dayOfYear")(e => DayOfYear(Cast(e, DateType))),
    one("dayOfMonth")(e => DayOfMonth(Cast(e, DateType))),
    one("dayOfWeek")(isoDow),
    one("dayOfWeekName")(e => fmt(e, "EEEE")),
    one("hourOfDay")(e => Hour(ts(e))),
    one("minuteOfHour")(e => Minute(ts(e))),
    one("secondOfMinute")(e => Second(ts(e))),
    one("millisOfSecond")(e =>
      Cast(Remainder(UnixMillis(ts(e)), Literal(1000L)), IntegerType)))

  /** Register every compat function into the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
