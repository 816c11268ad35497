package graft.cube

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Direct execution of a serialized query descriptor against a registered
  * cube — the reference's `ON DRUIDDATASOURCE ds EXECUTE QUERY <json>`
  * entry point (`SparklineDataParser.scala:113-119`,
  * `util/PlanUtil.scala:49-67`), which deserializes a raw `QuerySpec` and
  * wraps it in a scan, bypassing the SQL rewrite.
  *
  * The descriptor mirrors the Druid query-spec surface
  * (`DruidQuerySpec.scala`): `groupBy` / `timeseries` / `topN` aggregating
  * queries (dimensions, count / sum / min / max aggregations,
  * selector/in/bound/logical filters, granularity, ISO `start/end`
  * intervals over the cube's time column) plus the non-aggregating
  * `select` (raw event page), `search` (dimension-value matching) and
  * `segmentMetadata` (per-bucket row counts and time cover) query types. Execution is a declarative
  * DataFrame over the cube relation, so — unlike the reference's bypass —
  * the plan still benefits from time-bucket pruning and rollup-lattice
  * routing: a "raw" query spec whose dims sit in the lattice never touches
  * the fact table.
  *
  * Example:
  * {{{
  * {"queryType": "groupBy",
  *  "dimensions": ["c_mktsegment"],
  *  "aggregations": [
  *    {"type": "count", "name": "cnt"},
  *    {"type": "doubleSum", "fieldName": "l_quantity", "name": "sum_qty"}],
  *  "filter": {"type": "selector", "dimension": "l_returnflag", "value": "R"},
  *  "intervals": ["1996-01-01/1997-01-01"]}
  * }}}
  */
object DirectQuery {

  def execute(spark: SparkSession, cubeName: String, json: String): DataFrame = {
    val cube = CubeCatalog.get(cubeName).getOrElse(throw new IllegalArgumentException(
      s"no registered cube named $cubeName"))
    val j = JsonMethods.parse(json)
    def str(v: JValue): String = v match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"expected string, got $other")
    }
    val queryType = (j \ "queryType") match {
      case JString(t @ ("groupBy" | "timeseries" | "topN" | "select" |
                        "search" | "segmentMetadata" | "timeBoundary" |
                        "scan")) => t
      case JNothing => "groupBy"
      case other => throw new IllegalArgumentException(
        s"unsupported queryType $other — groupBy, timeseries, topN, " +
          "select, scan, search, segmentMetadata or timeBoundary")
    }

    // the cube relation by path: CubeCatalog matches scans of this path, so
    // the rewrite rules (bucket pruning, lattice routing) apply as usual
    var df = spark.read.parquet(cube.cubePath)

    // intervals: ["start/end", ...] — half-open, ORed, on the time column
    (j \ "intervals") match {
      case JArray(ivs) if ivs.nonEmpty =>
        val t = col(cube.info.timeColumn)
        val conds = ivs.map(str).map { iv =>
          val parts = iv.split("/", 2)
          require(parts.length == 2, s"interval must be start/end: $iv")
          t >= lit(parts(0)).cast("timestamp") && t < lit(parts(1)).cast("timestamp")
        }
        df = df.filter(conds.reduce(_ || _))
      case JNothing => ()
      case other => throw new IllegalArgumentException(s"bad intervals: $other")
    }

    // Druid's reserved `__time` dimension name addresses the datasource's
    // time column; map it to the cube's declared one everywhere a
    // descriptor names a dimension
    def dimName(d: String): String =
      if (d == "__time") cube.info.timeColumn else d
    def col(d: String): Column =
      org.apache.spark.sql.functions.col(dimName(d))

    // filter tree: selector (=), bound (lower/upper, strict flags), in,
    // not, and/or, regex, like, search (contains / insensitive_contains /
    // fragment), interval — the reference's FilterSpec surface minus the
    // JS escape (any Catalyst expression is native here)
    def filterOf(f: JValue): Column = (f \ "type") match {
      case JString("selector") =>
        col(str(f \ "dimension")) === lit(str(f \ "value"))
      case JString("in") =>
        val vals = (f \ "values") match {
          case JArray(vs) => vs.map(str)
          case other => throw new IllegalArgumentException(s"bad in values: $other")
        }
        col(str(f \ "dimension")).isin(vals: _*)
      case JString("bound") =>
        val c = col(str(f \ "dimension"))
        val lower = (f \ "lower").toOption.map(str)
        val upper = (f \ "upper").toOption.map(str)
        val lowerStrict = (f \ "lowerStrict") == JBool(true)
        val upperStrict = (f \ "upperStrict") == JBool(true)
        val conds =
          lower.map(v => if (lowerStrict) c > v else c >= v).toSeq ++
          upper.map(v => if (upperStrict) c < v else c <= v).toSeq
        require(conds.nonEmpty, "bound filter needs lower and/or upper")
        conds.reduce(_ && _)
      case JString("not") => !filterOf(f \ "field")
      case JString("and") | JString("or") =>
        val fields = (f \ "fields") match {
          case JArray(fs) => fs.map(filterOf)
          case other => throw new IllegalArgumentException(s"bad fields: $other")
        }
        if ((f \ "type") == JString("and")) fields.reduce(_ && _)
        else fields.reduce(_ || _)
      // Druid regex filter (`DruidQuerySpec.scala` RegexFilterSpec): the
      // pattern MATCHES anywhere in the value (java.util.regex find), which
      // is Spark's rlike semantics exactly
      case JString("regex") =>
        col(str(f \ "dimension")).rlike(str(f \ "pattern"))
      // Druid like filter: SQL LIKE with optional custom escape
      case JString("like") =>
        val c = col(str(f \ "dimension"))
        (f \ "escape").toOption.map(str) match {
          case Some(e) if e.nonEmpty =>
            call_function("like", c, lit(str(f \ "pattern")), lit(e))
          case _ => c.like(str(f \ "pattern"))
        }
      // search FILTER (same specs as the search query type): contains /
      // insensitive_contains / fragment over one dimension's value
      case JString("search") =>
        val c = col(str(f \ "dimension"))
        val q = f \ "query"
        (q \ "type") match {
          case JString("contains") =>
            val v = str(q \ "value")
            if ((q \ "caseSensitive") == JBool(true)) c.contains(v)
            else lower(c).contains(v.toLowerCase(java.util.Locale.ROOT))
          case JString("insensitive_contains") =>
            lower(c).contains(str(q \ "value").toLowerCase(java.util.Locale.ROOT))
          case JString("fragment") =>
            val frags = (q \ "values") match {
              case JArray(vs) => vs.map(str)
              case other => throw new IllegalArgumentException(s"bad fragment values: $other")
            }
            require(frags.nonEmpty, "fragment search needs values")
            frags.map(v => lower(c).contains(v.toLowerCase(java.util.Locale.ROOT)))
              .reduce(_ && _)
          case other => throw new IllegalArgumentException(s"unsupported search query spec $other")
        }
      // Druid interval filter: ISO-interval disjunction over a time-typed
      // column (usually __time; any timestamp column of the cube works)
      case JString("interval") =>
        val c = col(str(f \ "dimension"))
        val ivs = (f \ "intervals") match {
          case JArray(xs) => xs.map(str)
          case other => throw new IllegalArgumentException(s"bad intervals: $other")
        }
        require(ivs.nonEmpty, "interval filter needs intervals")
        ivs.map { iso =>
          val parts = iso.split("/", 2)
          require(parts.length == 2, s"interval must be start/end: $iso")
          c >= lit(parts(0)).cast("timestamp") && c < lit(parts(1)).cast("timestamp")
        }.reduce(_ || _)
      // Druid spatial filter (`DruidQuerySpec.scala:255-281`): Druid packs
      // both coordinates into one encoded spatial dimension; our cubes keep
      // plain coordinate COLUMNS, so the descriptor names the pair as
      // "xcol,ycol" and the bound becomes two pushdown-friendly range
      // predicates per axis (what the R-tree bought — see SpatialFunctions)
      case JString("spatial") =>
        val dims = str(f \ "dimension").split(",").map(_.trim)
        require(dims.length == 2, "spatial dimension must name 'xcol,ycol'")
        def coords(v: JValue, what: String): Seq[Double] = v match {
          case JArray(xs) => xs.map {
            case JInt(n)     => n.toDouble
            case JDouble(d)  => d
            case JDecimal(d) => d.toDouble
            case other => throw new IllegalArgumentException(s"bad $what coord: $other")
          }
          case other => throw new IllegalArgumentException(s"bad $what: $other")
        }
        val b = f \ "bound"
        require((b \ "type") == JString("rectangular"),
          "only rectangular spatial bounds are supported")
        val lo = coords(b \ "minCoords", "minCoords")
        val hi = coords(b \ "maxCoords", "maxCoords")
        require(lo.length == 2 && hi.length == 2, "rectangular bound needs 2-d coords")
        graft.functions.SpatialFunctions.rectContains(
          col(dims(0)), col(dims(1)),
          graft.functions.SpatialFunctions.Rect(lo(0), hi(0), lo(1), hi(1)))
      case other => throw new IllegalArgumentException(s"unsupported filter type $other")
    }
    (j \ "filter") match {
      case JNothing => ()
      case f        => df = df.filter(filterOf(f))
    }

    def strList(v: JValue, what: String): Seq[String] = v match {
      case JArray(xs) => xs.map(str)
      case JNothing   => Nil
      case other => throw new IllegalArgumentException(s"bad $what: $other")
    }

    // ---- non-aggregating query types -------------------------------------
    queryType match {
      case "select" =>
        // Druid Select query (`DruidQuerySpec.scala:977-1098`): raw event
        // rows — time, dimensions, metrics — with a paging threshold. Druid
        // pages by (segment, offset), an ordering that doesn't exist here;
        // ours orders by event time with the projected columns as
        // tiebreakers, so the returned page is a deterministic multiset for
        // any threshold (Druid's own page order is storage-dependent).
        val selDims = strList(j \ "dimensions", "dimensions") match {
          case Nil => cube.info.columns
            .filter(_.role == ColumnRole.Dimension).map(_.name)
          case ds => ds
        }
        val selMets = strList(j \ "metrics", "metrics") match {
          case Nil => cube.info.columns
            .filter(_.role == ColumnRole.Metric).map(_.name)
          case ms => ms
        }
        val thresholdJ = (j \ "pagingSpec" \ "threshold") match {
          case JNothing => j \ "limit"
          case v        => v
        }
        val threshold = thresholdJ match {
          case JInt(n) => n.toInt
          case JNothing => throw new IllegalArgumentException(
            "select needs pagingSpec.threshold (or limit)")
          case other => throw new IllegalArgumentException(s"bad threshold: $other")
        }
        val descending = (j \ "descending") == JBool(true)
        val outCols = cube.info.timeColumn +: (selDims ++ selMets)
        val tOrd = if (descending) col(cube.info.timeColumn).desc
                   else col(cube.info.timeColumn).asc
        return df.select(outCols.distinct.map(col): _*)
          .orderBy(tOrd +: (selDims ++ selMets).map(col(_).asc): _*)
          .limit(threshold)

      case "scan" =>
        // Druid Scan query — Select's streaming successor (Druid ≥0.11;
        // beyond the reference's 0.8 surface, kept for clients that moved
        // on): explicit `columns` list (dims and metrics mixed, `__time`
        // aliases the time column), optional `limit`, `order` by time
        // (`ascending` / `descending`; `none` is storage order in Druid —
        // deterministically ascending here). `batchSize`/`resultFormat`
        // shape the wire protocol, not the rows — accepted and ignored.
        val scanCols = strList(j \ "columns", "columns") match {
          case Nil => cube.info.columns.map(_.name)
          case cs => cs.map(c => if (c == "__time") cube.info.timeColumn else c)
        }
        val tOrdScan = (j \ "order") match {
          case JString("descending") => col(cube.info.timeColumn).desc
          case JString("ascending") | JString("none") | JNothing =>
            col(cube.info.timeColumn).asc
          case other => throw new IllegalArgumentException(s"bad order: $other")
        }
        // time + projected columns as tiebreakers: a limited page is a
        // deterministic multiset (Druid's own page order is storage-bound)
        val ordered = df.select(scanCols.distinct.map(col): _*)
          .orderBy(tOrdScan +: scanCols.filter(_ != cube.info.timeColumn)
            .map(col(_).asc): _*)
        return (j \ "limit") match {
          case JInt(n) => ordered.limit(n.toInt)
          case JNothing => ordered
          case other => throw new IllegalArgumentException(s"bad limit: $other")
        }

      case "search" =>
        // Druid Search query (`DruidQuerySpec.scala:59-60`, SURVEY.md §4.2
        // SearchQuerySpecTransform): dimension values matching a contains /
        // insensitive_contains / fragment spec, with per-value match
        // counts. One scan for ALL searched dimensions: each row explodes
        // into (dimension, value) pairs, the match filters, one shuffle
        // counts — at cube scale this is a single pass regardless of how
        // many dimensions are searched.
        val sdims = strList(j \ "searchDimensions", "searchDimensions") match {
          case Nil => cube.info.columns
            .filter(_.role == ColumnRole.Dimension).map(_.name)
          case ds => ds
        }
        val q = j \ "query"
        def matches(c: Column): Column = (q \ "type") match {
          case JString("contains") if (q \ "caseSensitive") == JBool(true) =>
            c.contains(str(q \ "value"))
          case JString("contains") | JString("insensitive_contains") =>
            lower(c).contains(str(q \ "value").toLowerCase(java.util.Locale.ROOT))
          case JString("fragment") =>
            strList(q \ "values", "fragment values")
              .map(v => lower(c).contains(v.toLowerCase(java.util.Locale.ROOT)))
              .reduce(_ && _)
          case other => throw new IllegalArgumentException(
            s"unsupported search query type $other — contains, " +
              "insensitive_contains or fragment")
        }
        val pairs = df.select(explode(array(sdims.map(d =>
            struct(lit(d).as("dimension"), col(d).cast("string").as("value"))): _*))
            .as("g_sv"))
          .select(col("g_sv.dimension").as("dimension"), col("g_sv.value").as("value"))
        val counted = pairs.filter(matches(col("value")))
          .groupBy("dimension", "value")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("dimension", "value")
        return (j \ "limit") match {
          case JInt(n)  => counted.limit(n.toInt)
          case JNothing => counted
          case other => throw new IllegalArgumentException(s"bad limit: $other")
        }

      case "segmentMetadata" =>
        // Druid SegmentMetadata query: per-segment row counts and time
        // cover. The cube's segment analog is the month bucket its layout
        // partitions by, recomputed here from the time column so the query
        // works on any registered cube regardless of its physical bucket
        // column name.
        val t = col(cube.info.timeColumn)
        val bucket = (year(t) - 1970) * 12 + month(t) - 1
        return df.groupBy(bucket.as("segment"))
          .agg(count(lit(1)).as("num_rows"),
            unix_micros(min(t).cast("timestamp")).as("t_min_us"),
            unix_micros(max(t).cast("timestamp")).as("t_max_us"))
          .orderBy("segment")

      case "timeBoundary" =>
        // Druid TimeBoundary query: the datasource's min/max event time —
        // the reference's metadata/interval-discovery call
        // (`client/DruidClient.scala:402-427`). `bound` narrows to one
        // side. A parquet-stats-only aggregate: no dimension columns read.
        val t = col(cube.info.timeColumn).cast("timestamp")
        return (j \ "bound") match {
          case JString("minTime") => df.agg(min(t).as("min_time"))
          case JString("maxTime") => df.agg(max(t).as("max_time"))
          case JNothing =>
            df.agg(min(t).as("min_time"), max(t).as("max_time"))
          case other => throw new IllegalArgumentException(
            s"unsupported timeBoundary bound $other — minTime or maxTime")
        }

      case _ => ()
    }

    // dimensionSpecs (`DruidQuerySpec.scala` DimensionSpec): a bare string,
    // {"type":"default","dimension":d,"outputName":o}, or an extraction
    // spec applying a value transform before grouping. Extraction fns are
    // ordinary projections here (substring / regex group-1 / timeFormat /
    // upper / lower / strlen), so Catalyst folds and pushes them like any
    // expression — the JS extraction escape is unnecessary.
    def dimSpecOf(v: JValue): (Column, String) = v match {
      // identity alias keeps the DESCRIPTOR's name on the output (matters
      // for `__time`, whose underlying column is the cube's time column)
      case JString(d) => (col(d).as(d), d)
      case o =>
        val d = str(o \ "dimension")
        val out = (o \ "outputName").toOption.map(str).getOrElse(d)
        val c = (o \ "type") match {
          case JString("default") | JNothing => col(d)
          case JString("extraction") =>
            val fn = o \ "extractionFn"
            (fn \ "type") match {
              case JString("substring") =>
                val idx = (fn \ "index") match {
                  case JInt(n) => n.toInt
                  case JNothing => 0
                  case other => throw new IllegalArgumentException(s"bad substring index: $other")
                }
                (fn \ "length") match {
                  case JInt(len) => substring(col(d), idx + 1, len.toInt)
                  case JNothing  => col(d).substr(lit(idx + 1), length(col(d)))
                  case other => throw new IllegalArgumentException(s"bad substring length: $other")
                }
              case JString("regex") =>
                // Druid regex extraction: capture group 1 of the pattern
                regexp_extract(col(d), str(fn \ "expr"), 1)
              case JString("timeFormat") =>
                date_format(col(d), str(fn \ "format"))
              case JString("upper")  => upper(col(d))
              case JString("lower")  => lower(col(d))
              case JString("strlen") => length(col(d)).cast("string")
              // inline map lookup (Druid lookup extraction, map type): the
              // mapping ships as ONE map literal in the plan — a broadcast
              // join in miniature, no shuffle
              case JString("lookup") =>
                val m = (fn \ "lookup" \ "map") match {
                  case JObject(kvs) => kvs.map { case (k, v) => k -> str(v) }.toMap
                  case other => throw new IllegalArgumentException(s"bad lookup map: $other")
                }
                require(m.nonEmpty, "lookup extraction needs a non-empty map")
                val looked = element_at(typedLit(m), col(d))
                if ((fn \ "retainMissingValue") == JBool(true)) coalesce(looked, col(d))
                else (fn \ "replaceMissingValueWith").toOption.map(str) match {
                  case Some(w) => coalesce(looked, lit(w))
                  case None    => looked
                }
              case other => throw new IllegalArgumentException(
                s"unsupported extraction fn $other")
            }
          case other => throw new IllegalArgumentException(
            s"unsupported dimension spec type $other")
        }
        (c.as(out), out)
    }
    val dimSpecs: Seq[(Column, String)] = queryType match {
      case "topN" => Seq(dimSpecOf(j \ "dimension"))
      case _ => (j \ "dimensions") match {
        case JArray(xs) => xs.map(dimSpecOf)
        case JNothing   => Nil
        case other => throw new IllegalArgumentException(s"bad dimensions: $other")
      }
    }

    // granularity: Druid's time bucketing (timeseries and bucketed groupBy;
    // `GranularitySpec`, `DruidQuerySpec.scala:140-150`). Truncations of
    // the time column are exactly what RollupRouting's time-grouping serves
    // from the lattice bucket column — month-or-coarser never touches facts.
    sealed trait Gran
    case object AllGran extends Gran
    case class NamedGran(g: String) extends Gran
    case class FixedGran(durMs: Long, originMs: Long) extends Gran
    val gran: Gran = (j \ "granularity") match {
      case JNothing | JString("all") => AllGran
      case JString(g @ ("second" | "minute" | "hour" | "day" | "week" |
                        "month" | "quarter" | "year")) => NamedGran(g)
      // duration / period granularity objects (Druid GranularitySpec):
      // fixed-length buckets anchored at an optional origin —
      // floor((t - origin) / dur) * dur + origin, in millis. The session
      // is pinned UTC, so ISO periods (PT15M, P1D, P2W) are fixed-length
      // too and reduce to the same arithmetic.
      case o: JObject =>
        val durMs: Long = (o \ "type") match {
          case JString("duration") => (o \ "duration") match {
            case JInt(ms) => ms.toLong
            case other => throw new IllegalArgumentException(s"bad duration: $other")
          }
          case JString("period") =>
            val p = str(o \ "period").toUpperCase(java.util.Locale.ROOT)
            if (p.startsWith("PT")) java.time.Duration.parse(p).toMillis
            else {
              val per = java.time.Period.parse(p)
              require(per.getYears == 0 && per.getMonths == 0,
                "month/year periods are calendar-variable — use granularity " +
                  "\"month\"/\"year\" instead")
              (per.getDays.toLong) * 86400000L
            }
          case other => throw new IllegalArgumentException(
            s"unsupported granularity object type $other")
        }
        require(durMs > 0, s"granularity duration must be positive, got $durMs")
        val originMs: Long = (o \ "origin").toOption.map(str) match {
          case Some(iso) => java.time.Instant.parse(
            if (iso.endsWith("Z")) iso else iso + "Z").toEpochMilli
          case None => 0L
        }
        FixedGran(durMs, originMs)
      case other => throw new IllegalArgumentException(
        s"unsupported granularity $other — " +
          "all/second/minute/hour/day/week/month/quarter/year or a " +
          "duration/period object")
    }
    val timeGroup: Option[Column] = gran match {
      case AllGran => None
      case NamedGran(g) =>
        Some(date_trunc(g, col(cube.info.timeColumn)).as("g_time"))
      case FixedGran(durMs, originMs) =>
        // exact integer bucket floor (pmod keeps pre-origin timestamps
        // correct — no double rounding anywhere)
        val t = unix_millis(col(cube.info.timeColumn).cast("timestamp"))
        val off = t - originMs
        Some(timestamp_millis(off - pmod(off, lit(durMs)) + originMs)
          .as("g_time"))
    }

    // aggregations — the mergeable set (SURVEY.md §2.4). Sums go through
    // the exact DECIMAL(28,6) shape so results are reproducible and the
    // lattice's stored sums can serve them.
    def aggOf(a: JValue): Column = {
      def field = col(str(a \ "fieldName"))
      def bare(t: String): Column = t match {
        case "count"                  => count(lit(1))
        case "longSum"                => sum(field.cast("long"))
        case "doubleSum"              => graft.Tables.dsum(field)
        case "longMin" | "doubleMin"  => min(field)
        case "longMax" | "doubleMax"  => max(field)
        // Druid's approximate distinct aggregators (hyperUnique over a
        // pre-built column, cardinality over dimensions) — both map to
        // approx_count_distinct; RollupRouting can still swap in a stored
        // HLL sketch union when one covers the column
        case "hyperUnique" => approx_count_distinct(field)
        case "cardinality" =>
          val ds = (a \ "fields") match {
            case JArray(fs) => fs.map(str)
            case JNothing   => Seq(str(a \ "fieldName"))
            case other => throw new IllegalArgumentException(s"bad cardinality fields: $other")
          }
          require(ds.nonEmpty, "cardinality needs fields")
          if (ds.size == 1) approx_count_distinct(col(ds.head))
          else approx_count_distinct(struct(ds.map(col): _*))
        case t => throw new IllegalArgumentException(s"unsupported aggregation type $t")
      }
      (str(a \ "type") match {
        // Druid filtered aggregator (`DruidQuerySpec.scala:362-377` — the
        // reference declares the IR but never plans into it; here any
        // filter spec gates any aggregator): rows failing the filter
        // contribute the aggregator's identity
        case "filtered" =>
          val inner = (a \ "aggregator")
          val pred = filterOf(a \ "filter")
          def ifield = col(str(inner \ "fieldName"))
          str(inner \ "type") match {
            case "count"   => count(when(pred, lit(1)))
            case "longSum" => sum(when(pred, ifield.cast("long")))
            case "doubleSum" =>
              graft.Tables.dsum(when(pred, ifield).otherwise(lit(null)))
            case "longMin" | "doubleMin" => min(when(pred, ifield))
            case "longMax" | "doubleMax" => max(when(pred, ifield))
            case t => throw new IllegalArgumentException(
              s"unsupported filtered aggregator type $t")
          }
        case t => bare(t)
      }).as((a \ "name") match {
        // Druid puts the output name on the filtered wrapper OR the inner
        // aggregator — accept either
        case JString(n) => n
        case _          => str(a \ "aggregator" \ "name")
      })
    }
    val aggs: Seq[Column] = (j \ "aggregations") match {
      case JArray(as) => as.map(aggOf)
      case JNothing   => Nil
      case other => throw new IllegalArgumentException(s"bad aggregations: $other")
    }
    require(aggs.nonEmpty, "query spec needs at least one aggregation")

    val groupCols: Seq[Column] = timeGroup.toSeq ++ dimSpecs.map(_._1)
    val grouped =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)

    // post-aggregations (`DruidQuerySpec.scala:379-430`): arithmetic over
    // aggregation results, constants, and nested arithmetic — an ordinary
    // projection above the aggregate. Division is plain double division
    // (Druid coerces x/0 to 0; SQL semantics keep the honest NULL/Inf).
    def num(v: JValue, what: String): Double = v match {
      case JInt(n)     => n.toDouble
      case JDouble(d)  => d
      case JDecimal(d) => d.toDouble
      case other => throw new IllegalArgumentException(s"bad $what: $other")
    }
    def postFieldOf(f: JValue): Column = (f \ "type") match {
      case JString("fieldAccess") => col(str(f \ "fieldName"))
      case JString("constant")    => lit(num(f \ "value", "constant value"))
      case JString("arithmetic")  => postArithOf(f)
      case other => throw new IllegalArgumentException(
        s"unsupported post-aggregation field type $other")
    }
    def postArithOf(p: JValue): Column = {
      val fields = (p \ "fields") match {
        case JArray(fs) if fs.size >= 2 => fs.map(postFieldOf)
        case other => throw new IllegalArgumentException(s"bad postAgg fields: $other")
      }
      str(p \ "fn") match {
        case "+" => fields.reduce(_ + _)
        case "-" => fields.reduce(_ - _)
        case "*" => fields.reduce(_ * _)
        case "/" | "quotient" =>
          fields.map(_.cast("double")).reduce(_ / _)
        case fn => throw new IllegalArgumentException(
          s"unsupported post-aggregation fn $fn")
      }
    }
    // Druid timeseries zero-fills every granularity bucket inside the
    // queried intervals unless `context.skipEmptyBuckets` — emit the full
    // bucket sequence (one array expression per interval; bucket count is
    // bounded by interval/step exactly as in Druid) and left-join the
    // aggregate onto it. count/sums/approx-distinct fill with 0 (the
    // reference-era engine's zero-fill); min/max stay NULL.
    val filled: org.apache.spark.sql.DataFrame =
      if (queryType != "timeseries" || gran == AllGran ||
          (j \ "context" \ "skipEmptyBuckets") == JBool(true)) grouped
      else (j \ "intervals") match {
        case JArray(ivSpecs) if ivSpecs.nonEmpty =>
          val arrays: Seq[Column] = ivSpecs.map(str).map { iv =>
            val parts = iv.split("/", 2)
            val st = lit(parts(0)).cast("timestamp")
            val en = lit(parts(1)).cast("timestamp")
            gran match {
              case NamedGran(g) =>
                val step =
                  if (g == "quarter") expr("INTERVAL 3 MONTH")
                  else expr(s"INTERVAL 1 ${g.toUpperCase(java.util.Locale.ROOT)}")
                sequence(date_trunc(g, st),
                  timestamp_millis(unix_millis(en) - 1), step)
              case FixedGran(d, o) =>
                val off = unix_millis(st) - o
                val b0 = off - pmod(off, lit(d)) + o
                transform(sequence(b0, unix_millis(en) - 1, lit(d)),
                  m => timestamp_millis(m))
              case AllGran => throw new IllegalStateException("unreachable")
            }
          }
          val buckets = spark.range(1)
            .select(explode(flatten(array(arrays: _*))).as("g_time"))
            .distinct()
          def aggTypeOf(a: JValue): (String, String) = {
            val name = (a \ "name") match {
              case JString(n) => n
              case _          => str(a \ "aggregator" \ "name")
            }
            val t = (a \ "type") match {
              case JString("filtered") => str(a \ "aggregator" \ "type")
              case JString(t0)         => t0
              case other => throw new IllegalArgumentException(s"bad agg type: $other")
            }
            name -> t
          }
          val fills: Map[String, Column] = ((j \ "aggregations") match {
            case JArray(as) => as
            case _          => Nil
          }).flatMap { a =>
            aggTypeOf(a) match {
              case (n, "count" | "longSum" | "cardinality" | "hyperUnique") =>
                Some(n -> lit(0L))
              case (n, "doubleSum") => Some(n -> lit(0.0))
              case _                => None
            }
          }.toMap
          val joined = buckets.join(grouped, Seq("g_time"), "left_outer")
          joined.select(grouped.columns.toSeq.map { c =>
            fills.get(c)
              .map(f => coalesce(org.apache.spark.sql.functions.col(c), f).as(c))
              .getOrElse(org.apache.spark.sql.functions.col(c))
          }: _*)
        case _ => grouped // interval-less timeseries: no bucket domain to fill
      }

    val postAgged = (j \ "postAggregations") match {
      case JArray(ps) => ps.foldLeft(filled)((d, p) =>
        d.withColumn(str(p \ "name"), postArithOf(p)))
      case JNothing => filled
      case other => throw new IllegalArgumentException(s"bad postAggregations: $other")
    }

    // HAVING (`HavingSpec`, `DruidQuerySpec.scala:458-476` — declared in
    // the reference IR but never reached from Catalyst; completed here):
    // comparisons on aggregation/post-aggregation names plus and/or/not.
    def havingOf(h: JValue): Column = (h \ "type") match {
      case JString("greaterThan") =>
        col(str(h \ "aggregation")) > lit(num(h \ "value", "having value"))
      case JString("lessThan") =>
        col(str(h \ "aggregation")) < lit(num(h \ "value", "having value"))
      case JString("equalTo") =>
        col(str(h \ "aggregation")) === lit(num(h \ "value", "having value"))
      case JString("and") | JString("or") =>
        val specs = (h \ "havingSpecs") match {
          case JArray(hs) => hs.map(havingOf)
          case other => throw new IllegalArgumentException(s"bad havingSpecs: $other")
        }
        if ((h \ "type") == JString("and")) specs.reduce(_ && _)
        else specs.reduce(_ || _)
      case JString("not") => !havingOf(h \ "havingSpec")
      case other => throw new IllegalArgumentException(s"unsupported having type $other")
    }
    val havinged = (j \ "having") match {
      case JNothing => postAgged
      case h        => postAgged.filter(havingOf(h))
    }

    queryType match {
      case "topN" =>
        // Druid topN: one dimension ranked by a TopNMetricSpec, `threshold`
        // rows. Ours is EXACT (TakeOrderedAndProject; SURVEY.md §2.6) — and
        // when the dimension carries a heavy-hitter sketch with proofs, the
        // aggregate itself serves from the lattice (RollupRouting.serveTopN).
        //
        // Metric spec forms (reference `DruidQuerySpec.scala:478-508`):
        //   "m"                                — numeric shorthand, desc
        //   {"type":"numeric","metric":"m"}    — metric desc
        //   {"type":"lexicographic"[,"previousStop":"v"]}
        //       — dimension asc, resuming strictly after `previousStop`
        //   {"type":"inverted","metric":<spec>} — reverse the nested order
        //       (bottomN for numeric; dim desc + previousStop upper bound
        //        for lexicographic — Druid's pagination in reverse)
        val threshold = (j \ "threshold") match {
          case JInt(n)    => n.toInt
          case JNothing   => throw new IllegalArgumentException("topN needs threshold")
          case other => throw new IllegalArgumentException(s"bad threshold: $other")
        }
        val dim = col(dimSpecs.head._2)
        def ordered(spec: JValue, inverted: Boolean): org.apache.spark.sql.DataFrame =
          spec match {
            case JString(m) =>
              val rank = if (inverted) col(m).asc else col(m).desc
              havinged.orderBy(rank, dim)
            case o if (o \ "type") == JString("numeric") =>
              ordered(JString(str(o \ "metric")), inverted)
            case o if (o \ "type") == JString("lexicographic") =>
              val resumed = (o \ "previousStop") match {
                case JString(stop) =>
                  if (inverted) havinged.filter(dim < lit(stop))
                  else havinged.filter(dim > lit(stop))
                case _ => havinged
              }
              resumed.orderBy(if (inverted) dim.desc else dim.asc)
            case o if (o \ "type") == JString("inverted") =>
              ordered(o \ "metric", !inverted)
            case other =>
              throw new IllegalArgumentException(
                s"unsupported topN metric spec: $other")
          }
        ordered(j \ "metric", inverted = false).limit(threshold)
      case _ =>
        // limitSpec (`DruidQuerySpec.scala:437-456`): order-by columns
        // (dimension or aggregation names, per-column direction) plus an
        // optional row limit — `TakeOrderedAndProjectExec` exactly.
        (j \ "limitSpec") match {
          case JNothing => havinged
          case ls =>
            val ordered = (ls \ "columns") match {
              case JArray(cs) if cs.nonEmpty =>
                havinged.orderBy(cs.map {
                  case JString(d) => col(d).asc
                  case o =>
                    val c = col(str(o \ "dimension"))
                    (o \ "direction") match {
                      case JString("descending") => c.desc
                      case JString("ascending") | JNothing => c.asc
                      case other => throw new IllegalArgumentException(
                        s"bad direction: $other")
                    }
                }: _*)
              case JNothing => havinged
              case other => throw new IllegalArgumentException(s"bad limit columns: $other")
            }
            (ls \ "limit") match {
              case JInt(n)  => ordered.limit(n.toInt)
              case JNothing => ordered
              case other => throw new IllegalArgumentException(s"bad limit: $other")
            }
        }
    }
  }
}
