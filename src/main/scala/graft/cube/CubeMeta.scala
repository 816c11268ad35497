package graft.cube

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Cube-descriptor persistence: the full [[RegisteredCube]] (star schema,
  * column roles/mapping, functional deps, rollup lattice, table paths) as a
  * `_graft_cube.json` sidecar next to the materialized cube data.
  *
  * This completes the reference's datasource lifecycle
  * (`DefaultSource.createRelation`, `DefaultSource.scala:32-194`): there the
  * user re-declares the datasource options in every session; here
  * materialization writes the descriptor once and any later session attaches
  * with [[attach]] (or `REGISTER GRAFT CUBE FROM '<path>'`) — no re-declared
  * metadata, no re-scan (NDV/interval stats ride the existing
  * `_graft_stats.json`). On a shared 100 TB warehouse this is what makes a
  * cube a durable catalog object instead of a session-local registration.
  *
  * json4s (already on Spark's classpath) does the serialization; mapping is
  * hand-written both ways so the sealed-trait roles and the composite
  * columnMapping key stay explicit and stable.
  */
object CubeMeta {

  val SidecarName = "_graft_cube.json"

  private def roleToJ(r: ColumnRole): JValue = JString(r.toString)
  private def roleOf(s: String): ColumnRole = s match {
    case "Time"      => ColumnRole.Time
    case "Dimension" => ColumnRole.Dimension
    case "Metric"    => ColumnRole.Metric
    case other       => throw new IllegalArgumentException(s"bad role $other")
  }
  private def relToJ(r: RelType): JValue = JString(r.toString)
  private def relOf(s: String): RelType = s match {
    case "OneToOne"  => RelType.OneToOne
    case "ManyToOne" => RelType.ManyToOne
    case other       => throw new IllegalArgumentException(s"bad relType $other")
  }
  private def strMap(m: Map[String, String]): JValue =
    JObject(m.toSeq.sortBy(_._1).map { case (k, v) => k -> JString(v) }.toList)

  def toJson(cube: RegisteredCube): String = {
    val info = cube.info
    val j = JObject(
      "name" -> JString(info.name),
      "timeColumn" -> JString(info.timeColumn),
      "timeBucketColumn" -> JString(info.timeBucketColumn),
      "maxResultCardinality" -> JLong(info.maxResultCardinality),
      "timeIntervalMicros" -> info.timeIntervalMicros.map { case (lo, hi) =>
        JArray(List(JLong(lo), JLong(hi))) }.getOrElse(JNull),
      "timeDayQuantized" -> JBool(info.timeDayQuantized),
      "timeNullFree" -> JBool(info.timeNullFree),
      "clusterDims" -> JArray(
        info.clusterDims.map(JString(_): JValue).toList),
      "timeCorrelatedColumns" -> JArray(
        info.timeCorrelatedColumns.map(JString(_): JValue).toList),
      "timeLagBounds" -> JObject(info.timeLagBounds.toSeq.sortBy(_._1).map {
        case (c, (lo, hi)) => c -> JArray(List(JLong(lo), JLong(hi))) }.toList),
      "columns" -> JArray(info.columns.map(c => JObject(
        "name" -> JString(c.name), "role" -> roleToJ(c.role),
        "cardinality" -> c.cardinality.map(JLong(_): JValue).getOrElse(JNull))).toList),
      "star" -> JObject(
        "fact" -> JString(info.starSchema.factTable),
        "relations" -> JArray(info.starSchema.relations.map(r => JObject(
          "left" -> JString(r.leftTable), "right" -> JString(r.rightTable),
          "rel" -> relToJ(r.relType),
          "on" -> JArray(r.joinCondition.map(c =>
            JArray(List(JString(c.leftCol), JString(c.rightCol)))).toList))).toList)),
      "roleOfTable" -> JObject(info.roleOfTable.toSeq.sortBy(_._1).map {
        case (t, roles) => t -> JArray(roles.map(JString(_): JValue).toList) }.toList),
      "columnMapping" -> JArray(info.columnMapping.toSeq
        .sortBy { case ((r, s), _) => (r, s) }
        .map { case ((role, src), dst) =>
          JArray(List(JString(role), JString(src), JString(dst))) }.toList),
      "functionalDeps" -> JArray(info.functionalDeps.map(d =>
        JArray(List(JString(d.from), JString(d.to), relToJ(d.relType)))).toList),
      "cubePath" -> JString(cube.cubePath),
      "tablePaths" -> strMap(cube.tablePaths),
      "rollups" -> JArray(cube.rollups.map(r => JObject(
        "path" -> JString(r.path),
        "dims" -> JArray(r.dims.map(JString(_): JValue).toList),
        "timeBucketColumn" -> JString(r.timeBucketColumn),
        "countColumn" -> JString(r.countColumn),
        "sums" -> strMap(r.sums), "mins" -> strMap(r.mins),
        "maxs" -> strMap(r.maxs), "kmvSketches" -> strMap(r.kmvSketches),
        "hllSketches" -> strMap(r.hllSketches),
        "kmvK" -> JInt(r.kmvK),
        "kmvExactNdv" -> JObject(r.kmvExactNdv.toSeq.sortBy(_._1).map {
          case (k, v) => k -> JLong(v) }.toList),
        "derivedSums" -> strMap(r.derivedSums),
        "grain" -> JString(r.grain),
        "quantileSketches" -> strMap(r.quantileSketches),
        "quantileK" -> JInt(r.quantileK),
        "freqSketches" -> strMap(r.freqSketches),
        "freqK" -> JInt(r.freqK),
        "exactNullCount" -> JObject(r.exactNullCount.toSeq.sortBy(_._1).map {
          case (k, v) => k -> JLong(v) }.toList),
        "freqWeighted" -> JArray(r.freqWeighted.map { case (d, w, c) =>
          JArray(List(JString(d), JString(w), JString(c))) }.toList),
        "totalRows" -> r.totalRows.map(JLong(_): JValue).getOrElse(JNull),
        "timeColumn" -> r.timeColumn.map(JString(_): JValue).getOrElse(JNull),
        "partitionDims" -> JArray(r.partitionDims.map(JString(_): JValue).toList),
        "clusterDims" -> JArray(r.clusterDims.map(JString(_): JValue).toList))).toList))
    JsonMethods.pretty(JsonMethods.render(j))
  }

  def fromJson(txt: String): RegisteredCube = {
    val j = JsonMethods.parse(txt)
    def str(v: JValue): String = v match { case JString(s) => s; case o => o.values.toString }
    def lng(v: JValue): Long = v match {
      case JLong(n) => n; case JInt(n) => n.toLong
      case o => o.values.toString.toLong
    }
    def arr(v: JValue): List[JValue] = v match { case JArray(xs) => xs; case _ => Nil }
    def obj(v: JValue): List[(String, JValue)] = v match { case JObject(fs) => fs; case _ => Nil }
    def sMap(v: JValue): Map[String, String] =
      obj(v).map { case (k, x) => k -> str(x) }.toMap

    val star = j \ "star"
    val info = CubeInfo(
      name = str(j \ "name"),
      timeColumn = str(j \ "timeColumn"),
      columns = arr(j \ "columns").map { c =>
        CubeColumn(str(c \ "name"), roleOf(str(c \ "role")),
          c \ "cardinality" match { case JNull | JNothing => None; case v => Some(lng(v)) })
      },
      starSchema = StarSchema(
        factTable = str(star \ "fact"),
        relations = arr(star \ "relations").map { r =>
          StarRelation(str(r \ "left"), str(r \ "right"), relOf(str(r \ "rel")),
            arr(r \ "on").map { p =>
              val List(l, rr) = arr(p)
              EqualityCondition(str(l), str(rr))
            })
        }),
      roleOfTable = obj(j \ "roleOfTable").map { case (t, roles) =>
        t -> arr(roles).map(str) }.toMap,
      columnMapping = arr(j \ "columnMapping").map { m =>
        val List(role, src, dst) = arr(m)
        (str(role), str(src)) -> str(dst)
      }.toMap,
      functionalDeps = arr(j \ "functionalDeps").map { d =>
        val List(from, to, rel) = arr(d)
        FunctionalDependency(str(from), str(to), relOf(str(rel)))
      },
      maxResultCardinality = lng(j \ "maxResultCardinality"),
      timeBucketColumn = str(j \ "timeBucketColumn"),
      timeIntervalMicros = j \ "timeIntervalMicros" match {
        case JArray(List(lo, hi)) => Some((lng(lo), lng(hi)))
        case _                    => None
      },
      timeDayQuantized = (j \ "timeDayQuantized") == JBool(true),
      timeNullFree = (j \ "timeNullFree") == JBool(true),
      clusterDims = j \ "clusterDims" match {
        case JNull | JNothing => Nil
        case v                => arr(v).map(str)
      },
      timeCorrelatedColumns = arr(j \ "timeCorrelatedColumns").map(str),
      timeLagBounds = obj(j \ "timeLagBounds").flatMap { case (c, v) =>
        // A malformed entry (hand-edited sidecar) drops that column's lag
        // bounds — correlation pruning quietly disables — instead of failing
        // the whole cube registration with a MatchError.
        arr(v) match {
          case List(lo, hi) => Some(c -> ((lng(lo), lng(hi))))
          case _            => None
        }
      }.toMap)
    RegisteredCube(
      info = info,
      cubePath = str(j \ "cubePath"),
      tablePaths = sMap(j \ "tablePaths"),
      rollups = arr(j \ "rollups").map { r =>
        RollupMeta(
          path = str(r \ "path"),
          dims = arr(r \ "dims").map(str),
          timeBucketColumn = str(r \ "timeBucketColumn"),
          countColumn = str(r \ "countColumn"),
          sums = sMap(r \ "sums"), mins = sMap(r \ "mins"),
          maxs = sMap(r \ "maxs"), kmvSketches = sMap(r \ "kmvSketches"),
          hllSketches = sMap(r \ "hllSketches"),
          kmvK = lng(r \ "kmvK").toInt,
          kmvExactNdv = obj(r \ "kmvExactNdv").map { case (k, v) => k -> lng(v) }.toMap,
          derivedSums = sMap(r \ "derivedSums"),
          grain = str(r \ "grain"),
          quantileSketches = sMap(r \ "quantileSketches"),
          quantileK = r \ "quantileK" match {
            case JNull | JNothing => org.apache.spark.sql.graft.QuantileSketch.DefaultK
            case v                => lng(v).toInt
          },
          freqSketches = sMap(r \ "freqSketches"),
          freqK = r \ "freqK" match {
            case JNull | JNothing => org.apache.spark.sql.graft.FreqSketch.DefaultK
            case v                => lng(v).toInt
          },
          exactNullCount = obj(r \ "exactNullCount").map {
            case (k, v) => k -> lng(v) }.toMap,
          freqWeighted = arr(r \ "freqWeighted").map { t =>
            val List(d, w, c) = arr(t)
            (str(d), str(w), str(c))
          },
          totalRows = r \ "totalRows" match {
            case JNull | JNothing => None
            case v                => Some(lng(v))
          },
          timeColumn = r \ "timeColumn" match {
            case JNull | JNothing => None
            case v                => Some(str(v))
          },
          partitionDims = r \ "partitionDims" match {
            case JNull | JNothing => Nil
            case v                => arr(v).map(str)
          },
          clusterDims = r \ "clusterDims" match {
            case JNull | JNothing => Nil
            case v                => arr(v).map(str)
          })
      })
  }

  /** Persist the descriptor sidecar under the cube's path. */
  def save(cube: RegisteredCube): Unit = {
    val f = new java.io.File(cube.cubePath, SidecarName)
    java.nio.file.Files.write(f.toPath, toJson(cube).getBytes("UTF-8"))
    ()
  }

  /** Read a descriptor from a materialized cube directory, if present.
    * The path is resolved to its CURRENT generation first
    * ([[CubeGenerations]]): the descriptor inside each generation names
    * THAT generation's cube + node paths, so a loader following the
    * pointer always gets one internally-consistent set — never a fresh
    * cube with stale nodes, whatever instant a refresh publishes at.
    */
  def load(cubePath: String): Option[RegisteredCube] = {
    val f = new java.io.File(CubeGenerations.currentDir(cubePath), SidecarName)
    if (!f.exists()) None
    else Some(fromJson(new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
  }

  /** Attach a previously materialized cube to this session from its
    * descriptor sidecar alone — the durable-catalog counterpart of
    * `CubeSource.materialize` (no metadata re-declaration, no stats
    * re-scan).
    */
  def attach(spark: org.apache.spark.sql.SparkSession, cubePath: String): RegisteredCube = {
    val cube = load(cubePath).getOrElse(throw new IllegalArgumentException(
      s"no $SidecarName under $cubePath — materialize the cube first"))
    CubeCatalog.register(cube)
    cube
  }
}
