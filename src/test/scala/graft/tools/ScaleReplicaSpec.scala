package graft.tools

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sf1-equivalent replica builder is the INSTRUMENT behind the
  * committed second-decade scale evidence (`SCALE_PROBE_r<N>.json`,
  * `data_factor_100`), so its invariants are locked like any operator:
  * a broken perturbation would silently turn the probe into a
  * measurement of replication artifacts (10× exact-duplicate groups,
  * identical vectors colliding in every LSH bucket) instead of
  * fresh-data scaling.
  */
class ScaleReplicaSpec extends AnyFunSuite {
  import graft.TestSpark._

  private val src = "/root/testdata/sf0.001"
  private lazy val dst = ScaleProbe.ensureSf1Equivalent(spark, src)
  private val Off = ScaleProbe.ReplicaOff

  test("replica has exactly 10x rows with unique re-keyed ids") {
    for ((t, id) <- Seq(("documents", "doc_id"), ("embeddings", "vec_id"),
        ("events", "event_id"))) {
      val n0 = spark.read.parquet(s"$src/$t.parquet").count()
      val r = spark.read.parquet(s"$dst/$t.parquet")
      assert(r.count() == 10 * n0, s"$t rows")
      assert(r.select(id).distinct().count() == 10 * n0, s"$t id uniqueness")
    }
  }

  test("text perturbation preserves length and within-copy duplicate structure") {
    val docs = spark.read.parquet(s"$dst/documents.parquet")
      .withColumn("g_copy", (col("doc_id") / Off).cast("int"))
    // translate is a per-copy character bijection: distinct-text count and
    // total text length per copy must equal copy 0's — same duplicate
    // groups, same shingle volume, different shingle VALUES
    val perCopy = docs.groupBy("g_copy")
      .agg(countDistinct(col("text")).as("nd"),
        sum(length(col("text"))).as("len"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perCopy.size == 10)
    assert(perCopy.values.toSet.size == 1,
      s"copies diverge in duplicate structure or length: $perCopy")
    // and every perturbed copy really differs from copy 0 on a doc whose
    // text carries rotated characters (pick the first Latin-bearing doc,
    // not a hardcoded id — the generator owes us no alphabet per doc)
    val latinId = docs
      .filter(col("g_copy") === 0 && col("text").rlike("[A-Za-z]"))
      .agg(min(col("doc_id"))).head().getLong(0)
    val texts = docs
      .filter(pmod(col("doc_id"), lit(Off)) === latinId)
      .select("g_copy", "text").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(texts.size == 10)
    for (k <- 1 to 9)
      assert(texts(k) != texts(0), s"copy $k text identical to copy 0")
  }

  test("vector jitter is bounded by 0.1 per element and nonzero in every copy") {
    val e = spark.read.parquet(s"$dst/embeddings.parquet")
    val c0 = e.filter(col("vec_id") < Off)
      .select(col("vec_id").as("g_id"), col("embedding").as("g_e0"))
    // check ALL nine perturbed copies, not just copy 1: a rotation or
    // hash-seed bug affecting only later copies must fail here
    val ck = e.filter(col("vec_id") >= Off)
      .select(pmod(col("vec_id"), lit(Off)).as("g_id"),
        (col("vec_id") / Off).cast("int").as("g_copy"),
        col("embedding").as("g_ek"))
    val d = c0.join(ck, "g_id")
      .select(col("g_copy"), aggregate(zip_with(col("g_e0"), col("g_ek"),
          (a, b) => abs(a - b)), lit(0.0f), (acc, x) => greatest(acc, x))
        .as("g_max"))
      .groupBy("g_copy")
      .agg(max(col("g_max")).as("mx"), min(col("g_max")).as("mn"))
      .collect()
    assert(d.length == 9)
    d.foreach { r =>
      assert(r.getFloat(1) <= 0.1001f,
        s"copy ${r.getInt(0)} jitter exceeds bound: ${r.getFloat(1)}")
      assert(r.getFloat(2) > 0f,
        s"copy ${r.getInt(0)} jitter absent — identical vectors")
    }
  }

  test("event copies are fresh cohorts: disjoint user ids, equal sizes") {
    val ev = spark.read.parquet(s"$dst/events.parquet")
      .withColumn("g_copy", (col("event_id") / Off).cast("int"))
    val users = ev.groupBy("g_copy")
      .agg(countDistinct(col("user_id")).as("nu"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(users.length == 10 && users.map(_._2).toSet.size == 1 &&
      users.map(_._3).toSet.size == 1, users.mkString(", "))
    val total = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(total == users.map(_._2).sum, "user cohorts overlap across copies")
  }

  test("decade-3 replica: 100 pairwise-distinct per-copy transforms, structure preserved") {
    // the instrument behind data_factor_1000 (rising-trio third decade):
    // documents-only, 10x the sf1-equivalent, per-copy keyed alphabet
    // substitution composed over the decade-2 rotation
    val dst10 = ScaleProbe.ensureSf10Equivalent(spark, src, dst)
    val docs = spark.read.parquet(s"$dst10/documents.parquet")
    val n0 = spark.read.parquet(s"$src/documents.parquet").count()
    assert(docs.count() == 100 * n0, "rows")
    assert(docs.select("doc_id").distinct().count() == 100 * n0, "ids")
    // composite copy index 0..99: doc_id = orig + (k + 10*j) * Off
    val per = docs
      .withColumn("g_copy", (col("doc_id") / Off).cast("int"))
      .groupBy("g_copy")
      .agg(countDistinct(col("text")).as("nd"),
        sum(length(col("text"))).as("len"),
        // decimal: a long sum of 64-bit hashes overflows under ANSI
        sum(xxhash64(col("text")).cast("decimal(38,0)")).as("fp"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).toString))
    assert(per.length == 100)
    // each copy is a character bijection of the base: same distinct-text
    // count (duplicate groups) and total length (shingle volume)
    assert(per.map(t => (t._2, t._3)).toSet.size == 1,
      "a copy diverges in duplicate structure or length")
    // and no two copies are the SAME bijection: corpus-wide content
    // fingerprints must be pairwise distinct (a collision would hand the
    // probe exact cross-copy duplicates — the pathology the composite-
    // distinctness require in the builder exists to prevent)
    assert(per.map(_._4).toSet.size == 100,
      "two copies share a corpus fingerprint — composite transforms collided")
  }

  test("alphaPerm is a real permutation of the alphabet, distinct per seed") {
    val az = "abcdefghijklmnopqrstuvwxyz"
    val perms = (1 to 9).map(ScaleProbe.alphaPerm)
    perms.foreach(p => assert(p.sorted == az && p != az, p))
    assert(perms.distinct.size == 9)
  }

  test("rebuild is idempotent and keyed to the source dir") {
    val again = ScaleProbe.ensureSf1Equivalent(spark, src)
    assert(again == dst)
    assert(new java.io.File(dst, "_REPLICATED_OK").exists())
    assert(new java.io.File(dst).getName
      .startsWith("scale_sf1x_sf0.001_"))
  }
}
