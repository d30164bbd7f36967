package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All graft operators take a `sfDir` (e.g. /root/testdata/sf0.01) and read
  * the parquet tables lazily so Catalyst can push filters/projections into
  * the scan. At cluster scale the same loaders point at a partitioned
  * warehouse path; nothing else changes.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** The driver regenerates events.parquet between rounds and its `ts`
    * physical type has drifted twice already: TIMESTAMP(NANOS) (readable
    * only as a raw long under spark.sql.legacy.parquet.nanosAsLong=true),
    * then Timestamp(isAdjustedToUTC=false, micros), which Spark 4 infers
    * as TIMESTAMP_NTZ — and NTZ is not accepted by `unix_micros`, event-
    * time watermarks, or most time arithmetic downstream. Normalize every
    * shape to a plain microsecond TimestampType here so operators never
    * see the drift. The NTZ→TZ cast interprets the wall-clock in the
    * session timezone; every graft entry point (Verify/Bench/Scratch/
    * StreamBench/SparkSpec) pins spark.sql.session.timeZone=UTC, so the
    * stored micros are preserved bit-for-bit — same values DuckDB reads. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: ns→us truncation matches DuckDB
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"testdata schema drift: events.ts read as $other — " +
          "extend Tables.events normalization for this shape")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Every table by name (events via its normalizing loader). */
  val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    assertSchema(name, df)
    df
  }

  /** Pinned column contract per table. Values are the ACCEPTED
    * `DataType.simpleString` forms. Only events.ts gets the fully
    * permissive temporal set (`tsAny`, incl. TIMESTAMP(NANOS) read as
    * bigint under nanosAsLong) because only [[events]] has a
    * normalization path for every shape after the guard. o_orderdate /
    * l_shipdate are pinned to the shapes the queries are actually tested
    * against (naive micros → timestamp_ntz, plus timestamp, which under
    * the pinned UTC session compares AND renders identically). `date` is
    * deliberately NOT accepted (r9 verdict hygiene item): a date drift
    * would silently change interval arithmetic, output types, and ~20
    * plan fingerprints at once — like nanos-as-long it has no
    * normalization path here and must fail loudly at the source, not
    * surface as downstream replans. Everything else is exact. */
  private[graft] val Pinned: Map[String, Seq[(String, Set[String])]] = {
    val tsAny = Set("timestamp", "timestamp_ntz", "bigint", "date")
    val ts = Set("timestamp", "timestamp_ntz")
    Map(
      "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
      "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
        "n_regionkey" -> Set("int")),
      "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
        "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
        "c_mktsegment" -> Set("string")),
      "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
        "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
      "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
        "p_brand" -> Set("string"), "p_type" -> Set("string"),
        "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
      "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
        "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
        "o_orderdate" -> ts, "o_orderpriority" -> Set("string")),
      "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
        "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
        "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
        "l_discount" -> Set("double"), "l_tax" -> Set("double"),
        "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
        "l_shipdate" -> ts),
      "events" -> Seq("event_id" -> Set("bigint"), "ts" -> tsAny,
        "user_id" -> Set("bigint"), "event_type" -> Set("string"),
        "value" -> Set("double"), "props" -> Set("string")),
      "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
        "lang" -> Set("string"), "source" -> Set("string"),
        "n_chars" -> Set("bigint")),
      "embeddings" -> Seq("vec_id" -> Set("bigint"),
        "embedding" -> Set("array<float>"), "label" -> Set("int")),
    )
  }

  /** Fail LOUDLY (one named error at load time) when the driver-regenerated
    * testdata drifts from the pinned contract, instead of letting the drift
    * surface as N broken queries plus silent replans downstream (round 7:
    * an events.ts type flip broke 3 queries and re-planned 6 more with no
    * error at the source). `SPARK_GRAFT_SCHEMA_DRIFT=warn` downgrades to a
    * stderr warning for forensic runs against off-contract data. */
  private def assertSchema(name: String, df: DataFrame): Unit =
    Pinned.get(name).foreach { cols =>
      val actual = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
      val problems = cols.flatMap { case (c, ok) =>
        actual.get(c) match {
          case None => Some(s"$name.$c missing (have: ${df.columns.mkString(",")})")
          case Some(t) if !ok(t) =>
            Some(s"$name.$c read as $t, pinned ${ok.mkString("|")}")
          case _ => None
        }
      }
      if (problems.nonEmpty) {
        val msg = s"TESTDATA SCHEMA DRIFT: ${problems.mkString("; ")}"
        if (sys.env.get("SPARK_GRAFT_SCHEMA_DRIFT").contains("warn"))
          System.err.println(s"[tables] WARN $msg")
        else throw new IllegalStateException(
          s"$msg — update Tables.Pinned (and any normalization) deliberately")
      }
    }
}
