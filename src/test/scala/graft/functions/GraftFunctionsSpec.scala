package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions, and the DotProduct
  * parity contract: `exact=true` must be bit-identical to the
  * zip_with+aggregate DECIMAL(28,14) fold it replaced (the formulation the
  * DuckDB oracle replays), `exact=false` to the plain double fold.
  */
class GraftFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  test("register() makes portable_hash60 / ddot / fdot SQL-callable") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  portable_hash60('abc') AS h,
        |  ddot(array(cast(0.5 as float), cast(-1.25 as float)),
        |       array(cast(2.0 as float), cast(4.0 as float))) AS d,
        |  fdot(array(cast(0.5 as float), cast(-1.25 as float)),
        |       array(cast(2.0 as float), cast(4.0 as float))) AS f
        |""".stripMargin).collect().head
    assert(row.getLong(0) == PortableHash60.hash("abc".getBytes("UTF-8")))
    assert(row.getDouble(1) == 1.0 - 5.0)
    assert(row.getDouble(2) == 1.0 - 5.0)
  }

  test("register() makes the round-8 aggregates and bloom natives SQL-callable") {
    GraftFunctions.register(spark)
    // aggregates: the registry hands the analyzer the raw AggregateFunction
    val agg = spark.sql(
      """SELECT g,
        |  bounded_top_k(v, id, 2) AS tk,
        |  mg_sketch(w, 2) AS mg
        |FROM VALUES ('a', 3.0D, 1L, 'x'), ('a', 1.0D, 2L, 'x'), ('a', 2.0D, 3L, 'y')
        |  t(g, v, id, w)
        |GROUP BY g""".stripMargin).collect().head
    assert(agg.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) == Seq(1L, 3L))
    assert(agg.getSeq[org.apache.spark.sql.Row](2).map(_.getString(0)).contains("x"))
    // bloom: positions feed bitset_or, bloom_count finds the member
    val bloom = spark.sql(
      """WITH bits AS (
        |  SELECT bitset_or(pos, 4096) AS b
        |  FROM (SELECT explode(bloom_positions(42L, 4096, 3)) AS pos))
        |SELECT bloom_count(b, array(42L), 4096, 3) AS hit,
        |       bloom_count(b, array(43L), 4096, 3) AS miss
        |FROM bits""".stripMargin).collect().head
    assert(bloom.getLong(0) == 1L && bloom.getLong(1) == 0L)
    // static params must be literals — clear error otherwise
    val err = intercept[Exception] {
      spark.sql("SELECT mg_sketch(w, CAST(id AS INT)) FROM VALUES ('x', 1) t(w, id) GROUP BY 1")
        .collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      Option(err.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("native exact dot == the true decimal sum (DuckDB's SUM semantics); lambda fold agrees at 6dp") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      (i.toLong, a, b)
    }
    // driver-side reference: quantize each exact float product to 14dp
    // through the shortest decimal representation, sum exactly — this is
    // what DuckDB's SUM over DECIMAL(28,14) computes, and what the
    // oracle-hashed ANN results are built from
    def refDot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        new java.math.BigDecimal(java.lang.Double.toString(x.toDouble * y.toDouble))
          .setScale(14, java.math.RoundingMode.HALF_UP)
      }.foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue()
    val expected = rows.map { case (id, a, b) => id -> refDot(a, b) }.toMap

    // the zip_with+aggregate fold this expression replaced is NOT exact:
    // Catalyst's Add(DECIMAL(38,14), DECIMAL(28,14)) needs precision 39,
    // so the precision-loss rule rounds every intermediate sum to scale
    // 13 — it only agreed with DuckDB after round(6). The native version
    // is the true order-independent decimal sum.
    val lambdaDdot = aggregate(
      zip_with($"a", $"b", (x, y) => (x.cast("double") * y.cast("double")).cast(DecimalType(28, 14))),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 14)),
      (acc, x) => (acc + x).cast(DecimalType(38, 14))).cast("double")
    val lambdaFdot = aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val out = rows.toDF("id", "a", "b").select(
      $"id",
      DotProduct.ddot($"a", $"b").as("nd"), lambdaDdot.as("ld"),
      DotProduct.fdot($"a", $"b").as("nf"), lambdaFdot.as("lf"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(1) == expected(r.getLong(0)), s"native != reference for ${r.getLong(0)}")
      assert(math.rint(r.getDouble(1) * 1e6) == math.rint(r.getDouble(2) * 1e6),
        s"lambda fold disagrees beyond 6dp for ${r.getLong(0)}")
      assert(r.getDouble(3) == r.getDouble(4), s"fast fold differs for ${r.getLong(0)}")
    }
  }

  test("null array propagates; squared norm via ddot(a, a)") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(3.0f, 4.0f))), (2L, None)
    ).toDF("id", "a")
    val out = df.select($"id", DotProduct.ddot($"a", $"a").as("nn"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getDouble(1) == 25.0)
    assert(out(1).isNullAt(1))
  }

  test("fixed-point dsum is bit-identical to the decimal-sum formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // adversarial mix: exact cents, long decimal tails, negatives, zeros,
    // half-up boundary values (x.xx5), large magnitudes
    val values = Seq.tabulate(4000) { i =>
      val base = rng.nextInt(5) match {
        case 0 => rng.nextInt(2000000) / 100.0
        case 1 => rng.nextDouble() * 1e6
        case 2 => -rng.nextDouble() * 1e5
        case 3 => (rng.nextInt(100000) * 10 + 5) / 1000.0 // …x5 at 3dp
        case _ => 0.0
      }
      (i.toLong % 7, base)
    }
    val df = values.toDF("g", "v")
    for (scale <- Seq(2, 4)) {
      val pow = math.pow(10.0, scale)
      val fixed = df.groupBy($"g")
        .agg((sum(DecScaledLong.decScaledLong($"v", scale)).cast("double") / pow).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val dec = df.groupBy($"g")
        .agg(sum($"v".cast(DecimalType(28, scale))).cast("double").as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(fixed == dec, s"fixed-point/decimal divergence at scale $scale")
    }
    // per-row quantization matches Spark's double→decimal cast exactly
    val rows = df.select($"v",
      DecScaledLong.decScaledLong($"v", 2).as("q"),
      ($"v".cast(DecimalType(18, 2)) * 100).cast("long").as("c")).collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"row ${r.getDouble(0)}"))
  }

  test("dec_scaled_long nulls non-finite and >18-digit inputs like the decimal cast") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    // the NULL contract matches cast(DECIMAL(18,2)) under NON-ANSI
    // semantics (ANSI casts throw instead — exactly the failure mode this
    // guard exists to avoid): > 18 quantized digits or non-finite → null
    val bad = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      1e17, -1e17, 9.99e16) // at scale 2: unscaled ≥ 10^18 → precision > 18
    val ok = Seq(0.0, -12.345, 9.99e15, 1e15)
    val out = (bad.map(("bad", _)) ++ ok.map(("ok", _))).toDF("kind", "v")
      .select($"kind", DecScaledLong.decScaledLong($"v", 2).as("q")).collect()
    out.foreach { r =>
      assert(r.isNullAt(1) == (r.getString(0) == "bad"),
        s"wrong nullness for ${r.getString(0)} input")
    }
    // interpreted eval path agrees with codegen
    assert(FixedPointOps.scaledLongOrNull(Double.NaN, 2) == null)
    assert(FixedPointOps.scaledLongOrNull(1e17, 2) == null)
    assert(FixedPointOps.scaledLongOrNull(-12.345, 2) == -1235L) // HALF_UP away from zero
  }

  test("repetition_stats counts exactly; <2 tokens → null; codegen == interpreted") {
    import spark.implicits._
    val rows = Seq(
      "a b a b a",       // grams: (a b)x2 (b a)x2 → n=4, distinct=2, top=2
      "x y z",           // all distinct → n=2, distinct=2, top=1
      "w w w w",         // (w w)x3 → n=3, distinct=1, top=3
      "solo",            // <2 tokens → null
      "")                // split("") = [""] → 1 token → null
      .toDF("text")
      .select(ShingleFunctions.repetitionStats(split($"text", " ")).as("rs"))
      .collect()
    assert(rows(0).getSeq[Long](0) == Seq(4L, 2L, 2L))
    assert(rows(1).getSeq[Long](0) == Seq(2L, 2L, 1L))
    assert(rows(2).getSeq[Long](0) == Seq(3L, 1L, 3L))
    assert(rows(3).isNullAt(0) && rows(4).isNullAt(0))
    // interpreted path (no codegen) agrees
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(
      Array("a", "b", "a", "b", "a").map(UTF8String.fromString(_): Any))
    assert(ShingleOps.repetitionStats(arr).toLongArray().toSeq == Seq(4L, 2L, 2L))
  }

  test("repetition_stats matches a sliding-window replay on 200 random token arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "ab", "", "ü", "xx") // repeats, empty, unicode
    (1 to 200).foreach { trial =>
      val toks = Vector.fill(rng.nextInt(12))(alphabet(rng.nextInt(alphabet.size)))
      val arr = new GenericArrayData(toks.map(UTF8String.fromString(_): Any).toArray)
      val got = Option(ShingleOps.repetitionStats(arr)).map(_.toLongArray().toSeq)
      val expected = if (toks.length < 2) None else {
        val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size)
        Some(Seq(grams.size.toLong, counts.size.toLong, counts.values.max.toLong))
      }
      assert(got == expected, s"trial $trial tokens $toks")
    }
  }

  test("dsum overflow canary raises instead of wrapping silently") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Under ANSI (the session default) a 64-bit sum overflow already raises
    // in the agg buffer itself; the canary exists for NON-ANSI deployments,
    // where the same sum wraps silently — exercise that path explicitly.
    // 200 rows of 1e15 at scale 2 → count·max|unscaled| = 2e19 > 2^63 bound
    val hot = Seq.fill(200)(("g", 1e15)).toDF("g", "v")
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val ex = intercept[Exception] {
        hot.groupBy($"g").agg(graft.operators.Relational.dsum($"v")).collect()
      }
      assert(messages(ex).exists(_.contains("dsum overflow canary")), ex.toString)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    // and under ANSI the overflow is still a visible error, never silence
    val ansiEx = intercept[Exception] {
      hot.groupBy($"g").agg(graft.operators.Relational.dsum($"v")).collect()
    }
    assert(messages(ansiEx).exists(m =>
      m.contains("dsum overflow canary") || m.contains("ARITHMETIC_OVERFLOW")), ansiEx.toString)
    // a safe group of the same shape still matches the decimal formulation
    val safe = Seq.tabulate(200)(i => ("g", i * 1.01)).toDF("g", "v")
    val viaFixed = safe.groupBy($"g")
      .agg(graft.operators.Relational.dsum($"v").as("s")).collect()(0).getDouble(1)
    val viaDec = safe.groupBy($"g")
      .agg(sum($"v".cast(org.apache.spark.sql.types.DecimalType(28, 2)))
        .cast("double").as("s")).collect()(0).getDouble(1)
    assert(viaFixed == viaDec)
  }

  test("scaled-long exact dot == BigDecimal reference across magnitudes and boundary values") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // the round-9 fast path replaces a per-element BigDecimal parse with a
    // scaled-long digit shift; this differential test hammers the branch
    // structure: shift>=0 (big values), small drops, >=19-digit drops
    // (tiny values), exact .5 half-up boundaries, subnormals, the
    // NeedsBig overflow fallback, and double-element (centroid) arrays
    def refDot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) =>
        new java.math.BigDecimal(java.lang.Double.toString(x * y))
          .setScale(14, java.math.RoundingMode.HALF_UP)
      }.foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue()
    def run(a: Array[Double], b: Array[Double]): Unit = {
      val got = DotOps.exact(new GenericArrayData(a), new GenericArrayData(b),
        aDbl = true, bDbl = true)
      val exp = refDot(a, b)
      assert(got == exp,
        s"exact dot ${got} != reference ${exp} for ${a.take(4).mkString(",")}...")
    }
    val rnd = new scala.util.Random(7)
    // magnitude sweep: products span 1e-22 .. 1e8
    for (e <- -11 to 4; _ <- 1 to 40) {
      val a = Array.fill(16)((rnd.nextDouble() * 2 - 1) * math.pow(10, e))
      val b = Array.fill(16)((rnd.nextDouble() * 2 - 1) * math.pow(10, rnd.nextInt(5) - 2))
      run(a, b)
    }
    // adversarial singles: exact half-up boundaries, powers of ten,
    // subnormals, values straddling the drop>=19 cutoff
    val singles = Array(0.0, -0.0, 5e-15, -5e-15, 4.999999999999999e-15,
      1.5e-14, 2.5e-14, -2.5e-14, 1e-14, 1e-13, 1e14, -1e14, 1.23456789e-7,
      java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE,
      3.141592653589793, 1e-300, 89999.0, -89999.0, 0.1, 0.2, 0.3, 1.0 / 3.0)
    for (x <- singles; y <- singles) run(Array(x), Array(y))
    // overflow fallback: products near and beyond the long-scaled bound
    run(Array(3e5, 3e5), Array(3e5, -3e5))
    run(Array(1e9), Array(1e9))
    run(Array.fill(64)(9e4), Array.fill(64)(1.0))
    // r16 fast-path seam: the zero-allocation floor(y)+guard path decides
    // everything except boundary-adjacent values, which must fall back to
    // the string parse. Hammer exact k+0.5 half-up boundaries at scale 14
    // (both signs), values a few ulps either side of them, and the
    // |y| ≈ 2^52 cap where the margin swamps the fraction
    for (k <- 0 to 400) {
      val h = (2 * k + 1) * 0.5e-14 // D(h)·1e14 lands on or near k+0.5
      run(Array(h), Array(1.0)); run(Array(-h), Array(1.0))
      run(Array(math.nextUp(h)), Array(1.0))
      run(Array(math.nextDown(h)), Array(1.0))
    }
    for (m <- Seq(4.4e15, 4.5e15, 4.6e15, 5.0e14, 4.9e14)) {
      run(Array(m / 1e14), Array(1.0)) // straddles the 2^52 fast-path cap
      run(Array(-(m / 1e14)), Array(1.0))
    }
  }
}
