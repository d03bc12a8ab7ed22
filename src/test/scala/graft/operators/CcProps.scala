package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property coverage for the connected-components formulations: on random
  * bipartite membership graphs, [[Dedup.membershipComponents]] must equal
  * a plain driver-side union-find over the implied pair graph. Trials are
  * deliberately few (each runs a full Spark fixpoint loop) but the
  * generator covers the structural corner cases a fixed seed might miss:
  * singleton buckets, multi-membership nodes, and bucket chains.
  */
object CcProps extends Properties("cc") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  /** Driver-side union-find over the bucket-implied connectivity. */
  private def reference(m: Seq[(Int, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    m.groupBy(_._1).values.foreach { grp =>
      val nodes = grp.map(_._2).distinct
      nodes.sliding(2).foreach {
        case Seq(a, b) => union(a, b)
        case _         => ()
      }
    }
    // min-id canonical labels, restricted to nodes in ≥2-member buckets
    val connected = m.groupBy(_._1).values
      .filter(_.map(_._2).distinct.size >= 2)
      .flatMap(_.map(_._2)).toSet
    connected.map(n => n -> find(n)).toMap
  }

  private val membershipGen: Gen[Seq[(Int, Long)]] =
    for {
      nBuckets <- Gen.chooseNum(1, 12)
      nNodes <- Gen.chooseNum(1, 30)
      nRows <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(nRows, for {
        b <- Gen.chooseNum(0, nBuckets - 1)
        n <- Gen.chooseNum(0L, nNodes - 1L)
      } yield (b, n))
    } yield rows.distinct

  property("membership components == driver union-find on the implied pair graph") =
    Prop.forAll(membershipGen) { m =>
      import spark.implicits._
      val got = Dedup.membershipComponents(m.toDF("bucket", "node"), Seq("bucket"), "node")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = reference(m)
      if (got != want) {
        println(s"memberships: $m\ngot:  ${got.toSeq.sorted}\nwant: ${want.toSeq.sorted}")
      }
      got == want
    }
}
