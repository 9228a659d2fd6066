package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** AsOfJoin vs a naive per-row reference on random data — the union+window
  * algorithm must agree with the obvious O(n·m) definition everywhere,
  * including simultaneous timestamps and tolerance cutoffs. */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  test("random data: as-of join equals the naive definition") {
    val rnd = new Random(11)
    val lefts = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(100).toLong))
    val rights = (1 to 200).map(i =>
      (rnd.nextInt(5).toLong, 1000L + i, rnd.nextInt(100).toLong, rnd.nextDouble()))

    for (tol <- Seq(None, Some(7L), Some(0L))) {
      val got = AsOfJoin.join(
          lefts.toDF("user_id", "l_id", "ts"),
          rights.toDF("user_id", "r_id", "ts", "amount"),
          Seq("user_id"), "ts", "ts", Seq("r_id"),
          tolerance = tol, rightTiebreak = Some("r_id"))
        .select("l_id", "r_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap

      val naive = lefts.map { case (u, lid, lts) =>
        val candidates = rights.filter { case (ru, _, rts, _) =>
          ru == u && rts <= lts && tol.forall(t => lts - rts <= t)
        }
        lid -> (if (candidates.isEmpty) None
                else Some(candidates.maxBy(c => (c._3, c._2))._2))
      }.toMap

      assert(got == naive, s"tolerance=$tol")
    }
  }
}
