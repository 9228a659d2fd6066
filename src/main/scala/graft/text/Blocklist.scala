package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dictionary blocklist scan — the C4/RefinedWeb "bad words" filter as a
  * first-class curation operator. A single Aho-Corasick pass per
  * document matches EVERY pattern of the dictionary simultaneously:
  * O(len + matches) per doc regardless of dictionary size, vs the
  * P-passes-per-doc cost of a `contains` per pattern. At 100 TB the
  * automaton is built once from the (small, driver-held) dictionary and
  * shipped in the task closure — a pure map stage, no shuffle, no join.
  *
  * Semantics: `n_hits` counts ALL occurrences (overlapping included —
  * the automaton's output chain), `n_patterns` counts distinct
  * dictionary entries present, `blocked = n_hits > 0`. The q177 oracle
  * replays both via `replace`-arithmetic + `contains`; its fixture
  * patterns are chosen BORDERLESS (no nonempty proper border), where
  * all-occurrence and non-overlapping counts provably coincide —
  * BlocklistSpec pins the overlapping semantics on a bordered pattern
  * (`aa` over `aaaa` → 3) that SQL replace-counting cannot express. */
object Blocklist {

  /** Aho-Corasick automaton (Aho & Corasick 1975, public algorithm):
    * trie + BFS failure links + per-state cumulative output counts.
    * Supports up to 64 patterns (distinct-pattern tracking is a Long
    * bitmask — dictionaries beyond that split into multiple scans). */
  final class Automaton(patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty, "empty pattern dictionary")
    require(patterns.size <= 64, "at most 64 patterns per automaton")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    require(patterns.distinct.size == patterns.size, "duplicate pattern")

    private val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    private val endPat = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += scala.collection.mutable.HashMap.empty[Char, Int]
          endPat += Nil
          next.size - 1
        })
      }
      endPat(s) = pi :: endPat(s)
    }
    private val fail = new Array[Int](next.size)
    // patterns ending at this state INCLUDING via the failure chain
    private val outPats = new Array[List[Int]](next.size)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      outPats(0) = endPat(0)
      next(0).valuesIterator.foreach { s =>
        fail(s) = 0; outPats(s) = endPat(s); queue += s
      }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        next(r).foreach { case (c, s) =>
          var f = fail(r)
          while (f != 0 && !next(f).contains(c)) f = fail(f)
          fail(s) = next(f).getOrElse(c, 0)
          if (fail(s) == s) fail(s) = 0
          outPats(s) = endPat(s) ::: outPats(fail(s))
          queue += s
        }
      }
    }

    /** One pass: (total occurrence count, distinct-pattern bitmask). */
    def scan(text: String): (Long, Long) = {
      var state = 0
      var hits = 0L
      var mask = 0L
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (state != 0 && !next(state).contains(c)) state = fail(state)
        state = next(state).getOrElse(c, 0)
        var out = outPats(state)
        while (out.nonEmpty) {
          hits += 1
          mask |= 1L << out.head
          out = out.tail
        }
        i += 1
      }
      (hits, mask)
    }
  }

  /** Per-document blocklist statistics: `(idCol, n_hits, n_patterns,
    * blocked)`. One automaton pass per document; the dictionary rides
    * the closure (broadcast-sized by contract). */
  def scan(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("__id", LongType),
      StructField("n_hits", LongType),
      StructField("n_patterns", IntegerType),
      StructField("blocked", IntegerType)))
    val pats = patterns // stable capture
    df.select(col(idCol).cast("long").as("__id"), col(textCol).as("__t"))
      .mapPartitions { it =>
        val ac = new Automaton(pats) // built once per partition, tiny
        it.map { r =>
          // NULL text degrades to (0 hits, empty mask) — the multimodal
          // sentinel-row convention — instead of NPE-ing the whole task
          val t = r.getAs[String]("__t")
          val (hits, mask) = if (t == null) (0L, 0L) else ac.scan(t)
          Row(r.getAs[Long]("__id"), hits, java.lang.Long.bitCount(mask),
            if (hits > 0) 1 else 0)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .withColumnRenamed("__id", idCol)
  }
}
