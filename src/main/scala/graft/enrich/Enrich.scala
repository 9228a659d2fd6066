package graft.enrich

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Side-effecting enrichment seams (SURVEY §2.9 ops 54-57, §2.11).
  *
  * The reference calls the Mistral chat API (5 req/s AsyncLimiter,
  * utils/recent_history_utils.py:69-124), a local vLLM two-turn generator
  * (utils/old_history_utils.py:55-165), and two embedding backends. In this
  * engine those are `mapPartitions` operators behind these traits:
  *  - enrichment never runs inside a Catalyst expression (the optimizer may
  *    re-execute/reorder expressions; operators cache after enriching);
  *  - rate limits are enforced per-partition (`maxRatePerSecond` divided by
  *    the number of concurrent partitions at the cluster level);
  *  - tests and the driver harness use the deterministic stubs below, so
  *    every pipeline output is byte-stable without network or GPU.
  */
trait LLMClient extends Serializable {
  /** One response per prompt, order-preserving. */
  def complete(prompts: Seq[String]): Seq[String]
}

trait Embedder extends Serializable {
  /** Embedding dimension (fixed-length contract on the output arrays). */
  def dim: Int
  /** One unit vector per text, order-preserving. */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic hash-seeded embedder: sha-256 stream → pseudo-gaussian
  * coordinates → L2-normalized. Same text ⇒ same unit vector, across JVMs
  * and partitionings. Similar texts do NOT get similar vectors (it's a
  * stub, not a model) — tests that need controlled similarity construct
  * vectors directly. */
final class StubEmbedder(override val dim: Int = 64) extends Embedder {
  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val out = new Array[Float](dim)
    var i = 0
    var counter = 0
    var acc = 0.0
    while (i < dim) {
      val digest = MessageDigest.getInstance("SHA-256")
        .digest(s"$counter|$t".getBytes(StandardCharsets.UTF_8))
      var j = 0
      while (j + 8 <= digest.length && i < dim) {
        var bits = 0L
        var k = 0
        while (k < 8) { bits = (bits << 8) | (digest(j + k) & 0xffL); k += 1 }
        // uniform in (-1, 1); good enough for a direction stub
        out(i) = ((bits.toDouble / Long.MaxValue)).toFloat
        acc += out(i).toDouble * out(i).toDouble
        i += 1; j += 8
      }
      counter += 1
    }
    val norm = math.sqrt(acc)
    if (norm > 0) { var k = 0; while (k < dim) { out(k) = (out(k) / norm).toFloat; k += 1 } }
    out
  }
}

/** Deterministic stub of the sessions-summarizer LLM
  * (assets/recent_history.py:24-44 prompt: chunk of (hour,title) rows →
  * JSON array of {time_start, time_end, description, interests}).
  *
  * The stub reads the rendered rows back out of the prompt and emits one
  * session covering the chunk's time span, with a stable description and
  * interest tokens derived from the titles — wrapped in prose + sometimes a
  * second malformed object so the extraction/validation path (balanced-brace
  * scan, key/type/regex filters with drop counters) is exercised exactly as
  * with a real model. */
final class StubSessionsLLM extends LLMClient {
  private val rowPattern = """(?m)^\s*(\d{2}:\d{2})\s*\|\s*(.*?)\s*$""".r

  override def complete(prompts: Seq[String]): Seq[String] = prompts.map { p =>
    val rows = rowPattern.findAllMatchIn(p).map(m => (m.group(1), m.group(2))).toVector
    if (rows.isEmpty) """I could not find any activity rows."""
    else {
      val hours = rows.map(_._1)
      val interests = rows.map(_._2.split("\\s+").last.toLowerCase.filter(_.isLetterOrDigit))
        .filter(_.nonEmpty).distinct.sorted.take(5)
      val desc = s"Activity block of ${rows.size} items starting ${hours.min}"
      val json =
        s"""{"time_start": "${hours.min}", "time_end": "${hours.max}", """ +
          s""""description": "$desc", "interests": [${interests.map(i => s""""$i"""").mkString(", ")}]}"""
      // noisy envelope + an invalid trailer object (wrong key set) to keep
      // the validation counters honest
      s"""Here is the requested summary:\n$json\nAlso note {"unrelated": true}."""
    }
  }
}

/** Deterministic stub of the two-turn interests extractor
  * (utils/old_history_utils.py:55-104: turn 1 free-form analysis, turn 2
  * "reply with a [list] of interests"). Turn 2 returns a bracketed list —
  * the reference parses it with a `\[(.*?)\]` regex capture. */
final class StubInterestsLLM extends LLMClient {
  private val rowPattern = """(?m)^\s*(\d{2}:\d{2})\s*\|\s*(.*?)\s*$""".r

  override def complete(prompts: Seq[String]): Seq[String] = prompts.map { p =>
    if (p.contains("[SECOND_TURN]")) {
      val words = rowPattern.findAllMatchIn(p)
        .flatMap(_.group(2).split("\\s+").lastOption).toVector
        .map(_.toLowerCase.filter(_.isLetterOrDigit)).filter(_.nonEmpty).distinct.sorted
      if (words.isEmpty) "no interests found"
      else s"Based on the analysis, the interests are: [${words.take(8).mkString(", ")}]"
    } else {
      s"The user activity suggests several recurring themes."
    }
  }
}
