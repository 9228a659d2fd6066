package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.QueryDef.rowsOnly
import graft.core.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal

/** Library-API dedup + multimodal operators run on driver testdata
  * (rows-only; pairwise semantics are pinned by DedupSpec/MultimodalSpec). */
object DedupQueries {

  def all: Seq[QueryDef] = Seq(
    q56MinhashLshPairs, q57SimhashNearDup, q58EmbeddingNearDup,
    q60MultimodalFeatures, q61FramePlan)

  val q56MinhashLshPairs: QueryDef = rowsOnly("q56_minhash_lsh_pairs") { (s, d) =>
    Dedup.minhashLsh(Tables.documents(s, d), "doc_id", "text", threshold = 0.2)
      .select(col("id_a"), col("id_b"), oround(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val q57SimhashNearDup: QueryDef = rowsOnly("q57_simhash_neardup") { (s, d) =>
    Dedup.simhashNearDup(Tables.documents(s, d), "doc_id", "text", maxHamming = 16)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q58EmbeddingNearDup: QueryDef = rowsOnly("q58_embedding_neardup") { (s, d) =>
    Dedup.embeddingNearDup(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", threshold = 0.3)
      .select(col("id_a"), col("id_b"), oround(col("sim"), 6).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val q60MultimodalFeatures: QueryDef = rowsOnly("q60_multimodal_features") { (s, d) =>
    val media = Multimodal.syntheticMediaFromDocs(Tables.documents(s, d))
    Multimodal.extractFeatures(media, new Multimodal.StubCodec(32))
      .select(col("media_id"), col("kind"), size(col("features")).as("dim"),
        oround(element_at(col("features"), 1).cast("double"), 6).as("f0"))
      .orderBy(col("media_id"))
  }

  val q61FramePlan: QueryDef = rowsOnly("q61_frame_plan") { (s, d) =>
    val media = Multimodal.syntheticMediaFromDocs(Tables.documents(s, d))
    Multimodal.frameSamplePlan(media, framesPerVideo = 4)
      .orderBy(col("media_id"), col("frame_ms"))
  }
}
