package graft.tools

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.SparkSession

/** One-shot generator for the committed media fixture
  * (`fixtures/media/images.parquet`): small REAL encoded images — PNG, GIF
  * and BMP containers, deterministic pixel fill — alongside their expected
  * metadata columns, so q60 can value-check the ImageHeaderCodec decode
  * against DuckDB reading the same parquet. Run once; the output is
  * committed (re-running produces equivalent, not necessarily
  * byte-identical, files — PNG encoders may differ across JVMs). */
object GenMediaFixture {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("fixtures/media")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val formats = Array("png", "gif", "bmp")
    val rows = (0 until 48).map { i =>
      val w = 3 + (i * 7) % 61
      val h = 2 + (i * 11) % 47
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 17 + i * 131) & 0xffffff)
      val fmt = formats(i % formats.length)
      val buf = new ByteArrayOutputStream()
      require(ImageIO.write(img, fmt, buf), s"no $fmt writer")
      (i.toLong, "image", fmt, w, h, buf.toByteArray)
    }
    import spark.implicits._
    rows.toDF("media_id", "kind", "format", "width", "height", "bytes")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/images.parquet")
    println(s"[gen-media-fixture] wrote ${rows.length} images to $outDir/images.parquet")
    spark.stop()
  }
}
