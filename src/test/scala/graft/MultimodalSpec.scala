package graft

import graft.operators.{Multimodal, MediaRow}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val d = Seq((1L, "hello world"), (2L, "a much longer document body here"))
    .toDF("doc_id", "text")

  test("assets: binary payload round-trips, metadata is content-derived") {
    val a = Multimodal.assets(d).orderBy("asset_id").collect()
    assert(new String(a(0).getAs[Array[Byte]]("content"), "UTF-8") === "hello world")
    assert(a(0).getAs[Long]("n_bytes") === 11L)
    assert(a(0).getAs[String]("checksum").length === 32)
  }

  test("decodeMeta dims are deterministic and within the stub ranges") {
    val m = Multimodal.decodeMeta(Multimodal.assets(d)).collect()
    m.foreach { r =>
      val (w, h, f) = (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("n_frames"))
      assert(w >= 16 && w < 640); assert(h >= 16 && h < 480); assert(f >= 1 && f <= 16)
    }
    def dims(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("asset_id"), r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("n_frames"))).sortBy(_._1).toSeq
    val again = Multimodal.decodeMeta(Multimodal.assets(d)).collect()
    assert(dims(m) === dims(again))
  }

  test("frameSample counts every step-th frame") {
    val s = Multimodal.frameSample(Multimodal.decodeMeta(Multimodal.assets(d)), step = 4)
      .select("n_frames", "n_sampled", "last_frame").collect()
    s.foreach { r =>
      val exp = (0 until r.getAs[Int]("n_frames") by 4).toSeq
      assert(r.getAs[Int]("n_sampled") === exp.size)
      assert(r.getAs[Int]("last_frame") === exp.last)
    }
  }

  test("featureExtract: typed pipeline agrees with the column-level decode") {
    val assets = Multimodal.assets(d).as[MediaRow]
    val feats = Multimodal.featureExtract(assets, dim = 8).collect()
    val meta = Multimodal.decodeMeta(Multimodal.assets(d)).orderBy("asset_id").collect()
    feats.sortBy(_.asset_id).zip(meta).foreach { case (f, m) =>
      assert(f.width === m.getAs[Int]("width"))
      assert(f.height === m.getAs[Int]("height"))
      assert(f.n_frames === m.getAs[Int]("n_frames"))
      assert(f.features.length === 8)
      assert(f.features.sum > 0f) // bytes actually folded in
    }
  }
}
