package streamline.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The pluggable DECODE seam for the multimodal pipelines
  * (q_llm_mm_features / q_llm_mm_resize / q_llm_mm_sample): everything
  * downstream — feature digests, stride resize, frame sampling — is
  * generic byte plumbing, but turning an opaque media payload (JPEG,
  * WAV, MP4, …) into the byte representation those stages consume
  * needs a real codec, and real codecs are deployment property, not
  * library property (none ship in this container — SURVEY §2.11).
  *
  * A deployment registers one by FQCN:
  * {{{
  *   class JpegDecoder extends MediaDecoder {
  *     def decode(payload: Array[Byte]): Array[Byte] = ... // pixel buffer
  *   }
  *   spark.conf.set("graft.mm.decoder", "com.example.JpegDecoder")
  * }}}
  * and every mm_* query decodes through it, as a typed mapPartitions
  * stage over the binary column (one instance per partition — the
  * natural place for codec-context reuse; at 100 TB this stage is
  * map-only, shuffle-free, between storage and feature extraction).
  *
  * The DEFAULT is the identity codec, and identity ELIDES the decode
  * stage entirely: the witnesses keep their whole-stage-codegen
  * expression plans and their engine-independent DuckDB oracles
  * (sha256/length over the raw payload). MediaDecoderSpec swaps in a
  * toy codec to pin that the seam is live — same plumbing, different
  * bytes out.
  */
trait MediaDecoder extends Serializable {
  /** Opaque payload → decoded byte representation (pixel buffer, PCM
    * samples, concatenated frames — codec-defined). Must be
    * deterministic: the dedup/fingerprint stages downstream assume
    * decode(p) is a pure function. */
  def decode(payload: Array[Byte]): Array[Byte]
}

object MediaDecoder {

  /** The default: payloads pass through untouched (the honest stub
    * while no real codec is on the classpath). */
  object Identity extends MediaDecoder {
    def decode(payload: Array[Byte]): Array[Byte] = payload
  }

  /** Resolve the session's decoder: `graft.mm.decoder` names a
    * zero-arg-constructible [[MediaDecoder]] implementation; unset (or
    * empty) means [[Identity]]. Resolution is plan-time and per-call —
    * a conf change takes effect on the next query build, the
    * swap-a-codec contract MediaDecoderSpec pins. */
  def forSession(spark: SparkSession): MediaDecoder =
    spark.conf.get("graft.mm.decoder", "") match {
      case "" => Identity
      case cls => Class.forName(cls).getDeclaredConstructor()
        .newInstance().asInstanceOf[MediaDecoder]
    }

  /** Insert the decode stage over a `(doc_id LONG, payload BINARY)`
    * frame. Identity elides the stage — the caller's downstream
    * expressions stay in one whole-stage-codegen span over the scan;
    * any other codec runs as typed mapPartitions (one codec instance
    * per partition). */
  def decoded(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    forSession(spark) match {
      case Identity => df
      case codec =>
        df.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            (id, codec.decode(bytes))
          })
          .toDF(df.columns.toIndexedSeq: _*)
    }
  }
}
