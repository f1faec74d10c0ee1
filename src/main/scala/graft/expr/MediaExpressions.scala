package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.media.{AvMeta, ExifMeta, MediaSniff, VorbisDecode}

object ExifMetaExpr {
  val structType: StructType = StructType(Seq(
    StructField("orientation", IntegerType, nullable = false),
    StructField("has_gps", BooleanType, nullable = false),
    StructField("make", StringType, nullable = true),
    StructField("datetime", StringType, nullable = true)
  ))
}

/** EXIF metadata from JPEG APP1 or bare TIFF bytes (ExifMeta): orientation,
  * GPS-IFD presence (location PII flag), camera make, timestamp. */
case class ExifMetaExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ExifMetaExpr.structType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val i = ExifMeta.parse(input.asInstanceOf[Array[Byte]])
    def u(s: String): UTF8String = if (s == null) null else UTF8String.fromString(s)
    InternalRow(i.orientation, i.hasGps, u(i.make), u(i.dateTime))
  }
  override protected def withNewChildInternal(newChild: Expression): ExifMetaExpr =
    copy(child = newChild)
}

object MediaSniffExpr {
  val structType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)
  ))
}

/** Typed metadata from an opaque binary media column (header inspection only —
  * never decodes the full payload). */
case class MediaSniffExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = MediaSniffExpr.structType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val i = MediaSniff.sniff(input.asInstanceOf[Array[Byte]])
    InternalRow(UTF8String.fromString(i.format), i.width, i.height)
  }
  override protected def withNewChildInternal(newChild: Expression): MediaSniffExpr =
    copy(child = newChild)
}

object AvMetaExpr {
  val structType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false)
  ))
}

/** Audio/video container metadata (MP4 boxes, MP3 frame walk, FLAC
  * STREAMINFO, WAV chunks, GIF animation blocks) — structure parsing only,
  * never a codec decode. */
case class AvMetaExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = AvMetaExpr.structType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val i = AvMeta.parse(input.asInstanceOf[Array[Byte]])
    InternalRow(UTF8String.fromString(i.format), i.durationMs, i.sampleRate,
      i.channels, i.width, i.height, i.frames)
  }
  override protected def withNewChildInternal(newChild: Expression): AvMetaExpr =
    copy(child = newChild)
}

/** 64-bit perceptual difference hash for image near-dup keys (see
  * MediaSniff.dhash64 for the pinned definition). NULL for non-image or
  * sub-grid payloads — nullable so undecodable bytes drop out of dedup
  * grouping instead of colliding on a sentinel value. */
case class ImageDhash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    MediaSniff.dhash64(input.asInstanceOf[Array[Byte]]).map(Long.box).orNull
  override protected def withNewChildInternal(newChild: Expression): ImageDhash =
    copy(child = newChild)
}

object VorbisFeaturesExpr {
  val structType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("n_packets", IntegerType, nullable = false),
    StructField("floor_y_sum", LongType, nullable = false),
    StructField("sum_abs_micro", LongType, nullable = false),
    StructField("peak_micro", LongType, nullable = false)
  ))
}

/** REAL Vorbis payload decode (VorbisDecode — in-band codebooks, floor1,
  * residue, iMDCT, lapped windows): PCM length after granule clamping plus
  * integer decode evidence — floor_y_sum proves the Huffman/floor bitstream
  * machinery, sum_abs/peak quantize the decoded float signal to micro-units.
  * NULL for non-Vorbis or undecodable payloads. */
case class VorbisFeaturesExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = VorbisFeaturesExpr.structType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    VorbisDecode.decode(input.asInstanceOf[Array[Byte]]) match {
      case Some(p) => InternalRow(p.sampleRate, p.channels, p.frames,
        p.nPackets, p.floorYSum, p.sumAbsMicro, p.peakMicro)
      case None => null
    }
  override protected def withNewChildInternal(newChild: Expression): VorbisFeaturesExpr =
    copy(child = newChild)
}

/** STUB media feature sketch (see MediaSniff.features). */
case class MediaFeatures(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(MediaSniff.features(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): MediaFeatures =
    copy(child = newChild)
}
