package graft.core

/** Log-scale u8 quantization of per-document token counts.
  *
  * Semantics from /root/reference/crates/tantivy/src/fieldnorm/code.rs:
  * the 256-entry table (code.rs:13-270) is exactly the closed form
  * checked by its own test (code.rs:301-328): identity below 24, then a
  * 3-bit-mantissa floating encoding. We generate the table from the
  * closed form and assert equality with spot values from the literal
  * table in FieldNormSpec.
  *
  * fieldnormToId is the lower-bound binary search of code.rs:7-11.
  */
object FieldNorm {
  private final val IdentityPart = 24

  private def decodeByte(b: Int): Long = {
    if (b < IdentityPart) b.toLong
    else {
      val e = b - IdentityPart
      val bits = (e & 0x07).toLong
      val shift = e >> 3
      val exp = if (shift == 0) bits else (bits | 8L) << (shift - 1)
      IdentityPart.toLong + exp
    }
  }

  /** TABLE(id) = decoded fieldnorm, monotonically increasing, u32 range. */
  val Table: Array[Long] = Array.tabulate(256)(decodeByte)

  /** id -> fieldnorm (id_to_fieldnorm). */
  @inline def idToFieldNorm(id: Int): Long = Table(id & 0xff)

  /** fieldnorm -> id: largest id whose table value <= fieldnorm. */
  def fieldNormToId(fieldnorm: Long): Byte = {
    val idx = java.util.Arrays.binarySearch(Table, fieldnorm)
    val id = if (idx >= 0) idx else -idx - 2
    id.toByte
  }
}
