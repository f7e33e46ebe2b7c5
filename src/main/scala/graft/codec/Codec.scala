package graft.codec

/** Variable-byte encoding with 7-bit groups and high-bit continuation,
  * semantics-equivalent to the reference's vInt/vLong
  * (/root/reference/src/Lucene.Net.Core/Store/DataOutput.cs:189,218).
  */
object VByte {
  def writeInt(out: ByteBuf, v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) {
      out.append(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    out.append(v.toByte)
  }

  def writeLong(out: ByteBuf, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.append(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    out.append(v.toByte)
  }

  /** Read a vInt at `pos`; returns value, advances the cursor. */
  def readInt(buf: Array[Byte], cursor: Cursor): Int = {
    var b = buf(cursor.pos)
    cursor.pos += 1
    var v = b & 0x7f
    var shift = 7
    while ((b & 0x80) != 0) {
      b = buf(cursor.pos)
      cursor.pos += 1
      v |= (b & 0x7f) << shift
      shift += 7
    }
    v
  }

  def readLong(buf: Array[Byte], cursor: Cursor): Long = {
    var b = buf(cursor.pos)
    cursor.pos += 1
    var v = (b & 0x7fL)
    var shift = 7
    while ((b & 0x80) != 0) {
      b = buf(cursor.pos)
      cursor.pos += 1
      v |= (b & 0x7fL) << shift
      shift += 7
    }
    v
  }
}

final class Cursor(var pos: Int)

/** Minimal growable byte buffer (avoids boxing of ArrayBuffer[Byte]). */
final class ByteBuf(initial: Int = 64) {
  private var arr = new Array[Byte](initial)
  private var len = 0
  def append(b: Byte): Unit = {
    if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(len) = b
    len += 1
  }
  def write(bs: Array[Byte]): Unit = {
    var i = 0
    while (i < bs.length) { append(bs(i)); i += 1 }
  }
  def size: Int = len
  def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
}

/** Frame-of-reference bit-packing for fixed 128-int blocks, the analog of the
  * reference's ForUtil (/root/reference/src/Lucene.Net.Core/Codecs/Lucene41/ForUtil.cs:41-122,
  * BLOCK_SIZE=128 at Lucene41PostingsFormat.cs:376). Our on-wire format is our
  * own: 1 header byte = bitsPerValue, then ceil(128*b/8) packed bytes, MSB-first.
  */
object ForBlock {
  val BlockSize = 128

  def bitsRequired(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  /** Encode exactly 128 non-negative ints from `vals[off..off+128)`. */
  def encode(vals: Array[Int], off: Int, out: ByteBuf): Unit = {
    var max = 0
    var i = 0
    while (i < BlockSize) { val v = vals(off + i); if (v > max) max = v; i += 1 }
    val bits = bitsRequired(max)
    out.append(bits.toByte)
    if (bits == 0) return
    var acc = 0L
    var accBits = 0
    i = 0
    while (i < BlockSize) {
      acc = (acc << bits) | (vals(off + i) & 0xffffffffL)
      accBits += bits
      while (accBits >= 8) {
        out.append(((acc >>> (accBits - 8)) & 0xff).toByte)
        accBits -= 8
      }
      i += 1
    }
    if (accBits > 0) out.append(((acc << (8 - accBits)) & 0xff).toByte)
  }

  /** Decode 128 ints into `dst[dstOff..)`, advancing the cursor. */
  def decode(buf: Array[Byte], cursor: Cursor, dst: Array[Int], dstOff: Int): Unit = {
    val bits = buf(cursor.pos) & 0xff
    cursor.pos += 1
    if (bits == 0) {
      java.util.Arrays.fill(dst, dstOff, dstOff + BlockSize, 0)
      return
    }
    var acc = 0L
    var accBits = 0
    var i = 0
    var p = cursor.pos
    val mask = (1L << bits) - 1
    while (i < BlockSize) {
      while (accBits < bits) {
        acc = (acc << 8) | (buf(p) & 0xffL)
        p += 1
        accBits += 8
      }
      dst(dstOff + i) = ((acc >>> (accBits - bits)) & mask).toInt
      accBits -= bits
      i += 1
    }
    cursor.pos = p
  }
}

/** Bit-exact port of the 3-mantissa-bit, zero-exponent-15 "small float" norm
  * encoding (/root/reference/src/Lucene.Net.Core/Util/SmallFloat.cs:93-121).
  * IEEE-754 identical to the reference (BitConverter == floatToIntBits).
  */
object SmallFloat {
  def floatToByte315(f: Float): Byte = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val smallfloat = bits >> (24 - 3)
    if (smallfloat <= ((63 - 15) << 3)) {
      if (bits <= 0) 0.toByte else 1.toByte
    } else if (smallfloat >= ((63 - 15) << 3) + 0x100) {
      (-1).toByte
    } else {
      (smallfloat - ((63 - 15) << 3)).toByte
    }
  }

  def byte315ToFloat(b: Byte): Float = {
    if (b == 0) return 0.0f
    var bits = (b & 0xff) << (24 - 3)
    bits += (63 - 15) << 24
    java.lang.Float.intBitsToFloat(bits)
  }
}
