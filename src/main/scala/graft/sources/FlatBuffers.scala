package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal from-scratch FlatBuffers wire-format kernel (public spec:
  * flatbuffers.dev/internals) — just enough of the format for
  * FlatGeobuf's Header/Feature tables, in both directions, with no
  * library dependency (the SqliteReader / BIFF8 stance applied to
  * Google's zero-copy format).
  *
  * Wire layout (little-endian):
  *  - root: s32 offset from buffer start to the root table
  *  - table at T: s32 soffset; its vtable sits at V = T − soffset.
  *    vtable = u16 vtable bytes, u16 table bytes, then one u16 per
  *    field id = that field's offset from T (0 = absent/default)
  *  - scalars live inline at T + fo; offset fields (string / vector /
  *    table) hold a u32 relative offset from T + fo to the target
  *  - string: u32 length + bytes + NUL; vector: u32 count + elements,
  *    elements aligned to their own size
  */
object FlatBuffers {

  // ---------------------------------------------------------------- read

  /** Cursor over a finished buffer; `pos` is a buffer-absolute table
    * position. */
  final class Table(val buf: ByteBuffer, val pos: Int) {
    /** Absolute position of field `id`'s payload, or -1 if absent. */
    def fieldPos(id: Int): Int = {
      val vtable = pos - buf.getInt(pos) // soffset may be negative
      val vtSize = buf.getShort(vtable) & 0xffff
      val slot = 4 + id * 2
      if (slot + 2 > vtSize) -1
      else {
        val fo = buf.getShort(vtable + slot) & 0xffff
        if (fo == 0) -1 else pos + fo
      }
    }

    def getInt(id: Int, default: Int = 0): Int = {
      val p = fieldPos(id); if (p < 0) default else buf.getInt(p)
    }
    def getLong(id: Int, default: Long = 0L): Long = {
      val p = fieldPos(id); if (p < 0) default else buf.getLong(p)
    }
    def getShort(id: Int, default: Int = 0): Int = {
      val p = fieldPos(id); if (p < 0) default else buf.getShort(p) & 0xffff
    }
    def getByte(id: Int, default: Int = 0): Int = {
      val p = fieldPos(id); if (p < 0) default else buf.get(p).toInt
    }
    def getDouble(id: Int, default: Double = 0.0): Double = {
      val p = fieldPos(id); if (p < 0) default else buf.getDouble(p)
    }

    private def indirect(p: Int): Int = p + buf.getInt(p)

    def getString(id: Int): Option[String] = {
      val p = fieldPos(id)
      if (p < 0) None
      else {
        val s = indirect(p)
        val len = buf.getInt(s)
        val bytes = new Array[Byte](len)
        val dup = buf.duplicate(); dup.position(s + 4); dup.get(bytes)
        Some(new String(bytes, "UTF-8"))
      }
    }

    /** Absolute position of a vector field's count word, or -1. */
    def vectorPos(id: Int): Int = {
      val p = fieldPos(id); if (p < 0) -1 else indirect(p)
    }
    def vectorLen(vp: Int): Int = buf.getInt(vp)

    def getTable(id: Int): Option[Table] = {
      val p = fieldPos(id)
      if (p < 0) None else Some(new Table(buf, indirect(p)))
    }
    /** Table element `i` of the offset vector whose count word is at `vp`. */
    def tableAt(vp: Int, i: Int): Table = {
      val ep = vp + 4 + i * 4
      new Table(buf, ep + buf.getInt(ep))
    }
    def doublesAt(vp: Int): Array[Double] = {
      val n = vectorLen(vp)
      Array.tabulate(n)(i => buf.getDouble(vp + 4 + i * 8))
    }
    def bytesAt(vp: Int): Array[Byte] = {
      val n = vectorLen(vp)
      val out = new Array[Byte](n)
      val dup = buf.duplicate(); dup.position(vp + 4); dup.get(out)
      out
    }
    /** u32 vector (e.g. FlatGeobuf's ring/part `ends`) — values fit Int
      * here (coordinate counts), read unsigned-safe via Long masking. */
    def uintsAt(vp: Int): Array[Int] = {
      val n = vectorLen(vp)
      Array.tabulate(n)(i =>
        java.lang.Math.toIntExact(buf.getInt(vp + 4 + i * 4).toLong & 0xFFFFFFFFL))
    }
  }

  /** Root table of a finished (non-size-prefixed) buffer. */
  def root(bytes: Array[Byte]): Table = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Table(buf, buf.getInt(0))
  }

  // --------------------------------------------------------------- write

  /** Canonical back-to-front builder (the reference library's
    * algorithm): data grows DOWNWARD from the array end, so every
    * finished child sits at a higher address than its parent and all
    * stored offsets point forward. Positions are tracked as
    * distance-from-END (`here`), which survives buffer growth.
    *
    * Alignment invariant: the backing array length stays a multiple of
    * 8, so aligning `used + pending` to a size keeps the ABSOLUTE
    * address of the pending write aligned in the finished buffer (whose
    * tail coincides with the array tail).
    */
  final class Builder {
    private var buf = new Array[Byte](1024)
    private var head = buf.length
    private var minalign = 4

    private def used: Int = buf.length - head
    private def here: Int = used

    private def grow(need: Int): Unit =
      if (head < need) {
        val target = math.max(buf.length * 2L, buf.length.toLong + need)
        val sz = ((target + 7) / 8 * 8).toInt
        val nbuf = new Array[Byte](sz)
        System.arraycopy(buf, head, nbuf, nbuf.length - used, used)
        head = nbuf.length - used
        buf = nbuf
      }

    private def pad(n: Int): Unit = { grow(n); head -= n }

    /** Insert padding so that after `pending` more bytes are written the
      * write head is `size`-aligned (reference `prep`). */
    private def prep(size: Int, pending: Int): Unit = {
      if (size > minalign) minalign = size
      val misalign = (~(used + pending) + 1) & (size - 1)
      pad(misalign)
    }

    private def putByte(b: Int): Unit = { grow(1); head -= 1; buf(head) = b.toByte }
    private def putShort(v: Int): Unit = {
      grow(2); head -= 2
      buf(head) = v.toByte; buf(head + 1) = (v >> 8).toByte
    }
    private def putInt(v: Int): Unit = {
      grow(4); head -= 4
      var i = 0; while (i < 4) { buf(head + i) = (v >> (8 * i)).toByte; i += 1 }
    }
    private def putLong(v: Long): Unit = {
      grow(8); head -= 8
      var i = 0; while (i < 8) { buf(head + i) = (v >> (8 * i)).toByte; i += 1 }
    }
    private def putBytes(xs: Array[Byte]): Unit = {
      grow(xs.length); head -= xs.length
      System.arraycopy(xs, 0, buf, head, xs.length)
    }

    def createString(s: String): Int = {
      val bytes = s.getBytes("UTF-8")
      prep(4, bytes.length + 1) // count word must land 4-aligned
      putByte(0)
      putBytes(bytes)
      putInt(bytes.length)
      here
    }

    def createDoubleVector(xs: Seq[Double]): Int = {
      prep(8, xs.length * 8) // elements 8-aligned; count word precedes them
      xs.reverseIterator.foreach(x => putLong(java.lang.Double.doubleToLongBits(x)))
      putInt(xs.length)
      here
    }

    def createByteVector(xs: Array[Byte]): Int = {
      prep(4, xs.length)
      putBytes(xs)
      putInt(xs.length)
      here
    }

    /** u32 vector (FlatGeobuf `ends`). */
    def createUIntVector(xs: Seq[Int]): Int = {
      prep(4, xs.length * 4)
      xs.reverseIterator.foreach(putInt)
      putInt(xs.length)
      here
    }

    def createOffsetVector(offs: Seq[Int]): Int = {
      prep(4, offs.length * 4)
      offs.reverseIterator.foreach(o => putInt(here + 4 - o))
      putInt(offs.length)
      here
    }

    // ---- table assembly ----
    private var slots: ArrayBuffer[(Int, Either[Long, Int], Int)] = _

    def startTable(): Unit = slots = ArrayBuffer.empty

    def slotScalar(id: Int, value: Long, size: Int): Unit =
      slots += ((id, Left(value), size))
    def slotDouble(id: Int, value: Double): Unit =
      slots += ((id, Left(java.lang.Double.doubleToLongBits(value)), 8))
    def slotOffset(id: Int, off: Int): Unit =
      slots += ((id, Right(off), 4))

    /** Lay the table out (fields packed biggest-first toward the table
      * head, the reference packing), then its vtable; returns the
      * table position as an end-distance. */
    def endTable(): Int = {
      val usedBefore = here
      // biggest-first from the table start means writing SMALLEST first
      // here (back-to-front: earlier writes land at the table's tail)
      val ordered = slots.sortBy { case (_, _, sz) => sz }
      val nSlots = if (slots.isEmpty) 0 else slots.map(_._1).max + 1
      val fieldHere = new Array[Int](nSlots)
      ordered.foreach { case (id, v, sz) =>
        v match {
          case Left(bits) =>
            prep(sz, sz)
            sz match {
              case 1 => putByte(bits.toInt)
              case 2 => putShort(bits.toInt)
              case 4 => putInt(bits.toInt)
              case 8 => putLong(bits)
            }
          case Right(off) =>
            prep(4, 4)
            putInt(here + 4 - off)
        }
        fieldHere(id) = here
      }
      prep(4, 4)
      putInt(0) // soffset placeholder
      val tablePos = here
      val tableBytes = tablePos - usedBefore
      // vtable: u16 slot offsets (from table start), reversed for order
      (nSlots - 1 to 0 by -1).foreach { id =>
        putShort(if (fieldHere(id) == 0) 0 else tablePos - fieldHere(id))
      }
      putShort(tableBytes)
      putShort(4 + nSlots * 2)
      val vtPos = here
      patchInt(tablePos, vtPos - tablePos) // soffset = T_abs − V_abs
      slots = null
      tablePos
    }

    private def patchInt(endDist: Int, v: Int): Unit = {
      val p = buf.length - endDist
      var i = 0; while (i < 4) { buf(p + i) = (v >> (8 * i)).toByte; i += 1 }
    }

    /** Finish with root table `root`; returns the standalone buffer. */
    def finish(root: Int): Array[Byte] = {
      prep(minalign, 4)
      putInt(here + 4 - root)
      val out = new Array[Byte](used)
      System.arraycopy(buf, head, out, 0, used)
      out
    }
  }
}
