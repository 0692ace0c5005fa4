package graft.plans

/** Shared UTF-8 lead-byte length table for the byte-level scanners
  * ([[CleanTokensHelper]], [[HashedTrigrams32Helper]]) — one copy of
  * the malformed-lead-byte policy (continuation or invalid lead
  * degrades to length 1), mirroring UTF8String's
  * `numBytesForFirstByte` semantics without reaching into its
  * private table. */
private[plans] object Utf8Scan {
  def cpLen(b: Byte): Int = {
    val v = b & 0xFF
    if (v < 0x80) 1
    else if ((v & 0xE0) == 0xC0) 2
    else if ((v & 0xF0) == 0xE0) 3
    else if ((v & 0xF8) == 0xF0) 4
    else 1
  }
}
