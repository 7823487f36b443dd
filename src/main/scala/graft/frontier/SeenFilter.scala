package graft.frontier

/** Common surface of the approximate seen-set filters ([[Bloom]] /
  * [[Cuckoo]]): per-partition blobs, broadcast to executors, consulted
  * row-locally as the cheap pre-filter in front of the exact anti-join.
  * Contract: NO false negatives for inserted keys; false positives are
  * resolved by the exact `seen` table anti-join (CrawlWave step 2). */
trait SeenFilter extends Serializable {
  def put(h: Long): Unit
  def mightContain(h: Long): Boolean
  def serialize: Array[Byte]
  /** Deep copy — broadcast values must never be mutated in place. */
  def copyOf: SeenFilter
}

object SeenFilter {

  /** Serialized blobs carry a (kind, version) header so a store written
    * with one filter kind resumed under another FAILS FAST instead of
    * silently misparsing into a garbage filter (pre-filter false
    * negatives would follow — the one unacceptable seen-set error). */
  val KindBloom: Byte = 'B'
  val KindCuckoo: Byte = 'C'
  val BlobVersion: Byte = 1

  private[frontier] def checkHeader(
      bb: java.nio.ByteBuffer, expected: Byte, name: String): Unit = {
    val kind = bb.get(); val ver = bb.get()
    if (kind != expected)
      throw new IllegalArgumentException(
        s"seen-filter blob kind mismatch: expected '$name' (${expected.toChar}) " +
          s"but blob starts with '${kind.toChar}' — the store was written under " +
          "a different cfg.seenFilter; refuse to resume")
    if (ver != BlobVersion)
      throw new IllegalArgumentException(
        s"seen-filter blob version $ver unsupported (expected $BlobVersion)")
  }

  /** A fresh filter of the configured kind. */
  def fresh(kind: String, bloomBits: Int, bloomHashes: Int, cuckooCapacity: Int): SeenFilter =
    kind match {
      case "cuckoo" => Cuckoo(cuckooCapacity)
      case "bloom"  => Bloom(bloomBits, bloomHashes)
      case other    => throw new IllegalArgumentException(s"unknown seen filter: $other")
    }

  def deserialize(kind: String, b: Array[Byte]): SeenFilter = kind match {
    case "cuckoo" => Cuckoo.deserialize(b)
    case "bloom"  => Bloom.deserialize(b)
    case other    => throw new IllegalArgumentException(s"unknown seen filter: $other")
  }
}
