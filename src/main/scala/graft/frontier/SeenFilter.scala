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
