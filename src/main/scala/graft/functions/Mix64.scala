package graft.functions

/** The splitmix64 finalizer, shared by the sketch/fingerprint kernels
  * ([[HyperplaneSketch]] plane derivation, [[WinnowFingerprint]] hash
  * decorrelation) so the mixing constants can never silently diverge
  * between them. */
private[graft] object Mix64 {
  def splitmix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
