package graft

/** Shared path-key discipline for every registry an optimizer rule
  * consults (IndexCatalog, MaskPolicies, AccessPolicies). Two rules:
  *
  *  - Keys are ABSOLUTE paths without scheme: scan rootPaths come back
  *    fully qualified, so a relative registration key would never match
  *    (this exact mismatch silently disabled transparent index routing
  *    for two rounds).
  *  - Containment resolves to the LONGEST matching key: with nested
  *    governed dirs, the most specific object's policy wins — hash-map
  *    iteration order must never pick the outer (possibly laxer) one.
  *
  * Scans the engine itself plants during a rewrite carry a marker
  * option so other rules can recognize them structurally — no global
  * mutable set of attribute ids to leak or clear. */
object PathKeys {

  /** Marker option on relations planted by graft's own rewrite rules
    * (mask frames, index-pruned scans). */
  val PlantedOption = "graft.planted.scan"

  def normalize(dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir).toUri.getPath
    val abs = if (new java.io.File(p).isAbsolute) p
              else new java.io.File(p).getAbsolutePath
    abs.stripSuffix("/")
  }

  /** The longest registered key that contains `path` (equal or ancestor),
    * or None. */
  def containingKey(keys: scala.collection.Set[String],
                    rootPath: org.apache.hadoop.fs.Path): Option[String] = {
    val p = rootPath.toUri.getPath.stripSuffix("/")
    keys.filter(k => p == k || p.startsWith(k + "/"))
      .reduceOption((a, b) => if (a.length >= b.length) a else b)
  }

  /** True when `path` is a STRICT descendant of some key (a fragment of
    * a governed object, not the object itself). */
  def isFragment(keys: scala.collection.Set[String],
                 rootPath: org.apache.hadoop.fs.Path): Boolean = {
    val p = rootPath.toUri.getPath.stripSuffix("/")
    !keys.contains(p) && keys.exists(k => p.startsWith(k + "/"))
  }
}
