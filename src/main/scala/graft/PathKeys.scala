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
    * (mask frames, index-pruned scans). The option VALUE must be
    * [[plantedToken]] — a random per-JVM nonce — so a user cannot forge
    * the marker with `spark.read.option("graft.planted.scan", "true")`
    * and exempt their scan from masking or the fragment refusal. The
    * token never leaves the JVM (it is not written to any plan string a
    * caller can read back: options render only in debug output, and an
    * attacker with debug-plan access is already inside the trust
    * boundary — see the governance caveat below).
    *
    * Trust boundary (documented, by design): graft's governance —
    * masking, authorization, the planted marker — is IN-PROCESS
    * enforcement for trusted application code serving untrusted QUERIES
    * (the HiveServer2 model: the server process is trusted, sessions
    * are not). A caller who can execute arbitrary JVM code in the
    * driver (read this field reflectively, set `graft.auth.user`, call
    * registry `clear()`) is outside the model, exactly as a process
    * with the HDFS superuser keytab is outside Ranger's. */
  val PlantedOption = "graft.planted.scan"

  /** Per-JVM random nonce proving a scan was planted by graft's own
    * rules (not forgeable from query text or reader options). */
  private[graft] val plantedToken: String = java.util.UUID.randomUUID().toString

  /** True when `options` carries the genuine planted marker. */
  def isPlanted(options: Map[String, String]): Boolean =
    options.get(PlantedOption).contains(plantedToken)

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

  /** Registered keys that are STRICT descendants of `path` — the
    * governed dirs a scan rooted ABOVE them would sweep up (e.g.
    * `spark.read.option("recursiveFileLookup", "true").parquet(parent)`).
    * The mirror of [[isFragment]]: fragment = scanning a piece of a
    * governed object; ancestor = scanning a container that includes one.
    * Both must face the object's policy, or raw rows leak around it. */
  def containedKeys(keys: scala.collection.Set[String],
                    rootPath: org.apache.hadoop.fs.Path): Seq[String] = {
    val p = rootPath.toUri.getPath.stripSuffix("/")
    keys.filter(k => k.startsWith(p + "/")).toSeq.sorted
  }
}
