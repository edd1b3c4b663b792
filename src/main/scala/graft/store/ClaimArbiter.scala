package graft.store

/** External commit-log arbiter for object stores WITHOUT conditional
  * writes (plain-PUT S3 before If-None-Match, or S3-compatible stores
  * that never added it). On such a store `create(overwrite = false)`
  * degrades to a client-side existence CHECK followed by an
  * unconditional last-writer-wins PUT, and the manifest commit log
  * cannot be made safe above it: two committers of the same version
  * can both pass the check and the later PUT silently replaces an
  * ALREADY-ACKNOWLEDGED manifest (reproduced on demand by
  * ObjectStoreSemanticsSpec's "DOCUMENTED DANGER" test; SURVEY §5
  * matrix row 1).
  *
  * The fix deployed by every public lakehouse on that store class is a
  * small external mutex table — DynamoDB conditional puts, a ZooKeeper
  * znode, a Postgres row — keyed by the object path. This trait is
  * that seam: when one is configured (`SnapshotStore.manifestArbiter`,
  * or `-Dgraft.store.manifestArbiter=<class with zero-arg ctor>`),
  * [[SnapshotStore]] routes EVERY exclusive-create claim through it —
  * manifest commits, identity-block claims (an overlapping identity
  * range is silent corruption of the same severity as a lost
  * manifest), tag creates (double winners would silently re-point an
  * immutable tag), and checkpoint work-dedup claims — and the rest of
  * each protocol is unchanged: the arbiter only SERIALIZES the create;
  * ownership of a committed payload is still decided by its readback,
  * and a pathologically suspended claimer that resumes writing is
  * fenced by the per-site post-write owner re-check.
  *
  * Contract:
  *  - [[claim]] must be ATOMIC across all processes sharing the store:
  *    of N concurrent claimers of one path, exactly one returns true.
  *  - A claim whose holder died must become supersedable after a
  *    staleness grace (crash reclaim) — atomically, so two reclaimers
  *    cannot both win.
  *  - Re-claiming with the SAME token must stay a win (idempotent
  *    retry by the owner).
  *  - Rows are PERMANENT while their version can still be contended —
  *    which is forever, protocol-wise: a laggard in its OCC retry loop
  *    can re-attempt any version at any time, and a released row would
  *    let it claim a path whose committed manifest its overwrite PUT
  *    then silently replaces (the readback would bless the laggard's
  *    own token — the exact lost-commit this arbiter exists to stop;
  *    observed live when a release-on-confirm optimization was tried).
  *    One row per committed version is the honest cost — the same
  *    shape as the public DynamoDB commit-table deployments, which
  *    expire rows only on a TTL of days, far beyond any retry horizon.
  */
trait ClaimArbiter {
  /** Atomically claim `path` for `token`; true = this caller owns the
    * write to that path.
    */
  def claim(path: String, token: String): Boolean

  /** Read the current claim holder without mutating anything. Used as
    * the ZOMBIE FENCE: a committer re-verifies it still holds the row
    * after its write lands and BEFORE it reports success — a claimer
    * suspended past the staleness grace whose upload completes after a
    * superseder's acknowledged commit sees the superseder's token here
    * and must report INDETERMINATE (its unconditional PUT may have
    * clobbered the acknowledged manifest; a clean-loss report would
    * hide that). The conditional-PUT close-fence and the POSIX
    * unlink-fence kill this zombie at the store; plain PUT cannot, so
    * the row is the fence.
    */
  def owner(path: String): Option[String]

  /** Release `path` iff `token` still holds it — one conditional
    * delete in a DynamoDB-style implementation. COMMIT claims are
    * never released (the surviving row IS the zombie fence); short
    * LOCK claims (the contracts lock) release on exit so the next
    * acquirer need not wait out the staleness grace.
    */
  def release(path: String, token: String): Unit
}

/** JVM-local reference implementation: one CAS'd row per path, claims
  * supersedable after `staleMs`. These are exactly the semantics a
  * DynamoDB conditional-put implementation provides across machines
  * (put-if-absent-or-expired with the old row's token in the
  * condition); ObjectStoreSemanticsSpec runs the plain-PUT commit
  * fleet against this to prove the protocol whole with an arbiter
  * plugged in. Default staleness mirrors the store's torn-manifest
  * reclaim grace.
  */
final class InMemoryClaimArbiter(staleMs: Long = -1L) extends ClaimArbiter {
  private val rows =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** Default (-1) = the store's own loaded reclaim grace, read through
    * the shared accessor so the two can never diverge: a claim must
    * become supersedable at exactly the moment the store considers the
    * matching torn leftover reclaimable (see
    * [[SnapshotStore.reclaimGraceMs]]).
    */
  private def grace: Long =
    if (staleMs >= 0) staleMs else SnapshotStore.reclaimGraceMs

  override def claim(path: String, token: String): Boolean = {
    val now = System.currentTimeMillis()
    val winner = rows.compute(path, (_, cur) =>
      if (cur == null || cur._1 == token || now - cur._2 > grace)
        (token, now)
      else cur)
    winner._1 == token
  }

  override def owner(path: String): Option[String] =
    Option(rows.get(path)).map(_._1)

  override def release(path: String, token: String): Unit =
    rows.computeIfPresent(path,
      (_, cur) => if (cur._1 == token) null else cur): Unit

  /** Live row count — for depth soaks asserting the population stays
    * the designed shape (≈ one permanent row per committed version
    * plus transient lock/claim rows the release paths fold back).
    */
  def size: Int = rows.size
}
