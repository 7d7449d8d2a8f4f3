package graft.engine

/** Secret resolution — the engine's analogue of the reference's GCP
  * Secret Manager fetch (GCS2Postgres `src/utils/utils.go:70-87`, called
  * from `main.go:21` to obtain the Postgres password).
  *
  * Config values may embed `secret://NAME` placeholders; `resolve`
  * substitutes each from the configured provider. The default provider
  * reads environment variables (the portable offline mechanism); a GCP /
  * Vault / AWS provider is one function swap, mirroring how the reference
  * isolates `FetchSecret`.
  */
object Secrets {

  type Provider = String => Option[String]

  val envProvider: Provider = name => sys.env.get(name)

  /** Process-wide default provider (env-backed unless swapped). The
    * cloud-manager swap point: production installs a GCP/Vault/AWS
    * provider once at startup via [[installProvider]]; tests scope a
    * fake with [[withProvider]].
    */
  @volatile private var default: Provider = envProvider

  /** Install the process-global provider — the production swap point
    * (call once at startup, before jobs run). Unlike [[withProvider]]
    * this affects every thread, including pre-existing pools.
    */
  def installProvider(p: Provider): Unit = { default = p }

  /** Thread-scoped provider override. `DynamicVariable` backs onto an
    * `InheritableThreadLocal`, so concurrent callers (parallel test
    * suites, jobs resolving secrets on separate threads) each see their
    * own override — and child threads spawned INSIDE the scope inherit
    * it — without racing on the process-global default. Constraint:
    * threads created BEFORE the scope opened (pre-existing pools, Spark
    * task threads) do NOT see the override and fall back to the
    * process default; use [[installProvider]] when the provider must be
    * visible to such threads.
    */
  private val scoped = new scala.util.DynamicVariable[Option[Provider]](None)

  /** Run `body` with `p` as this thread's provider, restoring after. */
  def withProvider[T](p: Provider)(body: => T): T =
    scoped.withValue(Some(p))(body)

  // '/' included: GCP Secret Manager names are full resource paths
  // ("projects/<n>/secrets/<name>/versions/latest" — reference
  // config.yaml:7); the provider receives the name verbatim
  private val Placeholder = "secret://([A-Za-z0-9_./-]+)".r

  /** Replace every `secret://NAME` in `value` via `provider` (the
    * process default when omitted); error on unresolvable names (fail
    * fast like the reference, but per-value, not process-fatal).
    */
  def resolve(value: String, provider: Provider = null): String = {
    val eff =
      if (provider != null) provider else scoped.value.getOrElse(default)
    resolveWith(value, eff)
  }

  private def resolveWith(value: String, provider: Provider): String =
    Placeholder.replaceAllIn(value, m => {
      val name = m.group(1)
      val secret = provider(name).getOrElse(
        throw new IllegalArgumentException(s"unresolvable secret: $name"))
      // secrets routinely contain '$' and '\' — they must substitute
      // literally, not as regex group references
      scala.util.matching.Regex.quoteReplacement(secret)
    })
}
