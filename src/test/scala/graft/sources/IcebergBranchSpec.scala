package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BRANCH refs (write-audit-publish) laws: branch commits move only
  * the branch head, main stays pinned until fastForward publishes
  * atomically, a diverged main refuses the fast-forward, tags stay
  * immutable, and retention pins branch heads.
  */
class IcebergBranchSpec extends SparkSpec {

  private def slices() = {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
    (li.where(col("l_orderkey") % 30 === 0),
     li.where(col("l_orderkey") % 30 === 1),
     li.where(col("l_orderkey") % 30 === 2))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("write-audit-publish: branch appends stack on the branch head " +
       "while MAIN scans stay byte-for-byte the pre-branch table; " +
       "the branch head scans as base+staged; fastForward publishes " +
       "the audited state atomically and the branch ref survives") {
    val (a, b, c) = slices()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_branch").toString
    Iceberg.writeTable(a, dir, "l_returnflag")
    Iceberg.createBranch(dir, "staging")
    Iceberg.appendToTable(b, dir, branch = Some("staging"))
    Iceberg.appendToTable(c, dir, branch = Some("staging"))
    // main is UNTOUCHED by two staged commits
    assert(rows(Iceberg.scan(spark, dir)) === rows(a))
    // the branch head reads base + both staged shards (the audit scan)
    val meta = Iceberg.currentMetadata(dir)
    assert(meta.refTypes("staging") === "branch")
    val headScan = Iceberg.scan(spark, dir,
      asOf = Some(meta.refs("staging")))
    assert(rows(headScan) === rows(a.unionAll(b).unionAll(c)))
    // parent chain: head -> mid -> base, recorded on the snapshots
    val head = meta.refs("staging")
    val mid = meta.parents(head)
    assert(meta.parents(mid) === meta.currentSnapshotId)
    // publish: one metadata flip, main == audited branch state
    Iceberg.fastForward(dir, "staging")
    assert(rows(Iceberg.scan(spark, dir)) ===
      rows(a.unionAll(b).unionAll(c)))
    val after = Iceberg.currentMetadata(dir)
    assert(after.currentSnapshotId === head)
    assert(after.refs("staging") === head) // the ref stays for reuse
    // idempotent once published
    Iceberg.fastForward(dir, "staging")
    assert(Iceberg.currentMetadata(dir).currentSnapshotId === head)
  }

  test("divergence refuses: a main-line commit after the fork makes " +
       "fastForward fail loudly (main is no longer an ancestor) — " +
       "never silently dropping main's commits") {
    val (a, b, c) = slices()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_diverge").toString
    Iceberg.writeTable(a, dir, "l_returnflag")
    Iceberg.createBranch(dir, "wip")
    Iceberg.appendToTable(b, dir, branch = Some("wip"))
    Iceberg.appendToTable(c, dir) // main moves too -> diverged
    val e = intercept[IllegalArgumentException] {
      Iceberg.fastForward(dir, "wip")
    }
    assert(e.getMessage.contains("diverged"))
    // both lines still scan correctly after the refusal
    assert(rows(Iceberg.scan(spark, dir)) === rows(a.unionAll(c)))
    val meta = Iceberg.currentMetadata(dir)
    assert(rows(Iceberg.scan(spark, dir, asOf = Some(meta.refs("wip"))))
      === rows(a.unionAll(b)))
  }

  test("guards: tags are immutable (append refuses), a branch name " +
       "cannot shadow an existing ref, and fastForward on a tag " +
       "refuses") {
    val (a, b, _) = slices()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_brguard").toString
    Iceberg.writeTable(a, dir, "l_returnflag")
    Iceberg.tagSnapshot(dir, "pin")
    intercept[IllegalArgumentException] {
      Iceberg.appendToTable(b, dir, branch = Some("pin"))
    }
    intercept[IllegalArgumentException] {
      Iceberg.createBranch(dir, "pin")
    }
    intercept[IllegalArgumentException] {
      Iceberg.fastForward(dir, "pin")
    }
    intercept[IllegalArgumentException] {
      Iceberg.appendToTable(b, dir, branch = Some("nope"))
    }
  }

  test("WAP x CDC: a polling main-line consumer sees NOTHING while " +
       "commits stage on the branch (idle poll, processor not " +
       "invoked) and exactly the staged rows ONCE after fastForward " +
       "publishes — the state-based file diff makes the atomic flip " +
       "look like one ordinary delta") {
    val (a, b, c) = slices()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_brpoll").toString
    val cursor = java.nio.file.Files
      .createTempDirectory("graft_iceberg_brcur").toString + "/cursor"
    Iceberg.writeTable(a, dir, "l_returnflag")
    var polled = Set.empty[Seq[Any]]
    var invocations = 0
    def poll(): Unit = graft.streaming.IcebergStream
      .pollOnce(spark, dir, cursor) { d =>
        invocations += 1; polled ++= rows(d)
      }
    poll() // bootstrap: the base table
    assert(invocations === 1 && polled === rows(a))
    Iceberg.createBranch(dir, "staging")
    Iceberg.appendToTable(b, dir, branch = Some("staging"))
    Iceberg.appendToTable(c, dir, branch = Some("staging"))
    poll() // staged-only commits: main unchanged -> processor idle
    assert(invocations === 1, "staged commits must not reach consumers")
    Iceberg.fastForward(dir, "staging")
    poll() // the publish arrives as ONE delta: exactly the staged rows
    assert(invocations === 2)
    assert(polled === rows(a.unionAll(b).unionAll(c)))
    poll() // and the cursor rests: no replay
    assert(invocations === 2)
  }

  test("retention pins branch heads: expireSnapshots(retainLast = 1) " +
       "keeps an unpublished branch head scannable while untagged " +
       "main history expires") {
    val (a, b, c) = slices()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_brretain").toString
    Iceberg.writeTable(a, dir, "l_returnflag")
    Iceberg.createBranch(dir, "keepme")
    Iceberg.appendToTable(b, dir, branch = Some("keepme"))
    Iceberg.appendToTable(c, dir) // main advances past the fork
    Iceberg.expireSnapshots(dir, retainLast = 1)
    val meta = Iceberg.currentMetadata(dir)
    // the branch head survived the trim and still scans exactly
    assert(meta.refs.contains("keepme"))
    assert(rows(Iceberg.scan(spark, dir,
      asOf = Some(meta.refs("keepme")))) === rows(a.unionAll(b)))
    assert(rows(Iceberg.scan(spark, dir)) === rows(a.unionAll(c)))
  }
}
