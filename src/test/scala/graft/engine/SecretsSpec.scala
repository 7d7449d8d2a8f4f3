package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class SecretsSpec extends AnyFunSuite {

  private val provider: Secrets.Provider =
    Map("PG_PASS" -> "s3cr3t", "HOST" -> "db.internal").get

  test("placeholders substitute anywhere in the value, repeatedly") {
    assert(Secrets.resolve(
      "jdbc:postgresql://secret://HOST:5432/x?password=secret://PG_PASS",
      provider) ==
      "jdbc:postgresql://db.internal:5432/x?password=s3cr3t")
  }

  test("values without placeholders pass through untouched") {
    assert(Secrets.resolve("jdbc:postgresql://h/db", provider) ==
      "jdbc:postgresql://h/db")
  }

  test("unresolvable secret fails fast with the secret name") {
    val e = intercept[IllegalArgumentException](
      Secrets.resolve("secret://NOPE", provider))
    assert(e.getMessage.contains("NOPE"))
  }

  test("secrets containing regex-special characters substitute literally") {
    val p: Secrets.Provider = Map("S" -> """p4$$\w0rd\1""").get
    assert(Secrets.resolve("x=secret://S", p) == """x=p4$$\w0rd\1""")
  }

  test("default provider reads the environment") {
    val known = sys.env.head
    assert(Secrets.resolve(s"secret://${known._1}") == known._2)
  }
}
