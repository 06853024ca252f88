package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{CredentialProvider, EnvCredentialProvider, FileCredentialProvider}

/** Credential-provider contract (`secret.py:37-88` semantics: versioned
  * access with "latest" default, missing → None) + the caller-info log
  * format (`logs.py:56-77`). */
class CredentialsLogSpec extends AnyFunSuite {

  test("env provider resolves GRAFT_SECRET_<ID> and is read-only") {
    val p = new EnvCredentialProvider(
      Map("GRAFT_SECRET_DB_PASSWORD" -> "hunter2"))
    assert(p.access("db-password").contains("hunter2"))
    assert(p.access("DB_PASSWORD").contains("hunter2"))
    assert(p.access("missing").isEmpty)
    intercept[UnsupportedOperationException] { p.create("x") }
    intercept[UnsupportedOperationException] { p.addVersion("x", "y") }
  }

  test("file provider versions monotonically; latest wins; missing → None") {
    val root = Files.createTempDirectory("graft_creds").toString
    val p: CredentialProvider = new FileCredentialProvider(root)
    assert(p.access("api-key").isEmpty)
    p.create("api-key")
    assert(p.access("api-key").isEmpty) // container exists, no versions
    assert(p.addVersion("api-key", "v-one") == "1")
    assert(p.addVersion("api-key", "v-two") == "2")
    assert(p.access("api-key").contains("v-two"))          // latest
    assert(p.access("api-key", "1").contains("v-one"))     // pinned
    assert(p.access("api-key", "99").isEmpty)              // absent version
    assert(p.access("api-key", "not-a-number").isEmpty)
  }

  test("log format carries level prefix, message, and caller info") {
    val line = graft.tools.Log.format("[ oo INFO ]", "hello")
    assert(line.startsWith("[ oo INFO ] hello -> ("))
    // Caller frame is THIS spec (class + method + a real line number).
    assert(line.contains("CredentialsLogSpec"), line)
    assert(line.matches(""".*Line: \d+\)$"""), line)
  }
}
