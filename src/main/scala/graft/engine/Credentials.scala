package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Try

/** Credential-provider seam (`core/configs/secret.py:37-88`): the
  * reference resolves secrets by id + version ("latest" by default) from
  * a managed store, swallowing access errors (returns nothing, logs).
  * Deployment-plane, so the engine only fixes the CONTRACT; two concrete
  * providers cover the zero-egress environments:
  *
  *  - [[EnvCredentialProvider]] — `GRAFT_SECRET_<ID>` env vars (the
  *    standard container/CI injection path; single implicit version).
  *  - [[FileCredentialProvider]] — a directory tree `<root>/<id>/<n>`
  *    with numeric version files; "latest" = highest n (the mounted-
  *    secrets layout used by k8s secret volumes).
  *
  * A cloud secret-manager impl plugs in by implementing the same trait.
  */
trait CredentialProvider {

  /** Fetch one secret version; "latest" resolves provider-side. Missing
    * secrets are None, not an exception (`secret.py:54` swallows). */
  def access(secretId: String, version: String = "latest"): Option[String]

  /** Create an empty secret container; idempotent. */
  def create(secretId: String): Unit

  /** Append a new version; returns the new version label. */
  def addVersion(secretId: String, payload: String): String
}

/** Env-var provider: `GRAFT_SECRET_<ID>` (id upper-cased, `-` → `_`).
  * Env vars are immutable per-process: create/addVersion are unsupported
  * (throws — an env-injected deployment manages secrets outside the
  * process, and silently pretending to write would hide config errors).
  */
class EnvCredentialProvider(env: Map[String, String] = sys.env)
    extends CredentialProvider {
  private def key(id: String): String =
    "GRAFT_SECRET_" + id.toUpperCase.replace('-', '_')
  override def access(secretId: String, version: String): Option[String] =
    env.get(key(secretId))
  override def create(secretId: String): Unit =
    throw new UnsupportedOperationException(
      "env provider is read-only; inject " + key(secretId))
  override def addVersion(secretId: String, payload: String): String =
    throw new UnsupportedOperationException(
      "env provider is read-only; inject " + key(secretId))
}

/** Directory-tree provider: `<root>/<id>/<n>` where n is a numeric
  * version; "latest" = max n. */
class FileCredentialProvider(root: String) extends CredentialProvider {
  private def dir(id: String): Path = Paths.get(root, id)

  private def versions(id: String): Seq[Int] =
    if (!Files.isDirectory(dir(id))) Seq.empty
    else {
      val stream = Files.list(dir(id))
      try stream.iterator().asScala
        .flatMap(p => Try(p.getFileName.toString.toInt).toOption)
        .toSeq.sorted
      finally stream.close()
    }

  override def access(secretId: String, version: String): Option[String] = {
    val v =
      if (version == "latest") versions(secretId).lastOption
      else Try(version.toInt).toOption
    v.map(n => dir(secretId).resolve(n.toString))
      .filter(Files.isRegularFile(_))
      .map(p => new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  override def create(secretId: String): Unit =
    Files.createDirectories(dir(secretId))

  override def addVersion(secretId: String, payload: String): String = {
    create(secretId)
    val next = versions(secretId).lastOption.getOrElse(0) + 1
    Files.write(dir(secretId).resolve(next.toString),
      payload.getBytes(StandardCharsets.UTF_8))
    next.toString
  }
}
